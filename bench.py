#!/usr/bin/env python
"""Benchmark harness: runs the declared headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``.

Output contract: per-query detail is written to ``BENCH_detail_last.json``
and printed as an earlier stdout line; the FINAL stdout line is a compact
headline record (<500 bytes) so tail capture always parses:

  {"metric": "total_headline_query_sec", "value": N, "unit": "sec",
   "extra_sec": N, "n_headline": N, "n_extra": N, "sf": F, "detail": ...}

Each query is materialized through the `noop` sink so the full plan
(including all output columns) executes without disk writes.
"""

from __future__ import annotations

import gc
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _artifact_files(repo_dir: str) -> list[tuple[str, str]]:
    """(filename, full path) for every per-round artifact, whether at the
    repo root (current + prior round) or archived under ``artifacts/r{N}/``
    (VERDICT r10 #6: older rounds move out of the root to keep the
    evidence chain diffable; round detection must keep seeing them)."""
    out = [(f, os.path.join(repo_dir, f)) for f in os.listdir(repo_dir)]
    adir = os.path.join(repo_dir, "artifacts")
    if os.path.isdir(adir):
        for sub in os.listdir(adir):
            subdir = os.path.join(adir, sub)
            if os.path.isdir(subdir):
                out.extend((f, os.path.join(subdir, f)) for f in os.listdir(subdir))
    return out


def _current_round(repo_dir: str) -> int:
    """The round IN PROGRESS = 1 + the latest driver bench record
    (``BENCH_r{N}.json`` is written by the driver when round N closes,
    so its max is always the previous round while a round is running)."""
    rounds = [
        int(m.group(1))
        for f, _ in _artifact_files(repo_dir)
        if (m := re.fullmatch(r"BENCH_r(\d+)\.json", f))
    ]
    return max(rounds, default=0) + 1


def _pick_prior_record(repo_dir: str) -> str | None:
    """Latest committed local record EXCLUDING the round in progress, so
    running the bench twice in one round still compares the re-time
    detector against the PRIOR round's record rather than this round's
    own first run (VERDICT r8 #8 — the lexicographic ``sorted()`` pick
    had that self-comparison hole)."""
    cur = _current_round(repo_dir)
    cands = [
        (int(m.group(1)), path)
        for f, path in _artifact_files(repo_dir)
        if (m := re.fullmatch(r"BENCH_local_r(\d+)\.json", f))
        and int(m.group(1)) < cur
    ]
    return max(cands)[1] if cands else None


def _retime_baselines(repo_dir: str) -> dict[str, float]:
    """Per-extra-query baseline for the retime detector: the MIN across
    the prior round's record AND the freshest MERGED record — including
    the current round's own merged record when one is already committed
    (VERDICT r12 #4: ``graph_ktruss`` smeared to 17.75 s in the driver
    run — only 1.81x the prior round's single-run number, so the old
    >2x-vs-prior trigger never fired, yet 3.1x the 5.80 s the freshest
    merged record shows the same code doing).  A current-round record
    only qualifies if it is a multi-run merge (``runs`` >= 2) — a
    single first run of this round would reopen the r8 #8
    self-comparison hole."""
    cur = _current_round(repo_dir)
    paths: list[str] = []
    prior = _pick_prior_record(repo_dir)
    if prior:
        paths.append(prior)
    cur_rec = next(
        (
            path
            for f, path in _artifact_files(repo_dir)
            if (m := re.fullmatch(r"BENCH_local_r(\d+)\.json", f))
            and int(m.group(1)) == cur
        ),
        None,
    )
    if cur_rec:
        paths.append(cur_rec)
    out: dict[str, float] = {}
    for path in paths:
        try:
            with open(path) as f:
                rec = json.load(f)
        except (OSError, ValueError) as e:
            print(f"bench retime: record {path} unreadable ({e})", file=sys.stderr)
            continue
        if path == cur_rec and rec.get("runs", 1) < 2:
            continue
        for k, v in rec.get("extra_queries", {}).items():
            if isinstance(v, (int, float)) and v > 0:
                out[k] = min(out.get(k, v), v)
    return out


def merge_records(details: list[dict]) -> dict:
    """Merge >=2 same-round clean-run detail records into one committed
    record: per-query MIN across runs (VERDICT r8 #1 — the ±10%
    whole-session band exceeded any single round's real optimization,
    so one run's headline could not support round-over-round claims;
    the cross-run min removes the session-level smear the same way the
    in-run min-of-3 removes per-query stalls).  Each run's canaries are
    kept (``canary_sec`` = one list per run) so "both runs were idle"
    stays a recorded number, and each run's own headline total is kept
    under ``headline_runs`` for the band-width readout."""
    if not details:
        raise ValueError("merge_records needs at least one detail record")

    def _min_map(key: str) -> dict[str, float]:
        out: dict[str, float] = {}
        for d in details:
            for name, t in d.get(key, {}).items():
                if not isinstance(t, (int, float)):
                    continue
                prev = out.get(name)
                out[name] = t if prev is None or prev < 0 else (
                    min(prev, t) if t >= 0 else prev
                )
        return out

    headline = _min_map("queries")
    extra = _min_map("extra_queries")
    retimed: dict[str, list] = {}
    for d in details:
        for name, entry in d.get("retimed", {}).items():
            retimed.setdefault(name, []).append(entry)
    return {
        "metric": "total_headline_query_sec",
        "value": round(sum(t for t in headline.values() if t >= 0), 3),
        "unit": "sec",
        "queries": headline,
        "extra_queries": extra,
        "extra_sec": round(sum(t for t in extra.values() if t >= 0), 3),
        "canary_sec": [d.get("canary_sec", []) for d in details],
        "headline_runs": [d.get("value") for d in details],
        "runs": len(details),
        "retimed": retimed,
        "sf": details[0].get("sf"),
    }


def _merge_main(argv: list[str]) -> None:
    out = "BENCH_local_merged.json"
    if "--out" in argv:
        i = argv.index("--out")
        out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    paths = [a for a in argv if not a.startswith("--")]
    details = []
    for p in paths:
        with open(p) as f:
            details.append(json.load(f))
    rec = merge_records(details)
    rec["merged_from"] = [os.path.basename(p) for p in paths]
    with open(out, "w") as f:
        json.dump(rec, f, indent=1, sort_keys=True)
    print(json.dumps({k: rec[k] for k in ("metric", "value", "extra_sec", "headline_runs", "runs")}))


def main() -> None:
    from bigdata_hits_spark import queries as q
    from bigdata_hits_spark.session import get_spark
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark("bigdata-hits-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    registry = q.queries()
    # flagship: reference-default 8 iterations on the bipartite graph
    from bigdata_hits_spark.operators.ranking import hits
    from bigdata_hits_spark.sources.derived import g_ps

    registry = {"base_hits_k8": lambda s, d: q.rank_union(hits(g_ps(s, d), k=8)), **registry}

    # Prime the Python worker pool: the first pandas-UDF query otherwise
    # pays a ~32-worker numpy/pandas import storm that belongs to session
    # setup, not to that query.
    try:
        from pyspark.sql.functions import pandas_udf
        import pandas as pd

        @pandas_udf("long")
        def _noop(s: pd.Series) -> pd.Series:
            return s

        spark.range(64).repartition(32).select(_noop("id")).write.format("noop").mode(
            "overwrite"
        ).save()
    except Exception:
        pass

    # Three passes, min per query: BASELINE.md defines the metric as
    # warm-session sec/query; the min discards one-off JIT/GC/page-cache
    # noise while still timing every query end-to-end.  Three passes (not
    # two) because this host shows sporadic 20-30 s stalls on individual
    # queries (~20% of runs); with two passes a stall lands in the min for
    # some query most bench runs, with three it is <1% per query.
    # Between queries, release the previous queries' dead blocks:
    # completed queries leave lazily-checkpointed RDDs and broadcasts
    # whose Python references are garbage, but Spark's ContextCleaner
    # only unpersists them once a GC notices — and at ~90 queries/pass
    # the accumulated storage pressure evicts the memoized edge
    # relations and adds collector pauses INSIDE later queries' timed
    # windows (measured: k3 family ~5.1 s/pass under accumulation vs
    # ~2-3 s collected).  Collecting between queries moves that cost
    # outside the timings, so each number measures the query, not its
    # predecessors' garbage.  The JVM full collection runs on a cadence
    # (it walks a multi-GB heap); the Python collection is cheap enough
    # to run every query.
    # SPARK_GRAFT_BENCH_RETIRE=1 additionally retires the memoized graph
    # relations (sources/derived.py clear_graph_cache) at every pass
    # boundary — the round-6 heap A/B lever: the per-query collection
    # reclaims DEAD checkpoint blocks, but the Graph memos (persisted
    # edge relations, prepared counts) are live references that persist
    # for the whole session by design (the reference's
    # many-jobs-one-graph pattern).  Retiring them bounds resident
    # storage to one pass's worth, at the cost of each pass's first
    # query per memo family re-paying its prepare (visible in the
    # per-pass stderr lines; min-of-3 absorbs it only if another pass
    # kept the memo).  Off by default — measurement mode, not the
    # recommended production session shape.
    # Round-6 A/B outcome: the storage diagnostic below measured the
    # full-surface session carrying only ~260 MB of persisted RDDs at
    # pass boundaries, and retirement reclaims ~140 MB of that — three
    # orders of magnitude below the heap sizes under test, so the
    # "accumulated pins force the big heap" hypothesis is FALSIFIED by
    # direct measurement.  The heap sensitivity is allocation churn
    # (~116 queries/pass of shuffle + codegen garbage), which a bigger
    # heap absorbs with fewer full collections.  Timing-wise the lever
    # is a wash: same-day same-config 48g headlines spanned 61.0-92.8 s
    # on this host, wider than any 24g-vs-48g or retire-vs-not delta
    # observed, so no ranking survives the noise floor.  The lever
    # stays available for memory-constrained drivers; it is not a
    # performance setting.
    retire = os.environ.get("SPARK_GRAFT_BENCH_RETIRE") == "1"
    from bigdata_hits_spark.sources import derived

    def _storage_line(tag: str) -> None:
        # Pass-boundary storage diagnostic (stderr): how much persisted
        # RDD state the session is actually carrying — the direct test
        # of the "accumulated pins force the 48g heap" hypothesis.
        try:
            infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
            n = len(infos)
            mem = sum(i.memSize() for i in infos)
            disk = sum(i.diskSize() for i in infos)
            print(
                f"bench storage {tag}: {n} persisted RDDs, "
                f"{mem / 1e6:.0f} MB mem, {disk / 1e6:.0f} MB disk",
                file=sys.stderr,
            )
        except Exception as e:
            print(f"bench storage {tag}: unavailable ({e})", file=sys.stderr)

    # Headline = the flagship + the driver's 50-slot gate prefix — a
    # structural definition that stays comparable round over round as the
    # declared surface grows.  Post-gate declared queries (extra
    # oracle-backed entries registered after the prefix) and rows-only
    # approximate paths are timed identically but reported separately —
    # and, since round 7, run in ONE pass after the three headline passes:
    # the extras surface grows linearly with the declared registry
    # (~106 queries x 3 passes was ~40 min of the run) while their
    # round-over-round comparisons already tolerate session noise; the
    # 3-pass-min contract applies to the headline only (BASELINE.md).
    headline_names = {"base_hits_k8", *list(q.queries())[:50]}

    def _canary() -> float:
        # Fixed micro-canary: median of three timed scan_project runs.
        # Recorded per pass so "the host was slow today" is a number in
        # the detail artifact, not a narrative in a commit message —
        # same-shape sessions can be compared by their canary medians.
        fn = registry["scan_project"]
        ts = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
        return round(sorted(ts)[1], 3)

    timings: dict[str, float] = {}
    canaries: list[float] = []
    n_run = 0

    def _run_pass(tag: str, names) -> None:
        nonlocal n_run
        try:
            canaries.append(_canary())
            print(f"bench canary {tag}: {canaries[-1]}", file=sys.stderr)
        except Exception as e:
            print(f"bench canary {tag} failed: {e}", file=sys.stderr)
        for name in names:
            gc.collect()
            n_run += 1
            if n_run % 10 == 0:
                try:
                    spark._jvm.System.gc()
                except Exception:
                    pass
            t0 = time.time()
            try:
                registry[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                elapsed = round(time.time() - t0, 3)
            except Exception as e:  # keep the bench line parseable even on failure
                print(f"bench error in {name}: {e}", file=sys.stderr)
                elapsed = -1.0
            print(f"bench pass {tag} {name}: {elapsed}", file=sys.stderr)
            prev = timings.get(name)
            timings[name] = elapsed if prev is None or prev < 0 else (
                min(prev, elapsed) if elapsed >= 0 else prev
            )

    headline_order = [n for n in registry if n in headline_names]
    extra_order = [n for n in registry if n not in headline_names]
    for _pass in range(3):
        if _pass:
            _storage_line(f"before pass {_pass}")
            if retire:
                derived.clear_graph_cache()
                gc.collect()
                try:
                    spark._jvm.System.gc()
                except Exception:
                    pass
                _storage_line(f"after retire {_pass}")
        _run_pass(str(_pass), headline_order)
    _storage_line("before extras")
    _run_pass("extras", extra_order)

    # Extras regression detector: extras are timed in ONE pass (round-7
    # methodology), so a single first-touch stall is indistinguishable
    # from a real regression in the record (round-7's quantize_embeddings
    # read 7.1 s vs a 1.2 s prior min with no plan change).  Any extra
    # reading >1.7x its baseline — min(prior-round record, freshest
    # merged record; VERDICT r12 #4) — gets two bounded re-timings; the
    # record keeps BOTH the first reading and the re-timings
    # (detail["retimed"]), and the per-query number becomes the min —
    # two fast re-timings mark the anomaly confirmed-noise, two slow
    # ones make the regression a number nobody can wave away.
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    prior_extras = _retime_baselines(repo_dir)
    retimed: dict[str, dict] = {}
    for name in extra_order:
        first = timings.get(name, -1.0)
        prev = prior_extras.get(name)
        if first < 0 or prev is None or first <= 1.7 * prev:
            continue
        runs = []
        for _ in range(2):
            gc.collect()
            t0 = time.time()
            try:
                registry[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(round(time.time() - t0, 3))
            except Exception as e:
                print(f"bench retime error in {name}: {e}", file=sys.stderr)
                break
        if runs:
            retimed[name] = {"first": first, "prior": prev, "retimes": runs}
            timings[name] = min([first, *runs])
            print(
                f"bench retime {name}: first={first} prior={prev} "
                f"retimes={runs}",
                file=sys.stderr,
            )
    headline = {n: t for n, t in timings.items() if n in headline_names}
    extra = {n: t for n, t in timings.items() if n not in headline_names}
    total = round(sum(t for t in headline.values() if t >= 0), 3)
    extra_sec = round(sum(t for t in extra.values() if t >= 0), 3)
    # Per-query detail goes to a sidecar file + an EARLIER stdout line;
    # the FINAL stdout line is a compact (<500 byte) headline record so
    # the driver's tail capture can never truncate it mid-object
    # (BENCH_r04.json was parsed:null because the single ~6 KB line with
    # 90 per-query timings outgrew the tail window).
    detail = {
        "metric": "total_headline_query_sec",
        "value": total,
        "unit": "sec",
        "queries": headline,
        "extra_queries": extra,
        "extra_sec": extra_sec,
        "canary_sec": canaries,
        "retimed": retimed,
        "sf": sf,
    }
    # --detail-out lets each of a round's clean runs keep its own detail
    # file so `bench.py --merge run1.json run2.json --out ...` can build
    # the committed cross-run-min record (VERDICT r8 #1).
    detail_name = "BENCH_detail_last.json"
    if "--detail-out" in sys.argv:
        detail_name = sys.argv[sys.argv.index("--detail-out") + 1]
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), detail_name
    )
    try:
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1, sort_keys=True)
    except OSError as e:
        print(f"bench detail write failed: {e}", file=sys.stderr)
    print(json.dumps(detail))
    print(
        json.dumps(
            {
                "metric": "total_headline_query_sec",
                "value": total,
                "unit": "sec",
                "extra_sec": extra_sec,
                "n_headline": len(headline),
                "n_extra": len(extra),
                "canary_sec": canaries,
                "sf": sf,
                "detail": "BENCH_detail_last.json",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    if "--merge" in sys.argv:
        _merge_main(sys.argv[sys.argv.index("--merge") + 1 :])
    else:
        main()
