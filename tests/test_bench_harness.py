"""Unit tests for bench.py's spark-free plumbing: the cross-run merge
(VERDICT r8 #1) and the re-time detector's prior-record pick guard
(VERDICT r8 #8).  No SparkSession — pure dict/file logic."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_merge_records_per_query_min_and_canaries():
    r1 = {
        "value": 70.0,
        "queries": {"a": 2.0, "b": 5.0, "c": -1.0},
        "extra_queries": {"x": 1.0},
        "canary_sec": [0.2, 0.21, 0.19],
        "retimed": {"x": {"first": 9.0, "prior": 1.0, "retimes": [1.1, 1.0]}},
        "sf": 0.1,
    }
    r2 = {
        "value": 65.0,
        "queries": {"a": 3.0, "b": 4.0, "c": 6.0},
        "extra_queries": {"x": 0.9, "y": 2.0},
        "canary_sec": [0.18, 0.2, 0.2],
        "retimed": {},
        "sf": 0.1,
    }
    m = bench.merge_records([r1, r2])
    # per-query min across runs; a failed (-1) reading loses to any pass
    assert m["queries"] == {"a": 2.0, "b": 4.0, "c": 6.0}
    assert m["extra_queries"] == {"x": 0.9, "y": 2.0}
    assert m["value"] == 12.0
    assert m["extra_sec"] == 2.9
    # each run's canaries and headline kept verbatim
    assert m["canary_sec"] == [r1["canary_sec"], r2["canary_sec"]]
    assert m["headline_runs"] == [70.0, 65.0]
    assert m["runs"] == 2
    # retime entries merged as per-run lists
    assert m["retimed"] == {"x": [r1["retimed"]["x"]]}
    assert m["sf"] == 0.1


def test_pick_prior_record_excludes_current_round(tmp_path):
    # Driver records through round 8 -> round 9 is in progress; a
    # mid-round BENCH_local_r09.json must NOT be picked as "prior".
    for n in (7, 8):
        (tmp_path / f"BENCH_r{n:02d}.json").write_text("{}")
    for n in (7, 8, 9):
        (tmp_path / f"BENCH_local_r{n:02d}.json").write_text(
            json.dumps({"extra_queries": {"x": float(n)}})
        )
    assert bench._current_round(str(tmp_path)) == 9
    assert os.path.basename(bench._pick_prior_record(str(tmp_path))) == (
        "BENCH_local_r08.json"
    )


def test_round_detection_sees_archived_artifacts(tmp_path):
    """VERDICT r10 #6: per-round artifacts for older rounds live under
    artifacts/r{N}/; round detection and prior-record pick must keep
    seeing them there (a root holding only the current round's files
    must not reset the round counter)."""
    arch = tmp_path / "artifacts" / "r08"
    arch.mkdir(parents=True)
    (arch / "BENCH_r08.json").write_text("{}")
    (arch / "BENCH_local_r08.json").write_text(
        json.dumps({"extra_queries": {"x": 8.0}})
    )
    assert bench._current_round(str(tmp_path)) == 9
    picked = bench._pick_prior_record(str(tmp_path))
    assert picked is not None and picked.endswith("BENCH_local_r08.json")
    # root record from a NEWER round wins over the archived one
    (tmp_path / "BENCH_r09.json").write_text("{}")
    (tmp_path / "BENCH_local_r09.json").write_text(
        json.dumps({"extra_queries": {"x": 9.0}})
    )
    assert bench._current_round(str(tmp_path)) == 10
    assert bench._pick_prior_record(str(tmp_path)).endswith("BENCH_local_r09.json")


def test_pick_prior_record_empty_dir(tmp_path):
    assert bench._current_round(str(tmp_path)) == 1
    assert bench._pick_prior_record(str(tmp_path)) is None
