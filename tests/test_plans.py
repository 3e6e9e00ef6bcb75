"""Plan-quality assertions: the scale guarantees the engine claims must be
visible in the physical plan, not just believed.

- Filters reach the parquet scan (PushedFilters).
- Projections prune the read schema (ReadSchema contains only what the
  query needs).
- The neighborhood subgraph rewrite plans as equi-joins, NOT the
  BroadcastNestedLoopJoin the reference's OR-predicate semi-join forces.
- The power-iteration step broadcasts the score vector, not the edges.
"""

from pyspark.sql import functions as F

from bigdata_hits_spark.operators.graph import neighborhood
from bigdata_hits_spark.sources import derived
from bigdata_hits_spark.sources.readers import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_filter_pushed_to_parquet_scan(spark, sf_dir_oracle):
    orders = load_table(spark, sf_dir_oracle, "orders")
    q = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    plan = _formatted(q)
    assert "PushedFilters" in plan
    assert "o_orderstatus" in plan.split("PushedFilters")[1].splitlines()[0]


def test_projection_prunes_read_schema(spark, sf_dir_oracle):
    li = load_table(spark, sf_dir_oracle, "lineitem")
    q = li.select("l_orderkey", "l_partkey")
    plan = _formatted(q)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_partkey" in read_schema
    assert "l_comment" not in read_schema and "l_extendedprice" not in read_schema


def test_neighborhood_rewrite_avoids_nested_loop_join(spark, sf_dir_oracle):
    g = derived.g_pp(spark, sf_dir_oracle)
    sub = neighborhood(g, derived.G_PP_TOPIC)
    plan = _plan(sub.edges)
    assert "BroadcastNestedLoopJoin" not in plan


def test_composite_topk_plan_shape(spark, sf_dir_oracle):
    """The Q3-shaped composite must broadcast the dimension sides (no
    sort-merge join at this dim/fact ratio), keep the status filter at
    the orders scan, and run top-k as TakeOrderedAndProject (per-partition
    heaps), not a global sort."""
    from bigdata_hits_spark.queries import queries

    df = queries()["composite_order_revenue_topk"](spark, sf_dir_oracle)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan
    formatted = _formatted(df)
    pushed = [
        line for line in formatted.splitlines()
        if "PushedFilters" in line and "o_orderstatus" in line
    ]
    assert pushed


def test_bucketed_join_has_no_exchange(spark, sf_dir_oracle):
    """Two tables bucketed+sorted on the join key must join with ZERO
    Exchange (the write-time shuffle is reused by every later join) —
    the persistent-layout story for repeated fact-fact joins at scale.

    Uses the session's default warehouse dir (repo-local
    ``spark-warehouse/``, gitignored): warehouse.dir is a static conf
    that cannot be repointed per-test."""
    from pyspark.sql import functions as F

    from bigdata_hits_spark.sources.bucketed import read_bucketed, write_bucketed

    li = load_table(spark, sf_dir_oracle, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir_oracle, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "t_li_bucketed", "l_orderkey", buckets=8)
    write_bucketed(orders, "t_ord_bucketed", "o_orderkey", buckets=8)
    try:
        a = read_bucketed(spark, "t_li_bucketed")
        b = read_bucketed(spark, "t_ord_bucketed")
        # hint("merge"): at sf0.01 the orders side is broadcast-sized, so
        # Catalyst would pick BHJ and the bucket layout would never engage;
        # at real scale SMJ is what it picks on its own.
        joined = (
            a.join(b.hint("merge"), a["l_orderkey"] == b["o_orderkey"])
            .groupBy("o_orderkey")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        plan = _plan(joined)
        assert "Exchange" not in plan, f"bucketed join still exchanges:\n{plan}"
        assert "SortMergeJoin" in plan
        # (A task-local Sort remains: Spark 3+ ignores bucket-file sort
        # order by default — spark.sql.legacy.bucketedTableScan
        # .outputOrdering.  The shuffle elimination is the scale win;
        # the in-task sort is memory-local.)
        # correctness spot check: same result as the unbucketed join
        expected = (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .groupBy("o_orderkey")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        assert joined.count() == expected.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_li_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_ord_bucketed")


def test_power_step_broadcasts_scores_not_edges(spark, sf_dir_oracle):
    from bigdata_hits_spark.operators.ranking import _hits_edges, _uniform_init, _step
    from bigdata_hits_spark.plans.iterate import materialize

    g = derived.g_ps(spark, sf_dir_oracle)
    eh, ea = _hits_edges(g, None, "broadcast")
    n = g.memo(("n_nodes",), g.nodes.count)
    scores = materialize(_uniform_init(g.nodes, n))
    plan = _plan(_step(eh, scores))
    # the build (broadcast) side must be the checkpointed score vector
    build_section = plan.split("BroadcastExchange")[1]
    assert "ExistingRDD" in build_section.split("BroadcastHashJoin")[0] or "ExistingRDD" in build_section
    # and the streamed side must come from the cached, pre-partitioned edges
    assert "InMemoryTableScan" in plan


def test_sessionize_single_shuffle_on_user(spark, sf_dir_oracle):
    """Gap sessionization must shuffle ONCE on user_id: lag, running sum,
    and the final grouped agg all reuse the same hash partitioning."""
    from bigdata_hits_spark.operators.events import sessionize

    ev = load_table(spark, sf_dir_oracle, "events")
    plan = _plan(sessionize(ev))
    # exactly one exchange (hashpartitioning on user_id); a second exchange
    # would mean the window partitioning isn't being reused by the agg
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, f"expected 1 shuffle, plan has {n_exchanges}:\n{plan}"
    assert "user_id" in plan.split("Exchange hashpartitioning")[1].splitlines()[0]


def test_dedup_plans_have_no_cartesian_products(spark, sf_dir_oracle):
    """Every fuzzy-dedup path must candidate-generate via equi-joins —
    a CartesianProduct/BroadcastNestedLoopJoin anywhere means the
    stop-shingle/banding guard failed and the plan is O(n^2) at scale."""
    from bigdata_hits_spark.operators import dedup as D

    docs = load_table(spark, sf_dir_oracle, "documents")
    for df in (
        D.minhash_near_duplicates(docs),
        D.simhash_near_duplicates(docs),
        D.ngram_jaccard_pairs(docs),
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_anti_join_filter_pushed_to_orders_scan(spark, sf_dir_oracle):
    """The de-vacuated anti-join must push the status filter into the
    orders parquet scan, not filter post-join."""
    from bigdata_hits_spark.queries import queries

    df = queries()["anti_join_idle_customers"](spark, sf_dir_oracle)
    formatted = _formatted(df)
    pushed = [
        line for line in formatted.splitlines()
        if "PushedFilters" in line and "o_orderstatus" in line
    ]
    assert pushed


def test_power_step_shuffle_mode_has_no_broadcast(spark, sf_dir_oracle):
    """The big-vector mode's plan must not broadcast anything: the score
    vector exchanges onto the edges' existing hash partitioning (shuffle
    hash join), the edges themselves never move."""
    from bigdata_hits_spark.operators.ranking import _hits_edges, _uniform_init, _step
    from bigdata_hits_spark.plans.iterate import materialize

    g = derived.g_ps(spark, sf_dir_oracle)
    eh, ea = _hits_edges(g, None, "shuffle")
    n = g.memo(("n_nodes",), g.nodes.count)
    scores = materialize(_uniform_init(g.nodes, n))
    plan = _plan(_step(eh, scores, "shuffle"))
    assert "BroadcastExchange" not in plan and "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan
    # edges stream from cache; only the score vector exchanges pre-join
    assert "InMemoryTableScan" in plan


def test_bucketed_ranking_edges_no_exchange(spark, sf_dir_oracle):
    """Prepared HITS step relations persisted as bucketed tables must run
    the power step with ZERO edge-sized shuffle on a cold session — the
    bucketed scan satisfies the grouped sum's distribution, so the only
    exchange left is the broadcast of the (node-sized) score vector."""
    from pyspark.sql import functions as F

    from bigdata_hits_spark.operators.ranking import (
        _hits_edges,
        _step,
        attach_ranking_edges,
        hits,
        persist_ranking_edges,
    )
    from bigdata_hits_spark.sources.derived import _g_ps

    g = _g_ps(spark, sf_dir_oracle)
    g2 = _g_ps(spark, sf_dir_oracle)  # fresh graph: no in-session prepared state
    try:
        persist_ranking_edges(g, "t_rank_edges", buckets=8)
        attach_ranking_edges(g2, "t_rank_edges")
        eh, _ea = _hits_edges(g2, None, "broadcast")
        scores = g2.nodes.select("id", F.lit(1.0).alias("score"))
        plan = _step(eh, scores, "broadcast")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan

        # end-to-end: the bucketed-edge loop computes the same ranking
        a = {(r["id"], round(r["score"], 7)) for r in hits(g, k=3).auths.collect()}
        b = {(r["id"], round(r["score"], 7)) for r in hits(g2, k=3).auths.collect()}
        assert a == b and len(a) > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_rank_edges_hub")
        spark.sql("DROP TABLE IF EXISTS t_rank_edges_auth")
        g.release()
        g2.release()


def test_time_partitioned_scan_prunes(spark, sf_dir_oracle, tmp_path):
    """A date filter over the time-partitioned events layout must prune at
    PLANNING time: PartitionFilters carries the predicate, the data-filter
    list doesn't re-apply it, and the pruned scan reads fewer partition
    directories than exist."""
    from bigdata_hits_spark.sources.bucketed import (
        read_time_partitioned,
        write_time_partitioned,
    )

    events = load_table(spark, sf_dir_oracle, "events")
    path = str(tmp_path / "events_by_date")
    write_time_partitioned(events, path)

    back = read_time_partitioned(spark, path)
    n_dates = back.select("event_date").distinct().count()
    assert n_dates > 1, "testdata spans one date; pruning test needs several"
    one_date = back.select(F.max("event_date")).first()[0]
    q = back.filter(F.col("event_date") == F.lit(one_date)).select("event_id")
    formatted = _formatted(q)
    part_lines = [l for l in formatted.splitlines() if "PartitionFilters" in l]
    assert part_lines and any("event_date" in l for l in part_lines)
    # row parity with the unpartitioned table filtered the slow way
    expect = events.filter(
        F.to_date(F.timestamp_seconds(F.expr("ts_ns div 1000000000"))) == F.lit(one_date)
    ).count()
    assert q.count() == expect > 0


def test_round4_declared_queries_plan_clean(spark, sf_dir_oracle):
    """No round-4 query may plan a cartesian product or a
    broadcast-nested-loop join — the scale guarantee stated in each
    docstring, pinned here for the whole batch."""
    from bigdata_hits_spark import queries as q

    names = [
        "chunk_documents",
        "mixture_sample",
        "profile_orders",
        "events_sliding_agg",
        "text_unigram_logprob",
        "strip_boilerplate",
        "repeated_span_coverage",
        "remove_repeated_spans",
        "rollup_orders_revenue",
        "pivot_orders_priority",
        "unpivot_lineitem_metrics",
        "events_asof_tolerance",
        "quality_ntile_gate",
        "cube_orders_revenue",
        "orders_moving_avg",
        "range_join_price_bands",
        "dedup_levenshtein_names",
        "median_price_per_brand",
        "graph_bfs_distance",
        "events_json_props",
        "lineitem_metric_stats",
        "orders_price_rank",
        "entity_resolution_names",
        "orders_price_window_stats",
        "weighted_sample_docs",
        "orders_band_count_sweep",
        "quality_top_frac_by_source",
    ]
    reg = q.queries()
    # unigram attaches its (total, vocab) one-row aggregate via
    # crossJoin(broadcast(...)) — the engine's standard scalar-attach
    # (plans/iterate.py normalized); a BNLJ whose build side is one row
    # is a constant-fold, not a scale risk.  quality_ntile_gate's total-N
    # attach (operators/ranks.py ntile_exact) is the same shape.  Exactly
    # one is allowed there and zero anywhere else.
    one_row_attach = {
        "text_unigram_logprob",
        "quality_ntile_gate",
        "orders_price_window_stats",
    }
    for name in names:
        plan = _plan(reg[name](spark, sf_dir_oracle))
        assert "CartesianProduct" not in plan, name
        allowed = 1 if name in one_row_attach else 0
        assert plan.count("BroadcastNestedLoopJoin") <= allowed, name


def test_round5_declared_queries_plan_clean(spark, sf_dir_oracle):
    """Round-5 batch: no cartesian products, no broadcast-nested-loop
    joins in any declared plan — same pin as the round-4 batch."""
    from bigdata_hits_spark import queries as q

    names = [
        "embedding_neardup_lsh",
        "skew_report",
        "canonical_url_docs",
        "sparse_cosine_topk_docs",
        "salted_join_lineitem_supplier",
        "orders_price_histogram",
        "events_hourly_gapfill",
        "text_bm25",
        "events_funnel",
        "events_cohort_retention",
        "orders_snapshot_diff",
        "quality_top_frac_skew_safe",
        "graph_label_propagation_k6",
    ]
    # histogram attaches its one-row (min, width) bounds via
    # crossJoin(broadcast(...)) — the engine's standard scalar attach;
    # bm25's one-row (n_docs, avgdl), skew_report's one-row total, and
    # the tfidf n_docs attach inside sparse retrieval's (pinned, single)
    # postings evaluation are the same shape.
    one_row_attach = {
        "orders_price_histogram",
        "text_bm25",
        "skew_report",
        "sparse_cosine_topk_docs",
    }
    reg = q.queries()
    for name in names:
        plan = _plan(reg[name](spark, sf_dir_oracle))
        assert "CartesianProduct" not in plan, name
        allowed = 1 if name in one_row_attach else 0
        assert plan.count("BroadcastNestedLoopJoin") <= allowed, name
