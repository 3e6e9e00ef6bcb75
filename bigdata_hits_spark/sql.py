"""SQL entry point — temp-view registration over the engine's tables.

The reference has no SQL surface at all (14 hard-coded scripts, SURVEY
§3); this engine is DataFrame/SQL-first, so anything loadable through
:mod:`bigdata_hits_spark.sources.readers` is also queryable as ANSI SQL
via ``spark.sql(...)`` once registered here.

Temp views are *logical* bindings: Catalyst sees straight through them,
so predicate pushdown, column pruning and join planning behave exactly
as they do for the DataFrame API (asserted in tests/test_sql.py).  At
100 TB this matters: a view is free, a materialization is not — nothing
here copies data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigdata_hits_spark.sources.readers import (
    TESTDATA_TABLES,
    load_table,
    read_edges_csv,
    read_nodes_csv,
)


def register_testdata_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TESTDATA_TABLES
) -> list[str]:
    """Register every driver testdata table as a temp view named after the
    table (``region``, ``nation``, ... ``embeddings``).

    Returns the view names registered.  Views share the schema-normalized
    readers (e.g. ``events`` exposes both ``ts_ns`` and the microsecond
    ``ts`` — readers.py), so SQL and DataFrame callers see one schema.
    """
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return list(tables)


def register_graph_views(
    spark: SparkSession,
    nodes: DataFrame | str,
    edges: DataFrame | str | None = None,
    nodes_view: str = "nodes",
    edges_view: str = "edges",
) -> tuple[str, ...]:
    """Register a property graph (reference data model, SURVEY §1.1) as
    views.  ``nodes``/``edges`` may be DataFrames or paths to the
    reference's ``name:TYPE``-headed CSVs; ``edges=None`` registers the
    nodes view alone (the reference checkout ships without its edges CSV
    — ``/root/reference/.MISSING_LARGE_BLOBS:1``).
    """
    if isinstance(nodes, str):
        nodes = read_nodes_csv(spark, nodes)
    nodes.createOrReplaceTempView(nodes_view)
    if edges is None:
        return (nodes_view,)
    if isinstance(edges, str):
        edges = read_edges_csv(spark, edges)
    edges.createOrReplaceTempView(edges_view)
    return nodes_view, edges_view


def sql(spark: SparkSession, query: str) -> DataFrame:
    """Run ANSI SQL against the registered views.  Thin by design —
    ``spark.sql`` already is the engine; this exists so library users have
    one import for "register views, then query"."""
    return spark.sql(query)
