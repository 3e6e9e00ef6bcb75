"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``bigdata_hits_spark.queries``; this module is a
thin, stable shim.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata_hits_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: base HITS (k=8) on the part->supplier graph derived
    from /root/testdata/sf0.001 (SURVEY §2.2 A1)."""
    from bigdata_hits_spark.operators.ranking import hits
    from bigdata_hits_spark.sources.derived import g_ps

    # The driver may hand us a session without the engine's parquet-nanos
    # compat conf; set it where still possible (no-op if already set).
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    return _q.rank_union(hits(g_ps(spark, "/root/testdata/sf0.001"), k=8))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return _q.oracle_sql()
