"""Declared queries + oracles for the event-time operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_hits_spark.operators import events as EV
from bigdata_hits_spark.operators.asof import asof_join
from bigdata_hits_spark.queries import register
from bigdata_hits_spark.sources.readers import load_table


def _events_us(spark, sf_dir):
    """Events table with ``ts_ns`` truncated to microsecond grain.

    The DuckDB oracle reads the parquet timestamp as a microsecond
    TIMESTAMP, so its ``epoch_ns(ts)`` is the us-truncated nanosecond
    value; the Spark side keeps exact nanos.  Events within 1 us of an
    hour bucket, session-gap, or as-of ordering boundary would make the
    two engines disagree nondeterministically on regenerated data —
    comparing at an explicit common grain removes that."""
    return load_table(spark, sf_dir, "events").withColumn(
        "ts_ns", F.expr("(ts_ns div 1000) * 1000")
    )


@register(
    "events_hourly_agg",
    f"SELECT epoch_ns(ts) // {EV.HOUR_NS} AS bucket_hour, event_type, "
    "COUNT(*) AS n, ROUND(CAST(SUM(value) AS DOUBLE), 6) AS total_value "
    "FROM events GROUP BY 1, 2",
)
def q_events_hourly(spark, sf_dir):
    return EV.hourly_event_counts(_events_us(spark, sf_dir))


@register(
    "events_sessionize",
    "WITH o AS (SELECT user_id, event_id, epoch_ns(ts) AS ts_ns FROM events), "
    "l AS (SELECT user_id, event_id, ts_ns, "
    "LAG(ts_ns) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id) AS prev FROM o), "
    f"f AS (SELECT user_id, ts_ns, CASE WHEN prev IS NULL OR ts_ns - prev > {EV.SESSION_GAP_NS} "
    "THEN 1 ELSE 0 END AS new_s, event_id FROM l), "
    "s AS (SELECT user_id, ts_ns, CAST(SUM(new_s) OVER (PARTITION BY user_id "
    "ORDER BY ts_ns, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx FROM f) "
    "SELECT user_id, session_idx, COUNT(*) AS n_events, "
    "MIN(ts_ns) // 1000000000 AS start_s, MAX(ts_ns) // 1000000000 AS end_s "
    "FROM s GROUP BY user_id, session_idx",
)
def q_events_sessionize(spark, sf_dir):
    return EV.sessionize(_events_us(spark, sf_dir))


_ASOF_SQL = (
    "WITH e AS (SELECT event_id, user_id, epoch_ns(ts) AS ts_ns, event_type, value FROM events), "
    "u AS ("
    "SELECT user_id, ts_ns, 1 AS side, NULL::BIGINT AS tb, event_id, "
    "NULL::BIGINT AS p_id, NULL::DOUBLE AS p_value FROM e WHERE event_type = 'click' "
    "UNION ALL "
    "SELECT user_id, ts_ns, 0, event_id, NULL, event_id, value FROM e "
    "WHERE event_type = 'purchase'), "
    "f AS (SELECT user_id, ts_ns, side, event_id, "
    "LAST_VALUE(p_id IGNORE NULLS) OVER w AS purchase_id, "
    "LAST_VALUE(p_value IGNORE NULLS) OVER w AS purchase_value "
    "FROM u WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, side, tb "
    "ROWS UNBOUNDED PRECEDING)) "
    "SELECT event_id AS click_id, user_id, ts_ns // 1000 AS ts_us, purchase_id, "
    "purchase_value FROM f WHERE side = 1"
)


@register("events_asof_attribution", _ASOF_SQL)
def q_events_asof(spark, sf_dir):
    """Marketing-attribution shape: each click joined as-of to the user's
    latest prior-or-simultaneous purchase (operators/asof.py)."""
    ev = _events_us(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts_ns")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts_ns", "event_id", "value"
    )
    joined = asof_join(
        clicks,
        purchases,
        on="ts_ns",
        by="user_id",
        value_cols=["event_id", "value"],
        tiebreak="event_id",
    )
    return joined.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.expr("ts_ns div 1000").alias("ts_us"),  # oracle reads the parquet
        # timestamp at microsecond resolution; compare at that grain
        F.col("event_id_r").alias("purchase_id"),
        F.col("value_r").alias("purchase_value"),
    )

