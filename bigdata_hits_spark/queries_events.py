"""Declared queries + oracles for the event-time operators."""

from __future__ import annotations

from bigdata_hits_spark.operators import events as EV
from bigdata_hits_spark.queries import register
from bigdata_hits_spark.sources.readers import load_table


@register(
    "events_hourly_agg",
    f"SELECT epoch_ns(ts) // {EV.HOUR_NS} AS bucket_hour, event_type, "
    "COUNT(*) AS n, ROUND(CAST(SUM(value) AS DOUBLE), 6) AS total_value "
    "FROM events GROUP BY 1, 2",
)
def q_events_hourly(spark, sf_dir):
    return EV.hourly_event_counts(load_table(spark, sf_dir, "events"))


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
    return EV.sessionize(load_table(spark, sf_dir, "events"))
