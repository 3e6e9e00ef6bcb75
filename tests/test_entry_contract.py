"""Invariants of the driver contract (__spark_entry__.py) that no
operator addition may break.  Pure-Python: no Spark session needed."""

import json
import os

import __spark_entry__ as entry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_oracle_key_is_a_declared_query():
    q = entry.queries()
    o = entry.oracle_sql()
    assert set(o) <= set(q), set(o) - set(q)
    # rows-only entries are the documented approximate/sampling paths
    rows_only = set(q) - set(o)
    assert rows_only == {
        "sample_bernoulli",
        "sketch_distinct_parts",
        "sketch_price_quantiles",
        "ann_lsh_topk",
        "ann_ivf_topk",
    }, rows_only


def test_gate_prefix_is_stable():
    """The driver's correctness gate consumes the FIRST 50 declared
    queries; new registrations must append AFTER that prefix (register in
    queries_postgate.py, not a theme module — a mid-registry insert
    silently evicts a gate row)."""
    q = list(entry.queries())
    recorded = json.load(open(os.path.join(REPO, "CORRECTNESS_r03.json")))
    assert q[:50] == list(recorded)[:50]


def test_oracle_backed_entries_precede_rows_only():
    q = list(entry.queries())
    o = set(entry.oracle_sql())
    first_rows_only = next(i for i, n in enumerate(q) if n not in o)
    assert all(n not in o for n in q[first_rows_only:]), (
        "rows-only entries must trail every oracle-backed one"
    )
