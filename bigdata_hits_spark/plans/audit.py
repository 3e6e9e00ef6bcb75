"""Physical-plan auditing: count the shuffle exchanges a plan would run.

A shuffle is the unit of scale pain — every `groupBy`/`join`/`distinct`/
`repartition` that cannot be satisfied by existing partitioning plans an
``Exchange``, and at 100 TB each one is a full-data network pass.  The
shuffle BUDGET of a query (how many exchanges its plan contains) is
therefore a scale contract: a code change that silently turns a broadcast
join into a sort-merge join, or loses a partitioning reuse, shows up as a
budget increase long before anyone runs it at scale.

``tests/plan_shuffle_budget.json`` records the audited budget for every
declared query; ``tests/test_plans.py`` holds the surface to it and
``scripts/gen_shuffle_budget.py`` regenerates the record after a
DELIBERATE plan change.
"""

from __future__ import annotations

import re

#: Shuffle exchanges only: `Exchange hashpartitioning/rangepartitioning/
#: SinglePartition/RoundRobinPartitioning`.  \b keeps `BroadcastExchange`
#: (no network shuffle of the big side) and `ReusedExchange` (no second
#: execution) out of the count.
_SHUFFLE_RE = re.compile(
    r"\bExchange (hashpartitioning|rangepartitioning|SinglePartition|RoundRobinPartitioning)"
)


def count_shuffles(plan: str) -> int:
    """Number of shuffle exchanges in a physical-plan string
    (``df._jdf.queryExecution().executedPlan().toString()``; with AQE the
    string is the initial plan, which is what the budget pins — runtime
    re-plans only ever REMOVE work)."""
    return len(_SHUFFLE_RE.findall(plan))
