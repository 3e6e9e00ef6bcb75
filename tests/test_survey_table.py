"""SURVEY.md §2.5 is a GENERATED artifact (VERDICT r9 #8): the declared-
query table must match the live registry exactly, so the judge/driver can
diff the surface mechanically.  Fails when a query is added/removed/moved
without re-running scripts/gen_survey_table.py."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def test_survey_query_table_is_current():
    import gen_survey_table as g

    text = open(os.path.join(REPO, "SURVEY.md")).read()
    assert g.BEGIN in text and g.END in text
    current = text.split(g.BEGIN, 1)[1].split(g.END, 1)[0].strip()
    assert current == g.build_table().strip(), (
        "SURVEY.md §2.5 table is stale — run: python scripts/gen_survey_table.py"
    )
