"""Scraper parse-stage tests: the USAspending family fidelity gate.

The parse port (queries/usaspending.py) claims to cover the 14-script
federal scraper family with ONE shared query plus a per-member scope
table.  These tests re-derive that claim from the reference checkout
(plain-text reads only — no code from the reference is executed):

* the family enumeration (scripts containing the bulk-download
  endpoint constant) must equal ``_FAMILY``;
* each member's tier / awarding-agency name must match the script's
  request payload constants;
* the 9-vs-5 amount-coercion variant split must match each script's
  summary block (the non-coercing ones bind ``amount_for_summary``);
* the near-family scripts that merely mention USAspending must stay
  adjudicated non-members.
"""

from __future__ import annotations

import os
import re

import pytest

from openalex_walden_spark.queries.usaspending import _FAMILY

_REF_DIR = "/root/reference/scripts/local"

# USAspending-adjacent scrapers that are NOT template members — each
# has its own harvest/parse and is represented by the generic grammar
# batteries (COVERAGE.md, round-9 additions).
_NON_MEMBERS = {
    "doe_sc": "paginated spending_by_award search API with "
              "program_numbers filter — own parse, not the bulk template",
    "hhs_taggs": "HHS TAGGS export API (per-OPDIV slicing) — own parse",
    "cdmrp": "CDMRP search JSON API — own parse",
    "hrsa": "HRSA Data Warehouse CSV (USAspending mentioned as the "
            "rejected fallback)",
    "ies": "IES own publishing channel (USAspending mentioned as the "
           "rejected fallback)",
    "neh": "NEH own publishing channel (USAspending mentioned in prose "
           "only)",
}


def _read(slug: str) -> str:
    with open(os.path.join(_REF_DIR, f"{slug}_to_s3.py"), encoding="utf-8") as f:
        return f.read()


@pytest.mark.skipif(not os.path.isdir(_REF_DIR), reason="reference absent")
def test_usaspending_family_matches_reference():
    bulk = sorted(
        f[: -len("_to_s3.py")]
        for f in os.listdir(_REF_DIR)
        if f.endswith("_to_s3.py")
        and "BULK_DOWNLOAD_ENDPOINT" in _read(f[: -len("_to_s3.py")])
    )
    assert bulk == sorted(s for s, _, _, _ in _FAMILY), (
        "reference USAspending bulk family changed — re-adjudicate "
        "queries/usaspending.py"
    )
    for slug, tier, name, coerce in _FAMILY:
        src = _read(slug)
        m = re.search(r'"tier": "([a-z]+)"', src)
        assert m and m.group(1) == tier, (slug, tier)
        m = re.search(r'^[A-Z_]*AGENCY_NAME = "([^"]+)"', src, re.M)
        assert m and m.group(1) == name, (slug, name)
        # Non-coercing variant computes the summary into a separate
        # variable; the coercing variant mutates the column in place.
        assert ("amount_for_summary" in src) == (not coerce), (slug, coerce)
        assert '"02", "03", "04", "05"' in src, (slug, "grant types")
    # The adjudicated non-members must exist and stay off the template.
    for slug in _NON_MEMBERS:
        src = _read(slug)
        assert "BULK_DOWNLOAD_ENDPOINT" not in src, (
            f"{slug} adopted the bulk template — move it into _FAMILY"
        )


def test_usaspending_parse_plan(spark, sf_dir):
    """Scale shape: the latest-action dedup must plan as a rank-limit
    window (WindowGroupLimit prunes to top-1 per key MAP-SIDE before
    the single exchange), the 14-row scope table must broadcast, and
    there is no Python in the plan."""
    from openalex_walden_spark import queries as q

    q.load_all()
    df = q.CATALOG["usaspending_parse_awards"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "WindowGroupLimit" in plan and "Partial" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
