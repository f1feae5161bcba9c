"""Window-rotation audit (round 7, VERDICT r6 stretch-#8).

The driver's correctness gate records only the FIRST 50 ``queries()``
entries; rotations move redundant family variants to the tail. This
pins the invariants a rotation must preserve so a future one cannot
silently orphan a capability:

- every query name the SURVEY §8 ledger references still exists in
  ``queries()`` (no stale/renamed references);
- every queries() entry — window AND tail — is named somewhere in the
  §8 section (the ledger stays current: an operator without a ledger
  row is invisible to the coverage audit);
- the window is exactly the first 50 entries, duplicate-free, and every
  oracle_sql() key matches a queries() key (and column contracts are
  covered by tools/check_oracle.py).
"""

from __future__ import annotations

import re
from pathlib import Path

import __spark_entry__ as E

SURVEY = Path(__file__).resolve().parent.parent / "SURVEY.md"


def _section8_text() -> str:
    text = SURVEY.read_text()
    m = re.search(r"^## §8 .*$", text, flags=re.M)
    assert m, "SURVEY.md must keep the §8 coverage ledger"
    return text[m.start():]


def test_ledger_references_resolve_and_cover_all_queries():
    qs = list(E.queries())
    qset = set(qs)
    sec = _section8_text()
    words = set(re.findall(r"[a-z][a-z0-9_]{3,}", sec))
    # every queries() entry must be named in §8 (ledger currency)
    missing = [q for q in qs if q not in words]
    assert not missing, f"queries() entries absent from SURVEY §8: {missing}"
    # every snake_case token in §8 that LOOKS like a query name (matches
    # a historical entry pattern: appears in a `queries()`-entry column)
    # must resolve; approximate by checking the third table column
    stale = []
    for line in sec.splitlines():
        if not line.startswith("|"):
            continue
        cols = [c.strip() for c in line.split("|")]
        if len(cols) < 5 or cols[3] in ("—", "", "queries() entry"):
            continue
        for tok in re.findall(r"[a-z][a-z0-9_]{3,}", cols[3]):
            if tok.endswith(("_events", "_orders", "_scan", "_verify")) and (
                tok not in qset
            ):
                stale.append((tok, cols[1][:40]))
    assert not stale, f"ledger names queries that no longer exist: {stale}"


def test_window_shape():
    qs = list(E.queries())
    assert len(qs) == len(set(qs))
    assert len(qs) >= 50, "window must stay full"
    # oracle keys all correspond to queries() entries
    extra = set(E.oracle_sql()) - set(qs)
    assert not extra, f"oracle_sql keys without queries() entries: {extra}"


def test_every_window_entry_is_distinct_capability_annotated():
    """Rotations must be ANNOTATED: any entry past position 50 whose
    name is not mentioned in §8 would already fail the currency check;
    here we additionally pin that the in-window set has no entry that
    §8 explicitly marks as tail ('(tail)')."""
    sec = _section8_text()
    window = set(list(E.queries())[:50])
    mismarked = [
        q
        for q in window
        if re.search(rf"\b{re.escape(q)} \(tail", sec)
    ]
    assert not mismarked, (
        f"§8 marks in-window entries as tail (stale annotation): {mismarked}"
    )
