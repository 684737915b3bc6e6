"""DuckDB CTE-inlining protection for generated oracle SQL.

DuckDB's default CTE handling inlines the body at every reference
site.  A chain where each level references its predecessor twice is
re-evaluated 2^depth times — the round-9 ``kcore_trade_graph`` OOM
under the harness's 24GB memory cap (the blowup happens during
inlined re-evaluation and cannot spill).  The semdedup active-tree
oracles hit the same wall in round 9 (371 s inlined vs 6.5 s
materialized at r=3).

``materialize_multiref_ctes`` is the corpus-wide mechanical fix: it
parses the top-level WITH chain of an oracle, counts true table
references (``FROM``/``JOIN`` <name>), and inserts ``MATERIALIZED``
into every CTE referenced at least twice.  ``AS MATERIALIZED`` is a
pure evaluation fence — semantics are identical, each body runs once.
The registry applies it to every registered oracle, so future oracles
are protected without per-author discipline; ``tools/oracle_cte_audit``
pins the invariant.

Safety properties of the parser:
- ``--`` comments and string-literal bodies are masked before any
  paren counting or keyword matching (comments in this corpus contain
  unbalanced parens across lines).
- ``WITH RECURSIVE`` members that reference themselves are never
  materialized (DuckDB evaluates recursive members iteratively — no
  inlining blowup — and MATERIALIZED on them is not meaningful);
  non-self-referencing members of a recursive WITH list are handled
  like any other CTE.
- Already-``MATERIALIZED`` CTEs are left untouched (idempotent).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

__all__ = [
    "materialize_multiref_ctes",
    "inline_multiplicities",
    "split_top_level_ctes",
]

_HEAD = re.compile(r"\s*(\w+)\s+AS\s+(MATERIALIZED\s+)?\(", re.IGNORECASE)
_WITH = re.compile(r"\bWITH\b(\s+RECURSIVE\b)?", re.IGNORECASE)


@dataclass
class Cte:
    name: str
    materialized: bool
    body_span: tuple[int, int]  # [start, end) inside the sql string
    insert_pos: int  # position of the body's opening '(' in the sql


def _mask(sql: str) -> str:
    """Blank out -- comments and string-literal bodies (length-preserving,
    so indices into the mask are indices into the original)."""
    out = list(sql)
    i, n = 0, len(sql)
    in_str = False
    while i < n:
        c = sql[i]
        if in_str:
            if c == "'":
                in_str = False  # a doubled '' re-enters on the next quote
            else:
                out[i] = " "
            i += 1
            continue
        if c == "'":
            in_str = True
            i += 1
            continue
        if c == "-" and i + 1 < n and sql[i + 1] == "-":
            while i < n and sql[i] != "\n":
                out[i] = " "
                i += 1
            continue
        i += 1
    return "".join(out)


def split_top_level_ctes(sql: str):
    """Parse the (single, top-level) WITH clause.

    Returns ``(ctes, tail_span, masked)`` where ``ctes`` is a list of
    :class:`Cte`, ``tail_span`` covers the main query after the WITH
    list, and ``masked`` is the comment/string-masked text the spans
    index into.  Returns ``([], (0, len(sql)), masked)`` when there is
    no WITH clause.
    """
    masked = _mask(sql)
    m = _WITH.search(masked)
    if not m:
        return [], (0, len(sql)), masked
    i = m.end()
    n = len(masked)
    ctes: list[Cte] = []
    while True:
        hm = _HEAD.match(masked, i)
        if not hm:
            break
        depth, j = 1, hm.end()
        while j < n and depth:
            if masked[j] == "(":
                depth += 1
            elif masked[j] == ")":
                depth -= 1
            j += 1
        ctes.append(
            Cte(
                name=hm.group(1),
                materialized=bool(hm.group(2)),
                body_span=(hm.end(), j - 1),
                insert_pos=hm.end() - 1,
            )
        )
        k = j
        while k < n and masked[k].isspace():
            k += 1
        if k < n and masked[k] == ",":
            i = k + 1
            continue
        i = j
        break
    return ctes, (i, len(sql)), masked


def _refs_in(masked: str, span: tuple[int, int], name: str) -> int:
    """Count FROM/JOIN table references to ``name`` inside ``span``."""
    pat = re.compile(
        r"\b(?:FROM|JOIN)\s+" + re.escape(name) + r"\b", re.IGNORECASE
    )
    return len(pat.findall(masked, span[0], span[1]))


def materialize_multiref_ctes(sql: str) -> str:
    """Insert MATERIALIZED into every top-level CTE referenced >= 2 times.

    Self-referencing (recursive) members and already-materialized CTEs
    are left untouched.  Idempotent; no-op when there is no WITH clause.
    """
    ctes, tail_span, masked = split_top_level_ctes(sql)
    if not ctes:
        return sql
    inserts = []
    for idx, cte in enumerate(ctes):
        if cte.materialized:
            continue
        if _refs_in(masked, cte.body_span, cte.name):
            continue  # recursive member — never materialize
        refs = _refs_in(masked, tail_span, cte.name)
        for later in ctes[idx + 1 :]:
            refs += _refs_in(masked, later.body_span, cte.name)
        # a CTE may also be probed by an earlier-defined sibling's scalar
        # subquery in DuckDB?  No — forward references are invalid SQL, so
        # later bodies + tail is the complete consumer set.
        if refs >= 2:
            inserts.append(cte.insert_pos)
    for pos in sorted(inserts, reverse=True):
        sql = sql[:pos] + "MATERIALIZED " + sql[pos:]
    return sql


def inline_multiplicities(sql: str) -> dict[str, tuple[int, bool]]:
    """Return {cte_name: (evaluation_count_under_full_inlining,
    is_materialized)}.  Materialized bodies evaluate once regardless of
    reference count; non-materialized bodies evaluate once per reference
    per consumer evaluation — the compounding this module exists to cap.
    """
    ctes, tail_span, masked = split_top_level_ctes(sql)
    names = [c.name for c in ctes]
    pending = {nm: 0 for nm in names}
    for nm in names:
        pending[nm] += _refs_in(masked, tail_span, nm)
    mult: dict[str, tuple[int, bool]] = {}
    for cte in reversed(ctes):
        m = pending[cte.name]
        mult[cte.name] = (m, cte.materialized)
        if m == 0:
            continue
        weight = 1 if cte.materialized else m
        for dep in ctes:
            if dep.name == cte.name:
                continue
            c = _refs_in(masked, cte.body_span, dep.name)
            if c:
                pending[dep.name] += weight * c
    return mult
