"""First-consumer cost attribution for shared materializations.

Several query families build a shared artifact ONCE per (application,
sf_dir) — the MinHash->LSH->CC label tables, the SimHash sketch, the
on-disk silver table drives, the streaming staging run — and every
dependent query rides the cache.  Without attribution, whichever
member runs FIRST absorbs the whole build cost in its bench number
while the published floor (taken as a min over repeats, where the
cache is warm) records only the cheap cached read: every bench diff
then flags a phantom ">100x regression" on the first consumer.

The fix: build sites wrap their one-time work in ``charged_build(
group)``; ``bench.py`` drains the ledger after each query, charges the
recorded seconds to the named GROUP instead of the query, and reports
``groups`` alongside ``queries`` — so per-query numbers are steady
cached-read costs and each pipeline's real build cost appears exactly
once, under a stable name, regardless of member order.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

#: (group, seconds) entries appended by charged_build, drained by bench
BUILD_LEDGER: list[tuple[str, float]] = []

#: stack of accumulated DIRECT-child raw durations for open spans —
#: charged_build spans can nest (e.g. the dedup cc_labels build calls
#: q_minhash_lsh, whose own charged_build runs inside it); recording
#: each span's raw wall time would charge the inner build twice (once
#: under its own group, once inside the parent's).  Each span records
#: SELF time (raw minus direct children's raw), so the ledger's sum
#: equals the outermost span's wall time exactly.
_OPEN_CHILD_RAW: list[float] = []


def open_span(group: str) -> tuple:
    """Explicit-bracket variant of ``charged_build`` for build sites
    whose body isn't cleanly wrappable in a ``with`` (the silver
    on-disk drives, the streaming staging run).  MUST be paired with
    ``close_span`` on every non-exception path; participates in the
    same nesting stack, so a build that transitively triggers another
    charged build is never double-counted."""
    _OPEN_CHILD_RAW.append(0.0)
    return (group, time.perf_counter(), len(_OPEN_CHILD_RAW))


def close_span(span: tuple) -> None:
    group, t0, depth = span
    # an exception between open/close may have leaked child frames
    # (their builds died with it): fold them away before closing ours
    while len(_OPEN_CHILD_RAW) > depth:
        _OPEN_CHILD_RAW.pop()
    raw = time.perf_counter() - t0
    children = _OPEN_CHILD_RAW.pop()
    BUILD_LEDGER.append((group, round(max(raw - children, 0.0), 4)))
    if _OPEN_CHILD_RAW:
        # a child's raw span (self + grandchildren) leaves the
        # parent's self time; grandchild self is already netted out
        _OPEN_CHILD_RAW[-1] += raw


@contextmanager
def charged_build(group: str):
    span = open_span(group)
    try:
        yield
    finally:
        close_span(span)


def drain() -> list[tuple[str, float]]:
    out = list(BUILD_LEDGER)
    BUILD_LEDGER.clear()
    return out
