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


@contextmanager
def charged_build(group: str):
    t0 = time.perf_counter()
    _OPEN_CHILD_RAW.append(0.0)
    try:
        yield
    finally:
        raw = time.perf_counter() - t0
        children = _OPEN_CHILD_RAW.pop()
        BUILD_LEDGER.append((group, round(max(raw - children, 0.0), 4)))
        if _OPEN_CHILD_RAW:
            # a child's raw span (self + grandchildren) leaves the
            # parent's self time; grandchild self is already netted out
            _OPEN_CHILD_RAW[-1] += raw


def drain() -> list[tuple[str, float]]:
    out = list(BUILD_LEDGER)
    BUILD_LEDGER.clear()
    return out
