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


@contextmanager
def charged_build(group: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        BUILD_LEDGER.append((group, round(time.perf_counter() - t0, 4)))


def drain() -> list[tuple[str, float]]:
    out = list(BUILD_LEDGER)
    BUILD_LEDGER.clear()
    return out
