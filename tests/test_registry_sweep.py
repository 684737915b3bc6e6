"""Whole-registry structural sweeps — guarantees that hold for EVERY
registered query, present and future:

- no physical plan may contain a CartesianProduct (the one join shape
  that cannot survive a 100x scale-up; broadcast-1-row crossJoins plan
  as BroadcastNestedLoopJoin and are allowed);
- every output column is a clean snake_case identifier with no
  duplicates (the driver sorts columns by name before value-hashing,
  so auto-generated names like ``sum(x)`` or dup names silently break
  the oracle contract);
- every UNPARTITIONED window (global ``Window.orderBy``) must sit
  above a limit/top-K or a reviewed bounded-grid aggregate — the
  classic 100 TB single-partition funnel is refused mechanically, not
  by comment;
- query-building code must not ``collect()`` unbounded row sets to
  the driver (the streaming fold regression class).
"""

from __future__ import annotations

import re

import pytest

from huracan_spark.queries.registry import REGISTRY, spark_queries

spark_queries()

_NAMES = sorted(REGISTRY)
_IDENT = re.compile(r"^[a-z][a-z0-9_]*$")


@pytest.fixture(scope="module")
def built(spark, sf_dir):
    """Build every registered DataFrame once (plans are reused by both
    sweeps; queries whose builders collect scalars run at sf0.001)."""
    return {name: REGISTRY[name].fn(spark, sf_dir) for name in _NAMES}


def test_no_cartesian_product_anywhere(built):
    offenders = []
    for name, df in built.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, f"cartesian products in: {offenders}"


def _walk_plan(node):
    """Every physical node, descending through AQE wrappers and query
    stages (AdaptiveSparkPlanExec is a leaf to children(); its real
    subtree hangs off inputPlan)."""
    yield node
    name = node.getClass().getSimpleName()
    if name == "AdaptiveSparkPlanExec":
        yield from _walk_plan(node.inputPlan())
        return
    if name.endswith("QueryStageExec"):
        yield from _walk_plan(node.plan())
        return
    if name == "InMemoryTableScanExec":
        # a persist() hides its subtree behind the cached relation —
        # descend so cached lineages stay subject to every sweep
        # (the r8 semdedup BNLJ pin went vacuous without this)
        yield from _walk_plan(node.relation().cachedPlan())
        return
    kids = node.children()
    for i in range(kids.size()):
        yield from _walk_plan(kids.apply(i))


#: queries whose global window is fed by a REVIEWED bounded-grid
#: aggregate rather than an explicit limit — each entry names why the
#: input is provably small.  Additions require the same review; a new
#: global window over unbounded input fails the sweep by default.
_AGG_BOUNDED_GLOBAL_WINDOWS = {
    # fixed 10-row decile grid (groupBy(decile), decile in 0..9)
    "customer_decile_lift",
    # fixed GROWTH_SLICES-row grid (groupBy(hash % GROWTH_SLICES))
    "vocab_growth_curve",
    # calendar-bounded grids: one row per week/day offset of the
    # corpus time span — |rows| grows with TIME, not data volume
    "kaplan_meier_weekly",
    "seasonal_decomp_daily",
}


def test_global_windows_are_bounded(built):
    """Any WindowExec with an EMPTY partition spec funnels its whole
    input through one task — fatal at 100 TB unless the input is
    provably tiny.  Mechanically: its subtree must contain a
    Limit/TakeOrderedAndProject, or the query is on the reviewed
    aggregate-bounded allowlist AND an aggregate feeds the window."""
    offenders = []
    for name, df in built.items():
        root = df._jdf.queryExecution().executedPlan()
        for node in _walk_plan(root):
            if node.getClass().getSimpleName() != "WindowExec":
                continue
            if node.partitionSpec().size() > 0:
                continue
            subtree = [
                n.getClass().getSimpleName()
                for n in _walk_plan(node)
            ][1:]
            limited = any(
                "Limit" in s or s == "TakeOrderedAndProjectExec"
                for s in subtree
            )
            aggregated = any("Aggregate" in s for s in subtree)
            if limited:
                continue
            if name in _AGG_BOUNDED_GLOBAL_WINDOWS and aggregated:
                continue
            offenders.append((name, "unbounded global window"))
            break
    assert not offenders, offenders


def test_no_unbounded_driver_collect_in_query_code():
    """``.collect()`` in query-building code pulls rows to the driver;
    the only tolerated sites are single-row scalar reads.  The
    streaming fold (queries/streamq.py) must stay executor-side — the
    gold_view MERGE pattern, never a driver dict."""
    import pathlib

    import huracan_spark.queries as qpkg

    qdir = pathlib.Path(qpkg.__file__).parent
    offenders = []
    for py in sorted(qdir.glob("*.py")):
        src = py.read_text()
        # `.collect()[0]` is a single-row scalar read (aggregate of one
        # row to the driver — O(1), the kmeans/argmax pattern); any
        # other collect() materializes an unbounded row set
        n = src.count(".collect()") - src.count(".collect()[0]")
        if n > 0:
            offenders.append((py.name, n))
    assert not offenders, (
        f"driver-side collect() in query code: {offenders} — use the "
        "executor-side MERGE fold (streaming/gold_view.py pattern)"
    )


def test_output_columns_are_clean_identifiers(built):
    offenders = []
    for name, df in built.items():
        cols = df.columns
        if len(set(cols)) != len(cols):
            offenders.append((name, "duplicate columns", cols))
            continue
        bad = [c for c in cols if not _IDENT.match(c)]
        if bad:
            offenders.append((name, "non-identifier columns", bad))
    assert not offenders, offenders
