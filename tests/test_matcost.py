"""charged_build attribution: nested spans must record SELF time.

The dedup cc_labels build calls q_minhash_lsh, whose own
charged_build runs INSIDE the parent span — recording raw wall time
for both would charge the inner build twice (once under its group,
once inside the parent's), inflating bench ``groups`` and ``value``.
The ledger's invariant: the sum of recorded seconds equals the
outermost span's wall time.

Assertions are STRUCTURAL (measured against perf_counter wall times,
not fixed absolute windows): sleep() can overshoot arbitrarily under
ambient load, so "child ~= 0.05s" style bounds would flake.
"""

from __future__ import annotations

import time

from huracan_spark.queries import matcost


def setup_function(_fn):
    matcost.drain()


def test_nested_spans_record_self_time_only():
    t_outer0 = time.perf_counter()
    with matcost.charged_build("parent"):
        time.sleep(0.05)
        t_child0 = time.perf_counter()
        with matcost.charged_build("child"):
            time.sleep(0.05)
        child_wall = time.perf_counter() - t_child0
        time.sleep(0.05)
    outer_wall = time.perf_counter() - t_outer0
    entries = dict(matcost.drain())
    assert set(entries) == {"parent", "child"}
    # child records its own wall time (no children of its own)
    assert abs(entries["child"] - child_wall) < 0.02
    # parent records self = outer - child (NOT outer): no double count
    assert abs(entries["parent"] - (outer_wall - child_wall)) < 0.02
    # invariant: ledger sum == outermost wall time
    assert abs(sum(entries.values()) - outer_wall) < 0.02


def test_grandchild_nets_out_of_both_ancestors():
    t0 = time.perf_counter()
    with matcost.charged_build("a"):
        with matcost.charged_build("b"):
            with matcost.charged_build("c"):
                time.sleep(0.05)
            time.sleep(0.02)
        time.sleep(0.02)
    wall = time.perf_counter() - t0
    entries = dict(matcost.drain())
    assert set(entries) == {"a", "b", "c"}
    assert all(v >= 0 for v in entries.values())
    # the whole point: sum of selfs == wall of the outermost span,
    # however deep the nesting — not wall * depth
    assert abs(sum(entries.values()) - wall) < 0.03


def test_sequential_spans_unaffected():
    t0 = time.perf_counter()
    with matcost.charged_build("x"):
        time.sleep(0.03)
    wall_x = time.perf_counter() - t0
    t1 = time.perf_counter()
    with matcost.charged_build("y"):
        time.sleep(0.03)
    wall_y = time.perf_counter() - t1
    entries = dict(matcost.drain())
    assert abs(entries["x"] - wall_x) < 0.02
    assert abs(entries["y"] - wall_y) < 0.02


def test_exception_inside_span_still_records_and_unwinds():
    try:
        with matcost.charged_build("outer"):
            with matcost.charged_build("inner"):
                raise RuntimeError("boom")
    except RuntimeError:
        pass
    entries = dict(matcost.drain())
    assert set(entries) == {"outer", "inner"}
    assert not matcost._OPEN_CHILD_RAW  # stack fully unwound


def test_open_close_span_participates_in_nesting():
    """The explicit-bracket API (silver drives, streaming staging) must
    net out of an enclosing charged_build exactly like a `with`."""
    t0 = time.perf_counter()
    with matcost.charged_build("outer"):
        span = matcost.open_span("drive")
        time.sleep(0.04)
        matcost.close_span(span)
        time.sleep(0.02)
    wall = time.perf_counter() - t0
    entries = dict(matcost.drain())
    assert set(entries) == {"outer", "drive"}
    assert abs(sum(entries.values()) - wall) < 0.02


def test_close_span_folds_leaked_child_frames():
    """An exception between a child's open and close must not corrupt
    later accounting: close_span drops frames above its own depth."""
    outer = matcost.open_span("outer")
    matcost.open_span("leaked-child")  # never closed (simulated crash)
    matcost.close_span(outer)
    entries = dict(matcost.drain())
    assert set(entries) == {"outer"}
    assert not matcost._OPEN_CHILD_RAW
