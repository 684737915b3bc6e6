"""charged_build attribution: nested spans must record SELF time.

The dedup cc_labels build calls q_minhash_lsh, whose own
charged_build runs INSIDE the parent span — recording raw wall time
for both would charge the inner build twice (once under its group,
once inside the parent's), inflating bench ``groups`` and ``value``.
The ledger's invariant: the sum of recorded seconds equals the
outermost span's wall time.
"""

from __future__ import annotations

import time

from huracan_spark.queries import matcost


def setup_function(_fn):
    matcost.drain()


def test_nested_spans_record_self_time_only():
    with matcost.charged_build("parent"):
        time.sleep(0.05)
        with matcost.charged_build("child"):
            time.sleep(0.05)
        time.sleep(0.05)
    entries = dict(matcost.drain())
    assert set(entries) == {"parent", "child"}
    # child self ~0.05; parent self ~0.10 (its own sleeps, child netted out)
    assert 0.04 <= entries["child"] <= 0.09
    assert 0.08 <= entries["parent"] <= 0.15
    # invariant: ledger sum == outermost wall time (~0.15), not ~0.20
    assert entries["parent"] + entries["child"] <= 0.18


def test_grandchild_nets_out_of_both_ancestors():
    with matcost.charged_build("a"):
        with matcost.charged_build("b"):
            with matcost.charged_build("c"):
                time.sleep(0.05)
            time.sleep(0.02)
        time.sleep(0.02)
    entries = dict(matcost.drain())
    assert 0.04 <= entries["c"] <= 0.08
    assert 0.015 <= entries["b"] <= 0.05
    assert 0.015 <= entries["a"] <= 0.05
    total = sum(entries.values())
    assert 0.08 <= total <= 0.13  # == wall time of "a", no double count


def test_sequential_spans_unaffected():
    with matcost.charged_build("x"):
        time.sleep(0.03)
    with matcost.charged_build("y"):
        time.sleep(0.03)
    entries = dict(matcost.drain())
    assert 0.02 <= entries["x"] <= 0.06
    assert 0.02 <= entries["y"] <= 0.06


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
