"""Unit tests for bench.py's mover classifier (VERDICT r14 item 2):
the round artifact must carry the box-moved / plan-moved adjudication
the r13/r14 reviews derived by hand from the host_refs, so the next
judge reads a field instead of re-deriving prose. Pure function — no
Spark, no timing."""

from __future__ import annotations

from bench import _classify_movers


def _refs(cpu: float) -> dict:
    return {"cpu_matmul_sec": cpu, "io_64mb_sec": 0.1}


def test_small_deltas_are_not_movers():
    out = _classify_movers(
        {"q1": 1.05, "q2": 0.96}, {"q1": 1.0, "q2": 1.0}, _refs(1.0), _refs(1.0)
    )
    assert out == {}


def test_box_moved_when_refs_move_with_the_query():
    # the r13 anomaly signature: query +40%, cpu ref +55% same direction
    out = _classify_movers({"q": 1.4}, {"q": 1.0}, _refs(1.55), _refs(1.0))
    assert out["q"]["class"] == "box-moved"
    # and symmetrically for a recovery (both faster)
    out = _classify_movers({"q": 0.7}, {"q": 1.0}, _refs(0.6), _refs(1.0))
    assert out["q"]["class"] == "box-moved"


def test_plan_moved_when_refs_are_flat():
    out = _classify_movers({"q": 1.4}, {"q": 1.0}, _refs(1.02), _refs(1.0))
    assert out["q"]["class"] == "plan-moved"
    assert out["q"]["ratio"] == 1.4


def test_ambiguous_when_refs_move_against_the_query():
    out = _classify_movers({"q": 1.4}, {"q": 1.0}, _refs(0.7), _refs(1.0))
    assert out["q"]["class"] == "ambiguous"


def test_unclassified_without_previous_refs():
    out = _classify_movers({"q": 1.4}, {"q": 1.0}, _refs(1.0), {})
    assert out["q"]["class"] == "unclassified"


def test_missing_or_failed_queries_are_skipped():
    out = _classify_movers(
        {"q": None, "new_q": 2.0}, {"q": 1.0}, _refs(1.0), _refs(1.0)
    )
    assert out == {}
