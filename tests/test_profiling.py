"""Observability subsystem: profiling scopes, counters, derived rates.

The reference has no tracing/metrics at all (SURVEY.md §5); these tests
pin the behavior of the new subsystem (pyskani_tpu/utils/profiling.py).
"""

import numpy as np

import pyskani_tpu
from pyskani_tpu.utils import profiling


def _genome(rng, n=4000):
    return rng.choice(np.frombuffer(b"ACGT", np.uint8), size=n).tobytes()


def test_disabled_scope_is_noop():
    profiling.disable()
    profiling.reset_stats()
    with profiling.scope("sketch"):
        pass
    snap = profiling.stats().snapshot()
    assert snap["timers_s"] == {}
    assert snap["counters"] == {}


def test_stats_collected_through_database():
    rng = np.random.default_rng(7)
    base = np.frombuffer(_genome(rng, 20000), np.uint8).copy()
    mut = base.copy()
    idx = rng.integers(0, len(mut), 200)
    mut[idx] = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=len(idx))

    profiling.enable()
    profiling.reset_stats()
    try:
        db = pyskani_tpu.Database()
        db.sketch("ref", base.tobytes())
        db.query("query", mut.tobytes(), learned_ani=False)
        snap = profiling.stats().snapshot()
    finally:
        profiling.disable()

    assert snap["counters"]["bases_sketched"] == 40000
    assert snap["counters"]["refs_screened"] == 1
    assert snap["calls"]["sketch"] == 2
    assert snap["calls"]["screen"] == 1
    assert snap["timers_s"]["sketch"] > 0
    # derived rates appear when their inputs are present
    assert "sketch_mbp_per_s" in snap["counters"]
    assert 0.0 <= snap["counters"]["screen_pass_rate"] <= 1.0
