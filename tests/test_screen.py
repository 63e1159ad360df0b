"""Marker screening: device op vs oracle, rescue-small semantics."""

import numpy as np

from pyskani_tpu.oracle import seeding as oseed
from pyskani_tpu.oracle.screen import check_markers_quickly, marker_ani_estimate
from pyskani_tpu.ops.screen import screen_batch
from pyskani_tpu.ops.sketch import sketch_genome_device
from pyskani_tpu.params import SketchParams

from conftest import mutate, random_genome


def _marker_pad(dev, M):
    hi = np.full(M, 0xFFFFFFFF, np.uint32)
    lo = np.full(M, 0xFFFFFFFF, np.uint32)
    m = int(dev.n_markers)
    hi[:m] = np.asarray(dev.markers_hi[:m])
    lo[:m] = np.asarray(dev.markers_lo[:m])
    return hi, lo, m


def test_screen_matches_oracle():
    rng = np.random.default_rng(11)
    params = SketchParams()
    base = random_genome(rng, 80_000)
    genomes = {
        "self": base,
        "mut2": mutate(rng, base, 0.02),
        "mut10": mutate(rng, base, 0.10),
        "mut20": mutate(rng, base, 0.20),
        "other": random_genome(rng, 80_000),
    }
    q_o = oseed.sketch_genome("q", [base], params)
    q_d = sketch_genome_device("q", [base], params, length_bucket=1 << 17)

    refs_o = {k: oseed.sketch_genome(k, [g], params) for k, g in genomes.items()}
    refs_d = {k: sketch_genome_device(k, [g], params, length_bucket=1 << 17)
              for k, g in genomes.items()}

    M = 1024
    names = list(genomes)
    stack = [_marker_pad(refs_d[k].device, M) for k in names]
    hi = np.stack([s[0] for s in stack])
    lo = np.stack([s[1] for s in stack])
    counts = np.array([s[2] for s in stack], np.int32)

    qdev = q_d.device
    for screen_val in (0.80, 0.95, 0.0):
        passes, est = screen_batch(qdev.markers_hi, qdev.markers_lo,
                                   qdev.n_markers, hi, lo, counts,
                                   screen_val, marker_k=params.marker_k,
                                   rescue_small=True)
        for i, k in enumerate(names):
            want = check_markers_quickly(q_o, refs_o[k], screen_val, True)
            assert bool(passes[i]) == want, (k, screen_val)
            got_est = float(est[i])
            want_est = marker_ani_estimate(q_o, refs_o[k])
            assert abs(got_est - want_est) < 1e-6, (k, got_est, want_est)


def test_rescue_small():
    rng = np.random.default_rng(12)
    params = SketchParams()
    tiny = random_genome(rng, 3_000)   # few markers expected (<20)
    other = random_genome(rng, 80_000)
    t_d = sketch_genome_device("t", [tiny], params, length_bucket=1 << 15)
    o_d = sketch_genome_device("o", [other], params, length_bucket=1 << 17)
    assert int(t_d.device.n_markers) < 20

    hi, lo, m = _marker_pad(t_d.device, 512)
    qdev = o_d.device
    passes, _ = screen_batch(qdev.markers_hi, qdev.markers_lo, qdev.n_markers,
                             hi[None], lo[None], np.array([m], np.int32),
                             0.8, marker_k=params.marker_k, rescue_small=True)
    assert bool(passes[0])  # rescued despite zero marker overlap
    passes, _ = screen_batch(qdev.markers_hi, qdev.markers_lo, qdev.n_markers,
                             hi[None], lo[None], np.array([m], np.int32),
                             0.8, marker_k=params.marker_k, rescue_small=False)
    assert not bool(passes[0])
