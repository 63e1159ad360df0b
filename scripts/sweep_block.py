"""Sweep chain_block tile size on the bench workload (run on real TPU).

Times the steady-state all-vs-all triangle (32 x 2.3 Mbp genomes) at
several BLOCK sizes and anchor-pool scales, plus a stage decomposition
at the best size, to pick bench.py defaults.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import make_genomes
from pyskani_tpu.engine.batch import stack_sketches, take_sketch
from pyskani_tpu.oracle.chain import ChainConfig
from pyskani_tpu.ops import chain as C
from pyskani_tpu.ops.sketch import round_up, sketch_genomes_device
from pyskani_tpu.params import SketchParams

N = int(os.environ.get("SWEEP_GENOMES", "32"))
LEN = int(os.environ.get("SWEEP_LEN", "2300000"))

params = SketchParams()
genomes = make_genomes(N, LEN)
t0 = time.time()
sketches = sketch_genomes_device(
    [(f"g{i}", [g]) for i, g in enumerate(genomes)], params)
jax.block_until_ready(sketches[-1].device.kmers)
print(f"sketch: {time.time()-t0:.1f}s", flush=True)

cfg = ChainConfig()
batch = stack_sketches(sketches)
nf = round_up(max(s.n_fragments(cfg.fragment_length) for s in sketches) + 2,
              64)
budgets = C.EngineBudgets(
    max_anchors=round_up(batch.kmers.shape[1] * 3 // 2 + 4096, 8192),
    max_fragments=nf,
    max_anchors_per_fragment=512)
S = batch.kmers.shape[1]
print(f"seed bucket S={S}, NF={nf}", flush=True)

ri, qi = np.triu_indices(N, k=1)
n_pairs = len(ri)


def run_triangle(block, app_frac):
    app = round_up(int(S * app_frac), 1024)
    total_anchors = round_up(block * block * app, 8192)
    tiles = []
    for bi in range(0, N, block):
        for bj in range(0, N, block):
            if bj + block <= bi:
                continue
            ridx = np.arange(bi, min(bi + block, N))
            qidx = np.arange(bj, min(bj + block, N))
            rpad = np.concatenate([ridx, np.zeros(block - len(ridx), int)])
            qpad = np.concatenate([qidx, np.zeros(block - len(qidx), int)])
            tiles.append((take_sketch(batch, jnp.asarray(rpad)),
                          take_sketch(batch, jnp.asarray(qpad))))

    def run():
        outs = []
        for r, q in tiles:
            out = C.chain_block(r, q, cfg=cfg, budgets=budgets,
                                total_anchors=total_anchors)
            outs.append(out["ani_mean"])
        jax.block_until_ready(outs[-1])
        return outs

    t0 = time.time()
    run()
    first = time.time() - t0
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        outs = run()
    dt = (time.time() - t0) / reps
    print(f"block={block:3d} app_frac={app_frac:.2f} "
          f"total_anchors={total_anchors/1e6:6.2f}M tiles={len(tiles)} "
          f"first={first:6.1f}s steady={dt:6.2f}s "
          f"pairs/s={n_pairs/dt:7.1f}", flush=True)
    return outs


if __name__ == "__main__":
    mode = os.environ.get("SWEEP_MODE", "block")
    if mode == "block":
        base = None
        for block, frac in [(16, 0.75), (8, 0.75), (32, 0.75),
                            (16, 0.5), (32, 0.5)]:
            if block * block * nf > (1 << 17):
                print(f"block={block}: skipped (P*NF over budget)")
                continue
            outs = run_triangle(block, frac)
            flat = np.concatenate([np.asarray(o).reshape(-1) for o in outs])
            if base is None:
                base = flat.sum()
            print(f"    checksum {flat.sum():.4f} (base {base:.4f})",
                  flush=True)
