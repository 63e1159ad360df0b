"""Second sweep: block size x max_anchors_per_fragment (run on real TPU).

Checksums compare the UPPER-TRIANGLE ani values only (the tile interior
includes diagonal/sub-diagonal lanes that differ by tiling, so whole-tile
sums are not comparable).
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
sketches = sketch_genomes_device(
    [(f"g{i}", [g]) for i, g in enumerate(genomes)], params)
jax.block_until_ready(sketches[-1].device.kmers)

cfg = ChainConfig()
batch = stack_sketches(sketches)
nf = round_up(max(s.n_fragments(cfg.fragment_length) for s in sketches) + 2,
              64)
S = batch.kmers.shape[1]
ri, qi = np.triu_indices(N, k=1)
n_pairs = len(ri)
print(f"S={S} NF={nf} pairs={n_pairs}", flush=True)


def run_triangle(block, pf, app_frac=0.75):
    budgets = C.EngineBudgets(
        max_anchors=round_up(S * 3 // 2 + 4096, 8192),
        max_fragments=nf, max_anchors_per_fragment=pf)
    app = round_up(int(S * app_frac), 1024)
    total_anchors = round_up(block * block * app, 8192)
    tiles = []
    for bi in range(0, N, block):
        for bj in range(0, N, block):
            if bj + block <= bi:
                continue
            tiles.append((bi, bj,
                          take_sketch(batch, jnp.arange(bi, bi + block)),
                          take_sketch(batch, jnp.arange(bj, bj + block))))

    def run():
        ani = np.zeros((N, N), np.float32)
        for bi, bj, r, q in tiles:
            out = C.chain_block(r, q, cfg=cfg, budgets=budgets,
                                total_anchors=total_anchors)
            ani[bi:bi + block, bj:bj + block] = np.asarray(out["ani_mean"])
        return ani

    t0 = time.time()
    ani = run()
    first = time.time() - t0
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        ani = run()
    dt = (time.time() - t0) / reps
    tri = ani[ri, qi]
    print(f"block={block:3d} PF={pf:4d} anchors={total_anchors/1e6:6.2f}M "
          f"tiles={len(tiles)} first={first:6.1f}s steady={dt:6.2f}s "
          f"pairs/s={n_pairs/dt:7.1f} tri_sum={tri.sum():.4f} "
          f"tri_min={tri.min():.4f}", flush=True)
    return tri


if __name__ == "__main__":
    base = run_triangle(8, 512)
    for block, pf in [(8, 256), (4, 256), (8, 384), (16, 256)]:
        if block * block * nf > (1 << 17):
            print(f"block={block}: skipped")
            continue
        tri = run_triangle(block, pf)
        print(f"    max|d-ani| vs (8,512): {np.abs(tri - base).max():.6f}",
              flush=True)
