"""Benchmark: all-vs-all ANI throughput on one TPU chip.

Workload (BASELINE.md config 3): sketch N synthetic bacterial-scale
genomes (~2.3 Mbp, ~99% pairwise ANI family), then run the batched
all-vs-all triangle — N*(N-1)/2 pairs — through the jitted pair pipeline.

Prints exactly ONE JSON line:
  {"metric": ..., "value": pairs/s, "unit": "pairs/s", "vs_baseline": x}

Baseline: the reference publishes no throughput numbers (SURVEY.md §6);
the skani Nature Methods paper reports roughly ~25x FastANI with ~ms-scale
per-pair comparisons — we use 30 genome-pairs/s as the documented
single-core skani estimate for genomes of this size (see BENCH_NOTES.md
for the derivation), matching BASELINE.md's ">10x single-core skani"
target framing.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

SINGLE_CORE_SKANI_PAIRS_PER_S = 30.0  # documented estimate (BENCH_NOTES.md)

N_GENOMES = int(os.environ.get("BENCH_GENOMES", "32"))
GENOME_LEN = int(os.environ.get("BENCH_GENOME_LEN", str(2_300_000)))
BLOCK = int(os.environ.get("BENCH_BLOCK", "8"))


def make_genomes(n, length, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=length)
    out = []
    for _ in range(n):
        arr = base.copy()
        idx = rng.integers(0, length, length // 100)  # ~1% substitutions
        arr[idx] = rng.choice(np.frombuffer(b"ACGT", np.uint8),
                              size=len(idx))
        out.append(arr.tobytes())
    return out


def main():
    import jax

    from pyskani_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from pyskani_tpu.engine.batch import stack_sketches
    from pyskani_tpu.oracle.chain import ChainConfig
    from pyskani_tpu.ops.chain import EngineBudgets
    from pyskani_tpu.ops.sketch import round_up, sketch_genomes_device
    from pyskani_tpu.params import SketchParams

    dev = jax.devices()[0]
    params = SketchParams()
    genomes = make_genomes(N_GENOMES, GENOME_LEN)
    named = [(f"g{i}", [g]) for i, g in enumerate(genomes)]

    # --- sketching (batched kernel; steady rate measured post-compile) ---
    t0 = time.time()
    sketches = sketch_genomes_device(named, params)
    jax.block_until_ready(sketches[-1].device.kmers)
    t_sketch_all = time.time() - t0
    # re-sketch a batch without compile cost for the steady-state rate
    t0 = time.time()
    warm = sketch_genomes_device(named[:8], params)
    jax.block_until_ready(warm[-1].device.kmers)
    sketch_mbps = 8 * GENOME_LEN / (time.time() - t0) / 1e6

    # --- all-vs-all triangle: grouped single-sort self-joins ---
    import jax.numpy as jnp

    from pyskani_tpu.engine.batch import (max_triangle_group, take_sketch,
                                          stack_sketches as _stack)
    from pyskani_tpu.ops.chain import chain_block, chain_triangle, triu_pairs

    cfg = ChainConfig()
    batch = stack_sketches(sketches)
    nf = round_up(max(s.n_fragments(cfg.fragment_length)
                      for s in sketches) + 2, 128)
    budgets = EngineBudgets(
        max_anchors=round_up(batch.kmers.shape[1] * 3 // 2 + 4096, 8192),
        max_fragments=nf,
        max_anchors_per_fragment=256)
    ri, qi = np.triu_indices(N_GENOMES, k=1)
    n_pairs = len(ri)

    # shared anchor pool: ~pairs x typical anchors/pair (seed count bounds
    # the anchors of a non-repetitive pair)
    app = round_up(batch.kmers.shape[1] * 3 // 4, 1024)
    GROUP = max_triangle_group(budgets, min(32, N_GENOMES))
    tri_tiles = []   # (pair ref ids, pair query ids, genome stack)
    rect_tiles = []  # (ridx, qidx, ref stack, query stack)
    starts = list(range(0, N_GENOMES, GROUP))
    for a in starts:
        gidx = np.arange(a, min(a + GROUP, N_GENOMES))
        tr, tq = triu_pairs(len(gidx))
        tri_tiles.append((gidx[tr], gidx[tq],
                          take_sketch(batch, jnp.asarray(gidx)),
                          round_up(len(tr) * app, 8192)))
    rect_total = round_up(BLOCK * BLOCK * app, 8192)
    for a in starts:
        for b in starts:
            if b <= a:
                continue
            for bi in range(a, min(a + GROUP, N_GENOMES), BLOCK):
                for bj in range(b, min(b + GROUP, N_GENOMES), BLOCK):
                    ridx = np.arange(bi, min(bi + BLOCK, N_GENOMES))
                    qidx = np.arange(bj, min(bj + BLOCK, N_GENOMES))
                    rpad = np.concatenate(
                        [ridx, np.full(BLOCK - len(ridx), ridx[0])])
                    qpad = np.concatenate(
                        [qidx, np.full(BLOCK - len(qidx), qidx[0])])
                    rect_tiles.append((ridx, qidx,
                                       take_sketch(batch, jnp.asarray(rpad)),
                                       take_sketch(batch, jnp.asarray(qpad))))

    def run():
        # dispatch every tile asynchronously; fetch results once at the
        # end so host->device dispatch overlaps device compute
        outs = [(pr, pq,
                 chain_triangle(g, cfg=cfg, budgets=budgets,
                                total_anchors=ta)["ani_mean"], True)
                for pr, pq, g, ta in tri_tiles]
        outs += [(ridx, qidx,
                  chain_block(r, q, cfg=cfg, budgets=budgets,
                              total_anchors=rect_total)["ani_mean"], False)
                 for ridx, qidx, r, q in rect_tiles]
        ani = np.zeros((N_GENOMES, N_GENOMES), np.float32)
        for pr, pq, tile_ani, is_tri in outs:
            if is_tri:
                ani[pr, pq] = np.asarray(tile_ani)
            else:
                ani[np.ix_(pr, pq)] = \
                    np.asarray(tile_ani)[:len(pr), :len(pq)]
        return {"ani_mean": ani[ri, qi]}

    t0 = time.time()
    out = run()  # compile + first run
    t_first = time.time() - t0

    t0 = time.time()
    reps = 3
    for _ in range(reps):
        out = run()
    t_steady = (time.time() - t0) / reps
    pairs_per_s = n_pairs / t_steady

    mean_ani = float(np.mean(np.asarray(out["ani_mean"])))
    sys.stderr.write(
        f"device={dev} genomes={N_GENOMES}x{GENOME_LEN/1e6:.1f}Mbp "
        f"pairs={n_pairs} first={t_first:.1f}s steady={t_steady:.2f}s "
        f"sketch={sketch_mbps:.1f}Mbp/s sketch_all={t_sketch_all:.1f}s "
        f"mean_ani={mean_ani:.4f}\n")

    print(json.dumps({
        "metric": "genome-pairs/s per chip (all-vs-all ANI, 32x2.3Mbp)",
        "value": round(pairs_per_s, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_s / SINGLE_CORE_SKANI_PAIRS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
