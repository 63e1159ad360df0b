"""Stage-by-stage timing of the BATCHED pair pipeline (chunk of B pairs).

Each stage function is jitted separately and timed cumulatively, so the
difference between consecutive rows is the cost of the added stage.
"""
# NOTE (r3): written against the r2 grid format (separate qpos/rpos/meta
# planes). The engine now packs two uint32 planes (ops/chain.py w1/w2);
# internal cut points here no longer match the current code.


import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from bench import make_genomes
from pyskani_tpu.engine.batch import stack_sketches, take_sketch
from pyskani_tpu.oracle.chain import ChainConfig
from pyskani_tpu.ops import chain as C
from pyskani_tpu.ops.sketch import round_up, sketch_genomes_device
from pyskani_tpu.params import SketchParams

B = int(os.environ.get("PROF_CHUNK", "8"))
LEN = 2_300_000
params = SketchParams()
genomes = make_genomes(B + 1, LEN)

t0 = time.time()
sketches = sketch_genomes_device(
    [(f"g{i}", [g]) for i, g in enumerate(genomes)], params)
jax.block_until_ready(sketches[-1].device.kmers)
print(f"{'sketch_genomes (batched, w/ compile)':44s} "
      f"{(time.time()-t0)*1000:9.1f} ms")

batch = stack_sketches(sketches)
refs = take_sketch(batch, jnp.arange(1, B + 1))
qrys = take_sketch(batch, jnp.zeros(B, jnp.int32))
cfg = ChainConfig()
nf = round_up(LEN // cfg.fragment_length + 3, 64)
budgets = C.EngineBudgets(
    max_anchors=round_up(batch.kmers.shape[1] * 3 // 2 + 4096, 8192),
    max_fragments=nf, max_anchors_per_fragment=512)
print("budgets:", budgets, " B =", B)


def timed(label, fn, *args, reps=5):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{label:44s} {dt*1000:9.1f} ms   "
          f"({dt*1000/B:6.2f} ms/pair)")
    return out


vjoin = jax.vmap(lambda r, q: C._join_anchors(r, q, cfg, budgets))
timed("join_anchors (vmapped)", lambda r, q: vjoin(r, q), refs, qrys)

vpre = jax.vmap(lambda r, q: C._pre_dp(r, q, cfg, budgets))
timed("pre_dp = join + packed sort + grid", lambda r, q: vpre(r, q),
      refs, qrys)


def upto_dp(r, q):
    grids, n_anchors = vpre(r, q)
    Bx, NF, PF = grids["qpos"].shape
    merged = jax.tree.map(lambda x: x.reshape(Bx * NF, PF), grids)
    return C._dp_dispatch(merged, cfg, budgets)


timed("... + merged DP", upto_dp, refs, qrys)


def upto_stats(r, q):
    grids, n_anchors = vpre(r, q)
    Bx, NF, PF = grids["qpos"].shape
    merged = jax.tree.map(lambda x: x.reshape(Bx * NF, PF), grids)
    scores, roots = C._dp_dispatch(merged, cfg, budgets)
    scores = scores.reshape(Bx, NF, PF)
    roots = roots.reshape(Bx, NF, PF)

    def stats_only(ref, query, grid, sc, ro):
        # replicate _post_dp up to (and including) the chain-stat scatters
        NF_, PF_ = sc.shape
        g = C._unpack_meta(grid)
        rows = jnp.broadcast_to(jnp.arange(NF_, jnp.int32)[:, None],
                                (NF_, PF_))
        v = g["valid"]
        rootc = jnp.where(v, ro, PF_)
        c_count = jnp.zeros((NF_, PF_ + 1), jnp.int32).at[rows, rootc].add(
            v.astype(jnp.int32))[:, :PF_]
        c_qmin = jnp.full((NF_, PF_ + 1), C.POS_BIG).at[rows, rootc].min(
            jnp.where(v, g["qpos"], C.POS_BIG))[:, :PF_]
        return c_count.sum() + c_qmin.min()

    return jax.vmap(stats_only)(r, q, grids, scores, roots)


timed("... + 2 of 7 chain-stat scatters", upto_stats, refs, qrys)

full = functools.partial(C.chain_pairs, cfg=cfg, budgets=budgets)
timed("full chain_pairs", lambda r, q: full(r, q), refs, qrys)
