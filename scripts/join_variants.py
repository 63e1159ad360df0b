"""Micro-benchmark: anchor-join strategies on the current backend.

The two seed tables arrive SORTED by kmer, so the join can be:
  A) tagged concat + 2-op sort + run arithmetic   (current)
  B) two searchsorted calls (binary search, log2(Sr) gathers)
plus the shared prefix-inversion (scatter+cummax) and payload gathers.
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

B = 8
LEN = 2_300_000
params = SketchParams()
genomes = make_genomes(B + 1, LEN)
sketches = sketch_genomes_device(
    [(f"g{i}", [g]) for i, g in enumerate(genomes)], params)
batch = stack_sketches(sketches)
refs = take_sketch(batch, jnp.arange(1, B + 1))
qrys = take_sketch(batch, jnp.zeros(B, jnp.int32))
cfg = ChainConfig()
budgets = C.EngineBudgets(
    max_anchors=round_up(batch.kmers.shape[1] * 3 // 2 + 4096, 8192),
    max_fragments=128, max_anchors_per_fragment=512)


def timed(label, fn, *args, reps=10):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{label:52s} {dt*1000:9.2f} ms  ({dt*1000/B:6.2f} ms/pair)")
    return out


# ---- A: current join ----
vjoin = jax.vmap(lambda r, q: C._join_anchors(r, q, cfg, budgets))
timed("A: sort-merge join (current)", lambda r, q: vjoin(r, q), refs, qrys)


# ---- components of A ----
def just_sort(r, q):
    Sq, Sr = q.kmers.shape[-1], r.kmers.shape[-1]
    kmer = jnp.concatenate([r.kmers, q.kmers], axis=-1)
    packed = jnp.broadcast_to(
        jnp.concatenate([jnp.arange(Sr, dtype=jnp.int32),
                         jnp.arange(Sq, dtype=jnp.int32) | (1 << 30)]),
        kmer.shape)
    return jax.vmap(lambda k, p: jax.lax.sort((k, p), num_keys=2))(kmer, packed)


timed("A1: the 2-op concat sort alone", just_sort, refs, qrys)


# ---- B: searchsorted join ----
def join_ss(ref, query, method):
    Sq = query.seed_budget
    Sr = ref.seed_budget
    left = jnp.searchsorted(ref.kmers, query.kmers, side="left",
                            method=method).astype(jnp.int32)
    right = jnp.searchsorted(ref.kmers, query.kmers, side="right",
                             method=method).astype(jnp.int32)
    rc = right - left
    is_sent = query.kmers == jnp.uint32(0xFFFFFFFF)
    ok = (~is_sent) & (query.own_mult <= cfg.max_seed_multiplicity) & \
        (rc > 0) & (rc <= cfg.max_seed_multiplicity)
    counts = jnp.where(ok, rc, 0)
    offs = jnp.cumsum(counts) - counts
    total = jnp.minimum(offs[-1] + counts[-1], budgets.max_anchors)
    A = budgets.max_anchors
    t = jnp.arange(A, dtype=jnp.int32)
    slot0 = jnp.where(ok, offs, A)
    src_map = jnp.zeros(A + 1, jnp.int32).at[slot0].max(
        jnp.arange(Sq, dtype=jnp.int32))
    src = jax.lax.cummax(src_map[:A])
    j = t - offs[src]
    a_valid = t < total
    r_idx = jnp.minimum(left[src] + j, Sr - 1)
    return dict(
        qpos=jnp.where(a_valid, query.positions[src], C.I32_SENTINEL),
        qcid=jnp.where(a_valid, query.contig_ids[src], C.I32_SENTINEL),
        rpos=jnp.where(a_valid, ref.positions[r_idx], C.I32_SENTINEL),
        rcid=jnp.where(a_valid, ref.contig_ids[r_idx], C.I32_SENTINEL),
        rev=query.strands[src] != ref.strands[r_idx],
        valid=a_valid,
        n_anchors=total,
    )


for method in ("scan", "scan_unrolled", "sort"):
    try:
        vj = jax.vmap(functools.partial(join_ss, method=method))
        timed(f"B: searchsorted join ({method})",
              lambda r, q, vj=vj: vj(r, q), refs, qrys)
    except Exception as e:  # noqa
        print(f"B ({method}) failed: {e}")


# sanity: same anchors?
a = jax.jit(vjoin)(refs, qrys)
b = jax.jit(jax.vmap(functools.partial(join_ss, method="scan")))(refs, qrys)
na, nb = np.asarray(a["n_anchors"]), np.asarray(b["n_anchors"])
print("n_anchors A:", na)
print("n_anchors B:", nb)
qa = np.asarray(a["qpos"])
qb = np.asarray(b["qpos"])
ra = np.asarray(a["rpos"])
rb = np.asarray(b["rpos"])
same = all(
    np.array_equal(np.sort(qa[i][:na[i]] * (2**31) + ra[i][:na[i]]),
                   np.sort(qb[i][:nb[i]] * (2**31) + rb[i][:nb[i]]))
    for i in range(B)) and np.array_equal(na, nb)
print("anchor sets equal:", same)
