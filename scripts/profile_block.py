"""Stage-by-stage timing of chain_block on the bench workload (real TPU).

Each prefix of the pipeline is jitted separately; the delta between
consecutive rows is the cost of the added stage.
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

BLOCK = int(os.environ.get("PROF_BLOCK", "8"))
PF = int(os.environ.get("PROF_PF", "256"))
LEN = 2_300_000

params = SketchParams()
genomes = make_genomes(BLOCK * 2, LEN)
sketches = sketch_genomes_device(
    [(f"g{i}", [g]) for i, g in enumerate(genomes)], params)
jax.block_until_ready(sketches[-1].device.kmers)

cfg = ChainConfig()
batch = stack_sketches(sketches)
S = batch.kmers.shape[1]
nf = round_up(max(s.n_fragments(cfg.fragment_length) for s in sketches) + 2,
              64)
budgets = C.EngineBudgets(max_anchors=round_up(S * 3 // 2 + 4096, 8192),
                          max_fragments=nf, max_anchors_per_fragment=PF)
app = round_up(S * 3 // 4, 1024)
TOTAL = round_up(BLOCK * BLOCK * app, 8192)
refs = take_sketch(batch, jnp.arange(BLOCK))
qrys = take_sketch(batch, jnp.arange(BLOCK, 2 * BLOCK))
print(f"S={S} NF={nf} PF={PF} BLOCK={BLOCK} total_anchors={TOTAL/1e6:.2f}M",
      flush=True)


def timed(label, fn, *args, reps=5):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{label:34s} {dt*1000:9.1f} ms", flush=True)
    return out


# stage 1: the tagged join (one big sort + expansion)
def join_only(r, q):
    q_starts, q_frag_offs = jax.vmap(
        lambda qq: C._contig_layout(qq, cfg.fragment_length))(q)
    return C._block_join(r, q, cfg, TOTAL, q_starts, q_frag_offs,
                         budgets.max_fragments)
timed("block_join", join_only, refs, qrys)

# stage 2..n: prefixes of chain_block, via monkeypatchable cut points
fl = cfg.fragment_length
NF = budgets.max_fragments
G_r = G_q = BLOCK
P = G_r * G_q
CC = qrys.contig_lengths.shape[1]


def pre_grid(refs, queries):
    q_starts, q_frag_offs = jax.vmap(
        lambda q: C._contig_layout(q, fl))(queries)
    a = C._block_join(refs, queries, cfg, TOTAL, q_starts, q_frag_offs, NF)
    valid = a["valid"]
    gq = a["gq"]
    rowid = a["rowid"]
    k1 = jnp.where(valid, (rowid << 14) | a["rcid"], C.POS_BIG)
    k2 = jnp.where(valid, a["rpos"], C.POS_BIG)
    payload = jnp.where(
        valid,
        (gq.astype(jnp.uint32) << 2) | (a["rev"].astype(jnp.uint32) << 1)
        | jnp.uint32(1),
        jnp.uint32(0xFFFFFFFC))
    return jax.lax.sort((k1, k2, payload), num_keys=3)


timed("+ anchor 3-key sort", pre_grid, refs, qrys)

full = timed("chain_block (full)",
             lambda r, q: C.chain_block(r, q, cfg=cfg, budgets=budgets,
                                        total_anchors=TOTAL),
             refs, qrys)


# DP alone on the merged grid shape
qpos = jnp.zeros((P * NF, PF), jnp.int32)
rpos = jnp.zeros((P * NF, PF), jnp.int32)
meta = jnp.zeros((P * NF, PF), jnp.int32)
timed("dp_dispatch alone (zero grid)",
      lambda a, b, c2: C._dp_dispatch(dict(qpos=a, rpos=b, meta=c2),
                                      cfg, budgets),
      qpos, rpos, meta)


# finer cuts: full pre-DP (grids built), and grids+DP without post stats
def pre_dp_full(refs, queries):
    q_starts, q_frag_offs = jax.vmap(
        lambda q: C._contig_layout(q, fl))(queries)
    a = C._block_join(refs, queries, cfg, TOTAL, q_starts, q_frag_offs, NF)
    valid = a["valid"]
    gq = a["gq"]
    rowid = a["rowid"]
    k1 = jnp.where(valid, (rowid << 14) | a["rcid"], C.POS_BIG)
    k2 = jnp.where(valid, a["rpos"], C.POS_BIG)
    payload = jnp.where(
        valid,
        (gq.astype(jnp.uint32) << 2) | (a["rev"].astype(jnp.uint32) << 1)
        | jnp.uint32(1),
        jnp.uint32(0xFFFFFFFC))
    k1, k2, payload = jax.lax.sort((k1, k2, payload), num_keys=3)
    valid_s = (payload & 1) == 1
    rev_s = (payload & 2) == 2
    gq_s = (payload >> 2).astype(jnp.int32)
    rowid_s = jnp.where(valid_s, k1 >> 14, C.I32_SENTINEL)
    rcid_s = k1 & 0x3FFF
    rpos_s = k2
    pair_s = jnp.clip(rowid_s // NF, 0, P - 1)
    frag_s = rowid_s - pair_s * NF
    qi_s = pair_s % G_q
    frag_ids = jnp.arange(NF, dtype=jnp.int32)
    frag_cid_tab = jnp.clip(
        (jax.vmap(lambda fo: jnp.searchsorted(fo, frag_ids, side="right"))(
            q_frag_offs) - 1).astype(jnp.int32), 0, CC - 1)
    qcid_s = frag_cid_tab.reshape(-1)[
        qi_s * NF + jnp.clip(frag_s, 0, NF - 1)]
    qpos_s = gq_s - q_starts.reshape(-1)[qi_s * (CC + 1) + qcid_s]
    A2 = rowid_s.shape[0]
    ii = jnp.arange(A2, dtype=jnp.int32)
    row_first = jnp.concatenate([jnp.ones(1, bool),
                                 rowid_s[1:] != rowid_s[:-1]])
    rank = ii - jax.lax.cummax(jnp.where(row_first, ii, 0))
    ok = valid_s & (rowid_s < P * NF) & (rank < PF)
    row = jnp.where(ok, rowid_s, P * NF)
    col = jnp.where(ok, rank, PF)

    def grid_of(vals, fill):
        g = jnp.full((P * NF + 1, PF + 1), fill, vals.dtype)
        g = g.at[row, col].set(jnp.where(ok, vals, fill))
        return g[:P * NF, :PF]

    meta = (qcid_s.astype(jnp.int32) << 17) | (rcid_s.astype(jnp.int32) << 3) \
        | (rev_s.astype(jnp.int32) << 1) | ok.astype(jnp.int32)
    meta = jnp.where(ok, meta, 0)
    return {
        "qpos": grid_of(qpos_s, C.I32_SENTINEL),
        "rpos": grid_of(rpos_s, C.I32_SENTINEL),
        "meta": grid_of(meta, 0),
    }


timed("pre-DP complete (grids built)", pre_dp_full, refs, qrys)


def with_dp(refs, queries):
    merged = pre_dp_full(refs, queries)
    return C._dp_dispatch(merged, cfg, budgets)


timed("pre-DP + DP (no post stats)", with_dp, refs, qrys)


def stats_only(refs, queries):
    q_starts, q_frag_offs = jax.vmap(
        lambda q: C._contig_layout(q, fl))(queries)
    merged = pre_dp_full(refs, queries)
    scores, roots = C._dp_dispatch(merged, cfg, budgets)
    PF2 = budgets.max_anchors_per_fragment
    R = P * NF
    meta = merged["meta"].reshape(-1)
    valid = (meta & 1) == 1
    rows = jnp.broadcast_to(
        jnp.arange(R, dtype=jnp.int32)[:, None], (R, PF2)).reshape(-1)
    rootc = jnp.clip(roots.reshape(-1), 0, PF2 - 1)
    key = rows * (PF2 + 1) + jnp.where(valid, rootc, PF2)
    key_s, qpos_s, rpos_s, score_s, meta_s = jax.lax.sort(
        (key, merged["qpos"].reshape(-1), merged["rpos"].reshape(-1),
         scores.reshape(-1), meta), num_keys=1)
    n2 = key_s.shape[0]
    first = jnp.concatenate([jnp.ones(1, bool), key_s[1:] != key_s[:-1]])
    scan = C._seg_scan_stats(first, dict(
        cnt=jnp.ones(n2, jnp.int32), qmn=qpos_s, qmx=qpos_s,
        rmn=rpos_s, rmx=rpos_s, smx=score_s))
    return scan["cnt"], scan["smx"], key_s


timed("pre+DP+chain sort+scan1 (no tail)", stats_only, refs, qrys)
