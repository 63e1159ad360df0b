"""Stage cuts of the r2 chain_block (post chain-end compaction).

Cut points: pre-DP grids, +DP, +chain sort & scan1, +scan2 row
aggregates, +compaction scatter, full.  Deltas between rows = stage cost.
"""
# NOTE (r3): written against the r2 grid format (separate qpos/rpos/meta
# planes). The engine now packs two uint32 planes (ops/chain.py w1/w2);
# internal cut points here no longer match the current code.


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
NF = budgets.max_fragments
G_r = G_q = BLOCK
P = G_r * G_q
fl = cfg.fragment_length
print(f"S={S} NF={NF} PF={PF} BLOCK={BLOCK} total_anchors={TOTAL/1e6:.2f}M",
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
    print(f"{label:40s} {dt*1000:9.1f} ms", flush=True)
    return out


def build_grids(refs, queries):
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
    CC = queries.contig_lengths.shape[1]
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
    meta = (qcid_s.astype(jnp.int32) << 17) | (rcid_s.astype(jnp.int32) << 3) \
        | (rev_s.astype(jnp.int32) << 1) | ok.astype(jnp.int32)
    meta = jnp.where(ok, meta, 0)
    flat = jnp.where(ok, rowid_s * (PF + 1) + rank,
                     (P * NF + 1) * (PF + 1) - 1)
    pay = jnp.stack([
        jnp.where(ok, qpos_s, C.I32_SENTINEL),
        jnp.where(ok, rpos_s, C.I32_SENTINEL),
        meta], axis=1)
    fills = jnp.broadcast_to(
        jnp.array([C.I32_SENTINEL, C.I32_SENTINEL, 0], jnp.int32),
        ((P * NF + 1) * (PF + 1), 3))
    g = fills.at[flat].set(pay)
    g = g.reshape(P * NF + 1, PF + 1, 3)[:P * NF, :PF]
    return {"qpos": g[:, :, 0], "rpos": g[:, :, 1], "meta": g[:, :, 2]}


timed("pre-DP grids", build_grids, refs, qrys)


def with_dp(refs, queries):
    merged = build_grids(refs, queries)
    return C._dp_dispatch(merged, cfg, budgets)


timed("+ DP", with_dp, refs, qrys)


def with_scan1(refs, queries):
    merged = build_grids(refs, queries)
    scores, roots = C._dp_dispatch(merged, cfg, budgets)
    R = P * NF
    meta = merged["meta"].reshape(-1)
    valid = (meta & 1) == 1
    rows = jnp.broadcast_to(
        jnp.arange(R, dtype=jnp.int32)[:, None], (R, PF)).reshape(-1)
    rootc = jnp.clip(roots.reshape(-1), 0, PF - 1)
    key = rows * (PF + 1) + jnp.where(valid, rootc, PF)
    key_s, qpos_s, rpos_s, score_s, meta_s = jax.lax.sort(
        (key, merged["qpos"].reshape(-1), merged["rpos"].reshape(-1),
         scores.reshape(-1), meta), num_keys=1)
    n2 = key_s.shape[0]
    first = jnp.concatenate([jnp.ones(1, bool), key_s[1:] != key_s[:-1]])
    scan = C._seg_scan_stats(first, dict(
        cnt=jnp.ones(n2, jnp.int32), qmn=qpos_s, qmx=qpos_s,
        rmn=rpos_s, rmx=rpos_s, smx=score_s))
    return scan["cnt"], scan["smx"], key_s, meta_s


timed("+ chain sort + scan1", with_scan1, refs, qrys)


def with_scan2(refs, queries):
    cnt, smx, key_s, meta_s = with_scan1(refs, queries)
    is_last = jnp.concatenate([key_s[1:] != key_s[:-1], jnp.ones(1, bool)])
    chain_end = is_last & (key_s % (PF + 1) != PF)
    keep = chain_end & (cnt >= cfg.min_anchors_chain)
    if cfg.min_chain_score > 0:
        keep &= smx >= cfg.min_chain_score
    row_of = key_s // (PF + 1)
    row_first = jnp.concatenate([jnp.ones(1, bool),
                                 row_of[1:] != row_of[:-1]])
    scan2 = C._seg_scan_stats(row_first, dict(
        sum=jnp.where(keep, cnt, 0),
        lo=jnp.where(keep, 0, C.POS_BIG),
        hi=jnp.where(keep, 1, C.NEG_BIG)))
    return scan2["sum"], keep


timed("+ scan2 row aggregates", with_scan2, refs, qrys)

full = timed("chain_block (full)",
             lambda r, q: C.chain_block(r, q, cfg=cfg, budgets=budgets,
                                        total_anchors=TOTAL),
             refs, qrys)
