"""Stage-by-stage timing of chain_block on the bench workload (real TPU).

Each prefix of the pipeline is jitted separately; the delta between
consecutive rows is the cost of the added stage.
"""

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
timed("block_join", lambda r, q: C._block_join(r, q, cfg, TOTAL),
      refs, qrys)

# stage 2..n: prefixes of chain_block, via monkeypatchable cut points
fl = cfg.fragment_length
NF = budgets.max_fragments
G_r = G_q = BLOCK
P = G_r * G_q
CC = qrys.contig_lengths.shape[1]


def pre_grid(refs, queries):
    q_starts, q_frag_offs = jax.vmap(
        lambda q: C._contig_layout(q, fl))(queries)
    a = C._block_join(refs, queries, cfg, TOTAL)
    cid_safe = jnp.clip(a["qcid"], 0, CC - 1)
    flat_idx = a["qi"] * (CC + 1) + cid_safe
    frag = q_frag_offs.reshape(-1)[flat_idx] + a["qpos"] // fl
    gq = q_starts.reshape(-1)[flat_idx] + a["qpos"]
    valid = a["valid"] & (frag < NF)
    rowid = a["pair"] * NF + frag
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
