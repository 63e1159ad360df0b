"""Stage-by-stage timing of the pair pipeline on the current backend."""

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
from pyskani_tpu.ops.sketch import round_up, sketch_genome_device, sketch_kernel
from pyskani_tpu.params import SketchParams

N = 4
LEN = 2_300_000
params = SketchParams()
genomes = make_genomes(N, LEN)


def timed(label, fn, *args, reps=3, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{label:38s} {dt*1000:9.1f} ms")
    return out


# ---- sketching breakdown ----
from pyskani_tpu.oracle.seeding import BYTE_TO_SEQ

t0 = time.time()
arr = np.frombuffer(genomes[0], np.uint8)
codes = BYTE_TO_SEQ[arr]
L = round_up(LEN, 1 << 20)
codes_p = np.zeros(L, np.uint8); codes_p[:LEN] = codes
pos = np.full(L, -1, np.int32); pos[:LEN] = np.arange(LEN, dtype=np.int32)
cid = np.full(L, -1, np.int32); cid[:LEN] = 0
print(f"{'host encode+pad':38s} {(time.time()-t0)*1000:9.1f} ms")

jc = timed("device_put codes", lambda: jax.device_put(codes_p))
jp = jax.device_put(pos); jcid = jax.device_put(cid)
jax.block_until_ready([jp, jcid])

sb = round_up(int(LEN / 125 * 1.25) + 1024, 1024)
mb = round_up(int(LEN / 1000 * 1.35) + 512, 512)
kern = functools.partial(sketch_kernel, k=15, marker_k=21, c=125,
                         marker_c=1000, seed_budget=sb, marker_budget=mb)
timed("sketch_kernel", kern, jc, jp, jcid)

sketches = [sketch_genome_device(f"g{i}", [g], params) for i, g in enumerate(genomes)]
batch = stack_sketches(sketches)
ref = take_sketch(batch, 0)
qry = take_sketch(batch, 1)
cfg = ChainConfig()
nf = round_up(LEN // cfg.fragment_length + 3, 64)
budgets = C.EngineBudgets(max_anchors=round_up(batch.kmers.shape[1]*3//2+4096, 8192),
                          max_fragments=nf, max_anchors_per_fragment=512)
print("budgets:", budgets)

# ---- chain pipeline stages ----
@functools.partial(jax.jit, static_argnames=())
def stage_join(r, q):
    return C._join_anchors(r, q, cfg, budgets)

a = timed("join_anchors", stage_join, ref, qry)

@jax.jit
def stage_sort(r, q):
    a = C._join_anchors(r, q, cfg, budgets)
    _, q_frag_offs = C._contig_layout(q, cfg.fragment_length)
    cid_safe = jnp.clip(a["qcid"], 0, q.contig_lengths.shape[0] - 1)
    frag = jnp.where(a["valid"], q_frag_offs[cid_safe] + a["qpos"] // cfg.fragment_length,
                     C.I32_SENTINEL)
    return jax.lax.sort((frag, a["rcid"], a["rpos"], a["qcid"], a["qpos"],
                         a["rev"], a["valid"]), num_keys=5, is_stable=True)

timed("join+frag+sort", stage_sort, ref, qry)

@jax.jit
def stage_grid(r, q):
    out = stage_sort.__wrapped__(r, q)
    frag_s = out[0]
    A = frag_s.shape[0]
    first = jnp.searchsorted(frag_s, frag_s, side="left")
    rank = jnp.arange(A, dtype=jnp.int32) - first.astype(jnp.int32)
    NF, PF = budgets.max_fragments, budgets.max_anchors_per_fragment
    ok = out[6] & (frag_s < NF) & (rank < PF)
    row = jnp.where(ok, frag_s, NF)
    col = jnp.where(ok, rank, PF)
    g = jnp.full((NF + 1, PF + 1), 0, jnp.int32)
    return g.at[row, col].set(jnp.where(ok, out[4], 0))

timed("... + rank(searchsorted) + 1 scatter", stage_grid, ref, qry)

full = functools.partial(C.chain_pair, cfg=cfg, budgets=budgets)
timed("full chain_pair", full, ref, qry)
