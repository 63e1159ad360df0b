"""Profile the device sketch phase on the real TPU (VERDICT r4 #3).

Times (axon-relay safe: device_get of a tiny slice per rep, queue
drained before each timed region — see memory notes):
  1. tunnel health (512x512 matmul round trip)
  2. full sketch_stack (8 x 2.3 Mbp, device-generated genomes)
  3. windows+hash only (no compaction)
  4. lax.top_k compaction alone at genome size
  5. sort-based compaction alternative at genome size
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyskani_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from pyskani_tpu.params import SketchParams
from pyskani_tpu.ops.sketch import (marker_budget_for, round_up,
                                    seed_budget_for, sketch_kernel)
from pyskani_tpu.ops import u64

LEN = 2_300_000
B = 8
params = SketchParams()
L = max(round_up(LEN, 1 << 20), 1 << 20)
SB = seed_budget_for(LEN, params.c)
MB = marker_budget_for(LEN, params.marker_c)

dev = jax.devices()[0]
print("device:", dev, file=sys.stderr)


def timed(fn, *args, reps=3, label=""):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[:1])  # drain+compile
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[:1])
        ts.append(time.time() - t0)
    print(f"{label}: {min(ts)*1e3:.1f} ms (min of {reps})", file=sys.stderr)
    return min(ts)


# 1. tunnel health
x = jnp.ones((512, 512), jnp.float32)
t = timed(jax.jit(lambda a: a @ a), x, label="tunnel health matmul")
if t > 1.0:
    print("TUNNEL SICK — numbers below unreliable", file=sys.stderr)

# shared genome generation
@jax.jit
def gen(stack_key):
    base = jax.random.randint(jax.random.PRNGKey(0), (LEN,), 0, 4,
                              dtype=jnp.uint8)

    def mut(k):
        ki, kv = jax.random.split(k)
        idx = jax.random.randint(ki, (LEN // 100,), 0, LEN)
        vals = jax.random.randint(kv, (LEN // 100,), 0, 4, dtype=jnp.uint8)
        return base.at[idx].set(vals)

    codes = jax.vmap(mut)(jax.random.split(stack_key, B))
    codes = jnp.pad(codes, ((0, 0), (0, L - LEN)))
    q = codes.reshape(B, L // 4, 4)
    return (q[..., 0] | (q[..., 1] << 2) | (q[..., 2] << 4) |
            (q[..., 3] << 6)).astype(jnp.uint8)


packed = gen(jax.random.PRNGKey(1))
jax.device_get(packed[:1, :1])
timed(gen, jax.random.PRNGKey(1), label=f"genome gen {B}x{LEN/1e6:.1f}Mbp")

MC = 8
starts = np.zeros(MC + 1, np.int32)
starts[1:] = LEN
starts_d = jnp.asarray(np.broadcast_to(starts, (B, MC + 1)).copy())
ncon = jnp.ones(B, jnp.int32)

kern = functools.partial(sketch_kernel, k=15, marker_k=21, c=params.c,
                         marker_c=params.marker_c, seed_budget=SB,
                         marker_budget=MB)
full = jax.jit(lambda p: jax.vmap(kern)(p, starts_d, ncon))
t_full = timed(full, packed, label=f"full sketch_kernel {B}x stack")
print(f"  -> {B*LEN/t_full/1e6:.1f} Mbp/s", file=sys.stderr)


# 3. windows+hash only (stop before compaction)
@jax.jit
def winhash(packed_codes):
    def one(pc):
        Lb = pc.shape[0] * 4
        codes = ((pc[:, None] >> (jnp.arange(4, dtype=jnp.uint8) * 2)[None, :])
                 & jnp.uint8(3)).reshape(Lb)
        from pyskani_tpu.ops.sketch import _rolling_windows, _canonical_u64
        fwd, rev, mfwd, mrev = _rolling_windows(codes)
        strand = fwd < rev
        canon = jnp.where(strand, fwd, rev)
        h = u64.mm_hash64(u64.from_u32(canon))
        mcanon = _canonical_u64(mfwd, mrev)
        mh = u64.mm_hash64(mcanon)
        thr = u64.from_int((2**64 - 1) // params.c)
        mthr = u64.from_int((2**64 - 1) // params.marker_c)
        return (jnp.sum(u64.lt(h, thr)), jnp.sum(u64.lt(mh, mthr)))
    return jax.vmap(one)(packed_codes)


timed(winhash, packed, label="windows+hash+threshold only")


# 4. top_k compaction alone (the current _compact core)
@jax.jit
def topk_only(packed_codes):
    def one(pc):
        Lb = pc.shape[0] * 4
        codes = ((pc[:, None] >> (jnp.arange(4, dtype=jnp.uint8) * 2)[None, :])
                 & jnp.uint8(3)).reshape(Lb)
        mask = codes < 1  # ~1/4 density (denser than real, upper bound)
        i = jnp.arange(Lb, dtype=jnp.int32)
        floor = jnp.int32(-(2**31 - 2))
        key = jnp.where(mask, -i, floor)
        topv, _ = jax.lax.top_k(key, SB)
        return topv[:4]
    return jax.vmap(one)(packed_codes)


timed(topk_only, packed, label=f"top_k(L={L}, k={SB}) x{B}")


# 5. sort-based compaction alternative
@jax.jit
def sort_compact(packed_codes):
    def one(pc):
        Lb = pc.shape[0] * 4
        codes = ((pc[:, None] >> (jnp.arange(4, dtype=jnp.uint8) * 2)[None, :])
                 & jnp.uint8(3)).reshape(Lb)
        mask = codes < 1
        i = jnp.arange(Lb, dtype=jnp.int32)
        key = jnp.where(mask, i, jnp.int32(2**31 - 1))
        p1 = codes.astype(jnp.uint32)  # stand-ins for 4 payload words
        p2 = i
        p3 = i
        p4 = mask
        ks, a, b, c_, d = jax.lax.sort((key, p1, p2, p3, p4), num_keys=1)
        return (ks[:4], a[:4], b[:4], c_[:4], d[:4])
    return jax.vmap(one)(packed_codes)


timed(sort_compact, packed, label=f"full sort compaction (5 operands) x{B}")


# 6. blockwise compaction: per-block cumsum + single scatter
@jax.jit
def block_compact(packed_codes):
    def one(pc):
        Lb = pc.shape[0] * 4
        codes = ((pc[:, None] >> (jnp.arange(4, dtype=jnp.uint8) * 2)[None, :])
                 & jnp.uint8(3)).reshape(Lb)
        mask = codes < 1
        blk = 2048
        nb = Lb // blk
        m2 = mask.reshape(nb, blk)
        within = jnp.cumsum(m2, axis=1) - m2
        counts = jnp.sum(m2, axis=1)
        offs = jnp.cumsum(counts) - counts
        slot = jnp.where(m2, offs[:, None] + within, SB).reshape(Lb)
        slot = jnp.minimum(slot, SB)
        out1 = jnp.zeros(SB + 1, jnp.uint32).at[slot].set(
            codes.astype(jnp.uint32))
        out2 = jnp.zeros(SB + 1, jnp.int32).at[slot].set(
            jnp.arange(Lb, dtype=jnp.int32))
        return out1[:4], out2[:4]
    return jax.vmap(one)(packed_codes)


timed(block_compact, packed, label="blockwise cumsum+scatter compaction x{}".format(B))

print("done", file=sys.stderr)
