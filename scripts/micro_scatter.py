"""Micro-benchmarks: scatter vs gather formulations on TPU.

1. expansion `src` map: scatter-max + cummax  vs  searchsorted
2. [rows, PF] grid fill: scatter .at[row, col].set  vs  row-start gather
3. block_join sub-stages, to find where its 180 ms goes
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = 622_592          # join stream length (2 * 16 * 19456)
A = 983_040          # total_anchors
ROWS = 8192          # P * NF
PF = 256


def timed(label, fn, *args, reps=10):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{label:46s} {dt*1000:8.2f} ms", flush=True)
    return out


rng = np.random.default_rng(0)

# --- 1. expansion ---
counts_np = rng.poisson(1.5, N).astype(np.int32)
ok_np = counts_np > 0
counts_np = np.where(ok_np, counts_np, 0)
counts = jnp.asarray(counts_np)
ok = jnp.asarray(ok_np)
i32 = jnp.arange(N, dtype=jnp.int32)


def expand_scatter(counts, ok):
    offs = jnp.cumsum(counts) - counts
    slot0 = jnp.where(ok, offs, A)
    src_map = jnp.zeros(A + 1, jnp.int32).at[slot0].max(i32)
    src = jax.lax.cummax(src_map[:A])
    return src


def expand_search(counts, ok):
    offs = jnp.cumsum(counts) - counts
    t = jnp.arange(A, dtype=jnp.int32)
    src = jnp.clip(jnp.searchsorted(offs + counts, t, side="right"),
                   0, N - 1).astype(jnp.int32)
    return src


s1 = timed("expand: scatter-max + cummax", expand_scatter, counts, ok)
s2 = timed("expand: searchsorted", expand_search, counts, ok)
print("   equal:", bool(jnp.all(s1 == s2)), flush=True)

# --- 2. grid fill ---
vals = jnp.asarray(rng.integers(0, 1 << 30, A, dtype=np.int32))
rowid_np = np.sort(rng.integers(0, ROWS, A, dtype=np.int32))
rowid = jnp.asarray(rowid_np)


def grid_scatter(rowid, vals):
    ii = jnp.arange(A, dtype=jnp.int32)
    row_first = jnp.concatenate([jnp.ones(1, bool),
                                 rowid[1:] != rowid[:-1]])
    rank = ii - jax.lax.cummax(jnp.where(row_first, ii, 0))
    okk = rank < PF
    row = jnp.where(okk, rowid, ROWS)
    col = jnp.where(okk, rank, PF)
    g = jnp.full((ROWS + 1, PF + 1), -1, vals.dtype)
    g = g.at[row, col].set(jnp.where(okk, vals, -1))
    return g[:ROWS, :PF]


def grid_gather(rowid, vals):
    rows = jnp.arange(ROWS, dtype=jnp.int32)
    row_start = jnp.searchsorted(rowid, rows, side="left").astype(jnp.int32)
    row_end = jnp.searchsorted(rowid, rows, side="right").astype(jnp.int32)
    col = jnp.arange(PF, dtype=jnp.int32)
    idx = row_start[:, None] + col[None, :]
    okk = idx < row_end[:, None]
    g = jnp.where(okk, vals[jnp.minimum(idx, A - 1)], -1)
    return g


g1 = timed("grid: scatter .at[row,col].set", grid_scatter, rowid, vals)
g2 = timed("grid: searchsorted row starts + gather", grid_gather, rowid, vals)
print("   equal:", bool(jnp.all(g1 == g2)), flush=True)

# --- 3. block_join sub-stages ---
kmer_np = rng.integers(0, 1 << 32, N, dtype=np.uint64).astype(np.uint32)
kmer = jnp.asarray(kmer_np)
packed = jnp.asarray(
    np.concatenate([np.arange(N // 2, dtype=np.int32),
                    np.arange(N // 2, dtype=np.int32) | (1 << 30)]))

timed("join sub: 2-key sort (u32,i32)",
      lambda k, p: jax.lax.sort((k, p), num_keys=2), kmer, packed)


def run_arith(k, p):
    kmer_s, packed_s = jax.lax.sort((k, p), num_keys=2)
    tag_q = packed_s >= (1 << 30)
    i = jnp.arange(N, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones(1, bool), kmer_s[1:] != kmer_s[:-1]])
    run_start = jax.lax.cummax(jnp.where(first, i, 0))
    r_excl = jnp.cumsum((~tag_q).astype(jnp.int32)) - (~tag_q).astype(jnp.int32)
    rc = jnp.where(tag_q, r_excl - r_excl[run_start], 0).astype(jnp.int32)
    return rc


timed("join sub: sort + run arithmetic", run_arith, kmer, packed)


def gathers(src):
    tbl = vals
    a = tbl[jnp.minimum(src, A - 1)]
    b = tbl[jnp.minimum(src + 1, A - 1)]
    c = tbl[jnp.minimum(src + 2, A - 1)]
    d = tbl[jnp.minimum(src + 3, A - 1)]
    e = tbl[jnp.minimum(src + 4, A - 1)]
    return a + b + c + d + e


timed("join sub: 5 gathers of 1M", gathers, s1)
