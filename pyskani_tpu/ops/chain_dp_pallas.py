"""Pallas TPU kernel for the banded chain DP.

The XLA ``lax.scan`` formulation (ops/chain.py::_dp_scan) pays per-step
while-loop overhead for hundreds of tiny steps; this kernel runs the same
recurrence as a hardware ``fori_loop`` with the band window resident in
VMEM scratch, processing fragments in vector lanes.

Layout: anchor grids are transposed to [PF, NL] so each DP step reads one
contiguous [NL] row (dynamic indexing on the major axis only).  NL is the
*lane* axis: every fragment column is an independent recurrence, so
callers stack many pairs' fragment rows side by side (see
ops/chain.py::chain_pairs) and the sequential PF walk is paid once per
batch.  The lane axis is blocked with a pallas grid (LANE_BLOCK columns
per program instance) so VMEM usage is bounded regardless of batch size.

The band window is a [band, LANE_BLOCK] ring buffer in VMEM scratch.
Semantics are bit-identical to _dp_scan (tested in
tests/test_device_chain.py and tests/test_parallel.py).

Packed meta layout (must match ops/chain.py): qcid[30:17] rcid[16:3]
rev[1] valid[0] — chain-compatibility of two anchors is equality of
``meta >> 1`` (same query contig, ref contig and orientation) plus both
valid bits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..oracle.chain import ChainConfig

NEG = -1e30
LANE_BLOCK = 512


def _dp_kernel(qpos_ref, rpos_ref, meta_ref, score_out, root_out,
               w_qpos, w_rpos, w_meta, w_score, w_root,
               *, band: int, anchor_score: float, gap_scale: float,
               max_gap: int):
    PF, NL = qpos_ref.shape

    w_qpos[:] = jnp.zeros((band, NL), jnp.int32)
    w_rpos[:] = jnp.zeros((band, NL), jnp.int32)
    w_meta[:] = jnp.zeros((band, NL), jnp.int32)  # valid bit 0 = no match
    w_score[:] = jnp.full((band, NL), NEG, jnp.float32)
    w_root[:] = jnp.zeros((band, NL), jnp.int32)

    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (band, NL), 0)

    def step(t, _):
        cur_q = qpos_ref[t, :]
        cur_r = rpos_ref[t, :]
        cur_m = meta_ref[t, :]
        cur_valid = (cur_m & 1) == 1
        cur_rev = (cur_m & 2) == 2

        wq = w_qpos[:]
        wr = w_rpos[:]
        wm = w_meta[:]
        ws = w_score[:]

        dr = cur_r[None, :] - wr
        dq_f = cur_q[None, :] - wq
        dq = jnp.where(cur_rev[None, :], -dq_f, dq_f)
        same = ((wm >> 1) == (cur_m >> 1)[None, :]) & ((wm & 1) == 1) & \
            cur_valid[None, :]
        gap = jnp.abs(dr - dq)
        ok = same & (dr > 0) & (dq > 0) & (gap < max_gap)
        cand = ws + anchor_score - gap.astype(jnp.float32) * gap_scale
        cand = jnp.where(ok, cand, NEG)
        best = jnp.max(cand, axis=0)
        extend = best > anchor_score

        # tie-break to the most recent predecessor: recency of ring slot s
        # at step t is (t - 1 - s) mod band; among the argmax slots pick
        # the minimum recency.
        recency = jax.lax.rem(t - 1 - slot_iota + 2 * band, band)
        is_best = cand == best[None, :]
        best_rec = jnp.min(jnp.where(is_best, recency, band), axis=0)
        chosen = is_best & (recency == best_rec[None, :])
        root_best = jnp.max(jnp.where(chosen, w_root[:], 0), axis=0)

        score_cur = jnp.where(extend, best, anchor_score).astype(jnp.float32)
        root_cur = jnp.where(extend & cur_valid, root_best, t)

        score_out[t, :] = score_cur
        root_out[t, :] = root_cur

        r = jax.lax.rem(t, band)
        w_qpos[pl.ds(r, 1), :] = cur_q[None, :]
        w_rpos[pl.ds(r, 1), :] = cur_r[None, :]
        w_meta[pl.ds(r, 1), :] = cur_m[None, :]
        w_score[pl.ds(r, 1), :] = score_cur[None, :]
        w_root[pl.ds(r, 1), :] = root_cur[None, :]
        return 0

    jax.lax.fori_loop(0, PF, step, 0)


def dp_pallas(qpos_t, rpos_t, meta_t, cfg: ChainConfig):
    """Run the DP over transposed grids [PF, NL] -> (score, root) [PF, NL].

    ``meta`` packs (qcid, rcid, rev, valid) as in ops/chain.py.  NL may be
    any lane count; it is padded to a LANE_BLOCK multiple and blocked over
    a pallas grid (each program instance owns LANE_BLOCK independent
    fragment columns, double-buffered through VMEM).
    """
    PF, NL = qpos_t.shape
    pad = (-NL) % LANE_BLOCK
    if pad:
        qpos_t = jnp.pad(qpos_t, ((0, 0), (0, pad)))
        rpos_t = jnp.pad(rpos_t, ((0, 0), (0, pad)))
        meta_t = jnp.pad(meta_t, ((0, 0), (0, pad)))  # meta 0 = invalid
    nl_padded = NL + pad
    n_blocks = nl_padded // LANE_BLOCK

    kern = functools.partial(
        _dp_kernel, band=cfg.chain_band, anchor_score=cfg.anchor_score,
        gap_scale=cfg.gap_cost_scale, max_gap=cfg.max_gap_length)
    band = cfg.chain_band
    block = pl.BlockSpec((PF, LANE_BLOCK), lambda i: (0, i))
    score, root = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        out_shape=(jax.ShapeDtypeStruct((PF, nl_padded), jnp.float32),
                   jax.ShapeDtypeStruct((PF, nl_padded), jnp.int32)),
        in_specs=[block] * 3,
        out_specs=(block, block),
        scratch_shapes=[
            pltpu.VMEM((band, LANE_BLOCK), jnp.int32),
            pltpu.VMEM((band, LANE_BLOCK), jnp.int32),
            pltpu.VMEM((band, LANE_BLOCK), jnp.int32),
            pltpu.VMEM((band, LANE_BLOCK), jnp.float32),
            pltpu.VMEM((band, LANE_BLOCK), jnp.int32),
        ],
    )(qpos_t, rpos_t, meta_t)
    if pad:
        score = score[:, :NL]
        root = root[:, :NL]
    return score, root
