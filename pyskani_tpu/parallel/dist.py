"""Multi-chip / multi-host distribution of the ANI engine.

The reference is strictly single-process (SURVEY.md §2.3: no distributed
code of any kind).  This layer introduces the TPU-native scaling story:

* a 2-D device mesh ``("db", "batch")`` — the reference-database sketch
  store is sharded over ``db`` (the tensor-parallel analog: each chip owns
  a slice of the database) and query genomes are sharded over ``batch``
  (data parallelism);
* ``shard_map`` steps compute local [R_shard, Q_shard] result blocks;
  collective reductions (``psum`` over the mesh) produce global hit
  statistics, and shortlist bitmaps ride ICI via ``all_gather`` when a
  globally consistent shortlist is needed;
* multi-host pods initialise via ``jax.distributed.initialize`` and place
  each host's database shard with ``device_put``; the on-disk consolidated
  store is the restart checkpoint (deterministic resharding on reload).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map as _shard_map

    def shard_map(f, **kw):  # new API: check_rep renamed to check_vma
        kw.pop("check_rep", None)
        return _shard_map(f, check_vma=False, **kw)
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..oracle.chain import ChainConfig
from ..ops.chain import EngineBudgets, chain_block, chain_pair, chain_pairs
from ..ops.screen import _shared_count
from ..ops.sketch import DeviceSketch
from ..params import MIN_MARKERS_RESCUE
from .mesh import make_mesh  # re-export


def shard_leading(mesh: Mesh, tree, axis: str):
    """Place a stacked pytree with its leading axis sharded over ``axis``."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def _take(batch: DeviceSketch, idx) -> DeviceSketch:
    return jax.tree.map(lambda x: jax.lax.dynamic_index_in_dim(
        x, idx, axis=0, keepdims=False), batch)


def make_sharded_search(mesh: Mesh, cfg: ChainConfig, budgets: EngineBudgets,
                        screen_val: float = 0.8, marker_k: int = 21,
                        rescue_small: bool = True, chunk: int = 4):
    """Build the jitted multi-chip many-to-many search step.

    Arguments at call time:
      refs    — stacked DeviceSketch [R, ...], leading axis sharded "db"
      queries — stacked DeviceSketch [Q, ...], leading axis sharded "batch"

    Returns a dict of [R, Q] result arrays (sharded over both axes) plus
    mesh-global scalars reduced with psum over ICI.
    """

    def local_block(refs: DeviceSketch, queries: DeviceSketch):
        Rl = refs.kmers.shape[0]
        Ql = queries.kmers.shape[0]

        # --- phase 1: marker screen, all local pairs at once ---
        def screen_one(qi, ri):
            q = _take(queries, qi)
            r = _take(refs, ri)
            shared = _shared_count(q.markers_hi, q.markers_lo, q.n_markers,
                                   r.markers_hi, r.markers_lo, r.n_markers)
            ratio = shared.astype(jnp.float32) / \
                jnp.maximum(q.n_markers.astype(jnp.float32), 1.0)
            est = ratio ** (1.0 / marker_k)
            ok = est > screen_val
            if rescue_small:
                ok = ok | (r.n_markers < MIN_MARKERS_RESCUE)
            return ok
        rr, qq = jnp.meshgrid(jnp.arange(Rl), jnp.arange(Ql), indexing="ij")
        passes = jax.vmap(screen_one)(qq.reshape(-1), rr.reshape(-1))
        passes = passes.reshape(Rl, Ql)

        # --- phase 2: all local pairs via block joins (one sort + one
        # DP per ref-chunk x all local queries) ---
        def _gather(batch, idx):
            return jax.tree.map(lambda x: jnp.take(x, idx, axis=0), batch)

        # ref-chunk size bounded so pairs*max_fragments fits the packed
        # sort key budget (chain_block requires P*NF <= 2^17)
        cr = max(1, min(Rl, (1 << 17) // (budgets.max_fragments * Ql)))
        rpad = (-Rl) % cr
        ridx = jnp.arange(Rl + rpad, dtype=jnp.int32) % Rl

        def one_chunk(idx_chunk):
            r = _gather(refs, idx_chunk)
            return chain_block(r, queries, cfg=cfg, budgets=budgets)

        out = jax.lax.map(one_chunk, ridx.reshape(-1, cr))
        out = jax.tree.map(
            lambda x: x.reshape((-1, Ql) + x.shape[3:])[:Rl], out)
        out["screen_pass"] = passes
        # zero out results screened away (parity with the reference's
        # shortlist: unscreened pairs are never chained, lib.rs:639-657)
        for key in ("ani_mean", "ani_robust", "ani_median",
                    "af_query", "af_ref"):
            out[key] = jnp.where(passes, out[key], 0.0)

        # --- collectives: global statistics ride ICI ---
        local_hits = jnp.sum((out["ani_mean"] > 0.1) & passes,
                             dtype=jnp.int32)
        out["total_hits"] = jax.lax.psum(
            jax.lax.psum(local_hits, "db"), "batch")[None]
        return out

    step = shard_map(
        local_block, mesh=mesh,
        in_specs=(P("db"), P("batch")),
        out_specs={
            "ani_mean": P("db", "batch"), "ani_robust": P("db", "batch"),
            "ani_median": P("db", "batch"), "af_query": P("db", "batch"),
            "af_ref": P("db", "batch"), "n_anchors": P("db", "batch"),
            "n_chains": P("db", "batch"),
            "anchors_overflow": P("db", "batch"),
            "n_fragments": P("db", "batch"),
            "screen_pass": P("db", "batch"),
            "total_hits": P(),
        },
        check_rep=False,
    )
    return jax.jit(step)


def initialize_multihost(coordinator: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Initialise JAX distributed runtime for a multi-host pod slice.

    On Cloud TPU pods the arguments are auto-detected; pass them
    explicitly for manual rendezvous.  After this, ``jax.devices()``
    spans the whole slice and meshes built by ``make_mesh`` place the
    ``db`` axis across hosts (DCN) and ``batch`` within hosts (ICI)
    according to the device order.
    """
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
