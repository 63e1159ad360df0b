"""End-to-end sharded database search: Database x device mesh.

Scales the pyskani ``Database.query`` semantics across a multi-chip mesh
(BASELINE config 4/5): the reference store is sharded over the ``db``
axis once, query genomes stream through the ``batch`` axis in fixed-size
groups, and each step screens, shortlists and chains only the passing
pairs on-device (parallel.dist.make_sharded_search).  Memory stays
bounded: one ref-stack shard per device plus one query group at a time.

The reference has no distributed layer at all (SURVEY.md §2.3); this is
the TPU-native scaling story for its serial query loop (lib.rs:616-657).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from .. import regression
from ..hit import Hit
from ..engine.batch import stack_sketches, stack_sketches_host
from ..ops.sketch import round_up, sketch_genomes_device
from ..params import SEARCH_ANI_CUTOFF_DEFAULT, MIN_ANI_KEEP
from .dist import make_sharded_search, replicate, shard_leading


class ShardedDatabaseSearch:
    """Reusable sharded searcher over a Database's reference store.

    Build once (places the sharded ref stack on the mesh, compiles the
    step), then call :meth:`query_many` with streams of query genomes.
    """

    def __init__(self, database, mesh: Mesh, *, chunk: int = 4,
                 queries_per_device: int = 1,
                 cutoff: Optional[float] = None,
                 learned_ani: Optional[bool] = None,
                 median: bool = False, robust: bool = False,
                 faster_small: bool = False):
        from ..ops.chain import EngineBudgets
        from ..ops.sketch import round_up as _ru

        self._db = database
        self._mesh = mesh
        self._median = median
        self._robust = robust
        names, stack, bucket, mbucket = database._ref_stack()
        self._names = names
        self._bucket = bucket
        self._mbucket = mbucket
        ndb = mesh.shape["db"]
        self._nbatch = mesh.shape["batch"]
        self._qg = self._nbatch * queries_per_device
        R = len(names)
        pad = (-R) % ndb
        if pad:
            stack = jax.tree.map(
                lambda x: jnp.concatenate(
                    [x] + [x[:1]] * pad), stack)
        self._R = R
        self._refs = shard_leading(mesh, stack, "db")

        fl = database._chain_cfg.fragment_length
        self._fl = fl
        # fragments are per-contig (every contig contributes >= 1)
        nf = _ru(max(sum(max(1, -(-L // fl)) for L in m.contig_lengths)
                     for m in database._markers) + 2, 128)
        self._nf = nf
        self._budgets = EngineBudgets(
            max_anchors=_ru(int(bucket * 1.5) + 4096, 8192),
            max_fragments=nf, max_anchors_per_fragment=256)
        screen_val = cutoff if cutoff is not None \
            else SEARCH_ANI_CUTOFF_DEFAULT
        self._learned = learned_ani if learned_ani is not None else \
            regression.use_learned_ani(database._params.c, False, False,
                                       median)
        self._model = regression.get_model(database._params.c, self._learned)
        self._step = make_sharded_search(
            mesh, database._chain_cfg, self._budgets,
            screen_val=screen_val,
            marker_k=database._params.marker_k,
            rescue_small=not faster_small, chunk=chunk)

    def query_many(self, named_queries: Sequence[Tuple[str, Sequence[bytes]]]
                   ) -> List[List[Hit]]:
        """Hits for each (name, [contig bytes...]) query genome.

        Queries stream through the mesh in groups of
        ``batch_axis * queries_per_device``; each group is sketched with
        the batched kernel, padded to the ref seed bucket, and pushed
        through one sharded step.
        """
        db = self._db
        out_hits: List[List[Hit]] = []
        qg = self._qg
        items = list(named_queries)
        for lo in range(0, len(items), qg):
            group = items[lo:lo + qg]
            n = len(group)
            sk = sketch_genomes_device(group, db._params)
            for s in sk:
                if s.n_fragments(self._fl) + 2 > self._nf:
                    raise ValueError(
                        f"query {s.name!r} has more fragments than the "
                        f"searcher's budget (max_fragments={self._nf}, "
                        f"sized from the reference store); rebuild with "
                        f"a larger budget or shorter queries")
            qstack = stack_sketches_host(
                sk,
                max(self._bucket,
                    max(s.device.seed_budget for s in sk)),
                max(self._mbucket,
                    max(s.device.marker_budget for s in sk)))
            if n < qg:
                # numpy concat: the stack stays host-side until the one
                # sharded device_put below
                qstack = jax.tree.map(
                    lambda x: np.concatenate([x] + [x[:1]] * (qg - n)),
                    qstack)
            qsh = shard_leading(self._mesh, qstack, "batch")
            out = self._step(self._refs, qsh)
            key = "ani_median" if self._median else \
                "ani_robust" if self._robust else "ani_mean"
            ani = np.asarray(out[key])
            afq = np.asarray(out["af_query"])
            afr = np.asarray(out["af_ref"])
            sp = np.asarray(out["screen_pass"])
            maf = 0.15
            for qi, (qname, _) in enumerate(group):
                hits: List[Hit] = []
                for ri in range(self._R):
                    if not sp[ri, qi]:
                        continue
                    a = float(ani[ri, qi])
                    fq, fr = float(afq[ri, qi]), float(afr[ri, qi])
                    if self._model is not None and not self._median \
                            and not self._robust:
                        a = regression.apply_model(self._model, a, fq, fr)
                    if fq < maf and fr < maf:
                        continue
                    if a > MIN_ANI_KEEP:
                        hits.append(Hit(min(max(a, 0.0), 1.0), qname, fq,
                                        self._names[ri], fr))
                out_hits.append(hits)
        return out_hits
