"""Probe: which dropped chains, if kept, move the metrics toward golden?

Lists chains failing the score filter with >= 2 anchors, their fragment
coverage and interval spans; then evaluates the metric deltas from
keeping each one individually.
"""

import os
import sys
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyskani_tpu.oracle.chain import (ChainConfig, chain_seeds, chain_dp,
                                      get_anchors, assign_fragments,
                                      _UnionFind, _seg_min, _seg_max)
from golden_sweep import sketches, GOLD

r, q = sketches()
cfg = ChainConfig()

anchors = get_anchors(r, q, cfg)
fl = cfg.fragment_length
frag_all, n_frags = assign_fragments(anchors["qcid"], anchors["qpos"],
                                     q.contig_lengths, fl)
inner = (anchors["qpos"], anchors["qcid"], anchors["rpos"], anchors["rcid"])
order = np.lexsort(inner + (frag_all,))
qpos = anchors["qpos"][order]
rpos = anchors["rpos"][order]
qcid = anchors["qcid"][order]
rcid = anchors["rcid"][order]
rev = anchors["reverse"][order]
frag = frag_all[order]
n = len(qpos)

uf = _UnionFind(n)
scores = np.zeros(n)
bounds = np.concatenate([[0], np.nonzero(np.diff(frag))[0] + 1, [n]])
for b in range(len(bounds) - 1):
    s, e = bounds[b], bounds[b + 1]
    sc, par = chain_dp(qpos[s:e], rpos[s:e], rcid[s:e], qcid[s:e],
                       rev[s:e], cfg)
    scores[s:e] = sc
    for i in range(e - s):
        if par[i] >= 0:
            uf.union(s + par[i], s + i)

roots = np.array([uf.find(i) for i in range(n)])
uniq, chain_id = np.unique(roots, return_inverse=True)
nc = len(uniq)
c_anchors = np.bincount(chain_id, minlength=nc)
c_score = _seg_max(scores, chain_id, nc)
c_qmin = _seg_min(qpos, chain_id, nc)
c_qmax = _seg_max(qpos, chain_id, nc)
c_rmin = _seg_min(rpos, chain_id, nc)
c_rmax = _seg_max(rpos, chain_id, nc)

keep = c_score >= cfg.min_chain_score
print(f"total chains {nc}, kept {keep.sum()}, "
      f"dropped>=2anch {((~keep) & (c_anchors >= 2)).sum()}, "
      f"dropped>=3anch {((~keep) & (c_anchors >= 3)).sum()}")

# how large are dropped multi-anchor chains?
drop_idx = np.nonzero(~keep & (c_anchors >= 2))[0]
spans = c_qmax[drop_idx] - c_qmin[drop_idx]
big = drop_idx[np.argsort(-spans)][:15]
for ci in big:
    print(f"chain {ci}: anchors={c_anchors[ci]} score={c_score[ci]:.1f} "
          f"qspan=[{c_qmin[ci]},{c_qmax[ci]}]({c_qmax[ci]-c_qmin[ci]}) "
          f"rspan=[{c_rmin[ci]},{c_rmax[ci]}]({c_rmax[ci]-c_rmin[ci]}) "
          f"frag={c_qmin[ci] // fl}-{c_qmax[ci] // fl}")

# fragment ANI distribution of the current config
res = chain_seeds(r, q, cfg)
fa = np.sort(res.fragment_anis)
print("\nlowest fragment ANIs:", np.round(fa[:10], 4))
print(f"mean={fa.mean():.6f} (gold {GOLD['mean']}), n={len(fa)}")
need = GOLD["mean"] * (len(fa) + 1) - fa.sum()
print(f"one extra fragment at ANI {need:.4f} would hit the golden mean")
need2 = GOLD["mean"] * (len(fa) + 2) - fa.sum()
print(f"two extra fragments averaging {need2 / 2:.4f} would hit it")
# or changing existing fragments down:
print(f"or lowering existing fragments by total {fa.sum() - GOLD['mean'] * len(fa):.4f}")
