"""Fragment-level anatomy: numer/denom per covered fragment, uncovered
fragments, and what the golden mean implies for them."""

import os
import sys
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyskani_tpu.oracle import chain as oc
from golden_sweep import sketches, GOLD

r, q = sketches()
cfg = oc.ChainConfig(keep_long_span=2500)

# reproduce chain_seeds internals up to the fragment table
anchors = oc.get_anchors(r, q, cfg)
fl = cfg.fragment_length
frag_all, n_frags = oc.assign_fragments(anchors["qcid"], anchors["qpos"],
                                        q.contig_lengths, fl)
inner = (anchors["qpos"], anchors["qcid"], anchors["rpos"], anchors["rcid"])
order = np.lexsort(inner + (frag_all,))
qpos, rpos = anchors["qpos"][order], anchors["rpos"][order]
qcid, rcid = anchors["qcid"][order], anchors["rcid"][order]
rev = anchors["reverse"][order]
frag = frag_all[order]
n = len(qpos)
uf = oc._UnionFind(n)
scores = np.zeros(n)
bounds = np.concatenate([[0], np.nonzero(np.diff(frag))[0] + 1, [n]])
for b in range(len(bounds) - 1):
    s, e = bounds[b], bounds[b + 1]
    sc, par = oc.chain_dp(qpos[s:e], rpos[s:e], rcid[s:e], qcid[s:e],
                          rev[s:e], cfg)
    scores[s:e] = sc
    for i in range(e - s):
        if par[i] >= 0:
            uf.union(s + par[i], s + i)
roots = np.array([uf.find(i) for i in range(n)])
uniq, chain_id = np.unique(roots, return_inverse=True)
nc = len(uniq)
c_anchors = np.bincount(chain_id, minlength=nc)
c_score = oc._seg_max(scores, chain_id, nc)
c_qmin = oc._seg_min(qpos, chain_id, nc)
c_qmax = oc._seg_max(qpos, chain_id, nc)
keep = (c_anchors >= cfg.min_anchors_chain) & (c_score >= cfg.min_chain_score)
keep |= (c_anchors >= 2) & ((c_qmax - c_qmin) >= cfg.keep_long_span)

kept_mask_anchor = keep[chain_id]
numer = np.bincount(frag[kept_mask_anchor], minlength=n_frags)

# span denominator (mirror of chain_seeds)
first_member = np.zeros(nc, dtype=np.int64)
first_member[chain_id[::-1]] = np.arange(n - 1, -1, -1)
c_qcid = qcid[first_member]
kept_chains = np.nonzero(keep)[0]
ext_l, ext_r = cfg.extend_left, cfg.extend_right
denom_ok = oc._denominator_seed_mask(q, r, cfg)
fview = dataclasses.replace(
    q, positions=q.positions[denom_ok], contig_ids=q.contig_ids[denom_ok],
    kmers=q.kmers[denom_ok], strands=q.strands[denom_ok])
f_iv = [(int(c_qcid[ci]), int(c_qmin[ci]) - ext_l, int(c_qmax[ci]) + ext_r)
        for ci in kept_chains]
f_iv = oc._span_per_fragment(f_iv, q, n_frags, fl)
denom = oc._covered_seeds_per_fragment(f_iv, fview, n_frags, fl)

covered = numer >= 1
fa = np.minimum(numer[covered] / np.maximum(denom[covered], 1), 1.0) ** (1 / 15)
idx_cov = np.nonzero(covered)[0]
o = np.argsort(fa)
print("lowest 12 fragments:")
for j in o[:12]:
    f = idx_cov[j]
    print(f"  frag {f:3d} [{f*fl},{(f+1)*fl}) numer={numer[f]:4d} "
          f"denom={denom[f]:4d} ani={fa[j]:.4f}")
print("highest 6:")
for j in o[-6:]:
    f = idx_cov[j]
    print(f"  frag {f:3d} numer={numer[f]:4d} denom={denom[f]:4d} "
          f"ani={fa[j]:.4f} ratio={numer[f]/max(denom[f],1):.4f}")
unc = np.nonzero(~covered)[0]
print(f"uncovered fragments: {list(unc)} (of {n_frags})")
for f in unc:
    print(f"  frag {f}: denom(span)={denom[f]}, seeds_in_frag="
          f"{((fview.positions // fl + oc._fragment_offsets(q.contig_lengths, fl)[fview.contig_ids]) == f).sum()}")
print(f"mean={fa.mean():.6f} diff={fa.mean() - GOLD['mean']:+.6f} n={len(fa)}")
s = np.sort(fa)
q10, q90 = np.quantile(fa, [0.1, 0.9])
print(f"trim window [q10={q10:.5f}, q90={q90:.5f}], below-q10 count="
      f"{(fa < q10).sum()}, above-q90={(fa > q90).sum()}")
print(f"capped fragments (ratio>1): {(numer[covered] > denom[covered]).sum()}")
print(f"ratio==1 exactly: {(numer[covered] == denom[covered]).sum()}")
