"""Test: (a) pooled/weighted mean variants; (b) ref-interval extension on
both sides; (c) merged-interval counts."""

import os
import sys
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyskani_tpu.oracle import chain as oc
from golden_sweep import sketches, GOLD

r, q = sketches()
cfg = oc.ChainConfig()
res = oc.chain_seeds(r, q, cfg)
fa = res.fragment_anis
w = res.fragment_weights
ratio = np.minimum(fa ** 15.0, 1.0)
numer = ratio * w

print(f"plain mean      {fa.mean():.6f}  diff {fa.mean() - GOLD['mean']:+.6f}")
wm = (fa * w).sum() / w.sum()
print(f"weighted mean   {wm:.6f}  diff {wm - GOLD['mean']:+.6f}")
pooled = (numer.sum() / w.sum()) ** (1 / 15.0)
print(f"pooled ratio    {pooled:.6f}  diff {pooled - GOLD['mean']:+.6f}")
gm = np.exp(np.log(fa).mean())
print(f"geometric mean  {gm:.6f}  diff {gm - GOLD['mean']:+.6f}")
# mean of ratios then root
mr = fa ** 15.0
mrr = np.minimum(mr, 1.0).mean() ** (1 / 15.0)
print(f"mean-ratio root {mrr:.6f}  diff {mrr - GOLD['mean']:+.6f}")
# uncapped ratio variants
res_nc = oc.chain_seeds(r, q, dataclasses.replace(cfg, ani_cap=False))
fa_nc = res_nc.fragment_anis
print(f"uncapped mean   {fa_nc.mean():.6f}  diff {fa_nc.mean() - GOLD['mean']:+.6f}")

# --- AF: ref interval extension variants ---
# reproduce the kept-chain intervals from chain_seeds internals
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
c_rmin = oc._seg_min(rpos, chain_id, nc)
c_rmax = oc._seg_max(rpos, chain_id, nc)
first_member = np.zeros(nc, dtype=np.int64)
first_member[chain_id[::-1]] = np.arange(n - 1, -1, -1)
c_qcid = qcid[first_member]
c_rcid = rcid[first_member]
keep = (c_anchors >= cfg.min_anchors_chain) & (c_score >= cfg.min_chain_score)
kept = np.nonzero(keep)[0]


def af(iv, lens, total):
    return oc._covered_fraction(iv, lens, total)


for tag, el, er in (("[min, max+14] (current)", 0, 14),
                    ("[min-14, max+14]", 14, 14),
                    ("[min-14, max]", 14, 0)):
    r_iv = [(int(c_rcid[ci]), int(c_rmin[ci]) - el, int(c_rmax[ci]) + er)
            for ci in kept]
    q_iv = [(int(c_qcid[ci]), int(c_qmin[ci]) - el, int(c_qmax[ci]) + er)
            for ci in kept]
    afr = af(r_iv, r.contig_lengths, r.total_sequence_length)
    afq = af(q_iv, q.contig_lengths, q.total_sequence_length)
    print(f"{tag:28} af_q {afq:.6f} ({afq - GOLD['af_q']:+.6f})  "
          f"af_r {afr:.6f} ({afr - GOLD['af_r']:+.6f})")

# merged interval counts
def merged_count(iv):
    by = {}
    for cid, lo, hi in iv:
        by.setdefault(cid, []).append((lo, hi))
    cnt = 0
    for ivs in by.values():
        ivs.sort()
        cur = None
        for lo, hi in ivs:
            if cur is None or lo > cur[1]:
                cnt += 1
                cur = [lo, hi]
            else:
                cur[1] = max(cur[1], hi)
    return cnt

r_iv0 = [(int(c_rcid[ci]), int(c_rmin[ci]), int(c_rmax[ci]) + 14)
         for ci in kept]
q_iv0 = [(int(c_qcid[ci]), int(c_qmin[ci]), int(c_qmax[ci]) + 14)
         for ci in kept]
print(f"kept chains {len(kept)}, merged ref intervals {merged_count(r_iv0)}, "
      f"merged query intervals {merged_count(q_iv0)}")
print(f"af_r deficit bp = {(GOLD['af_r'] - res.align_fraction_ref) * r.total_sequence_length:.0f}")
print(f"af_q slack bp   = {(GOLD['af_q'] - res.align_fraction_query) * q.total_sequence_length:.0f}")
