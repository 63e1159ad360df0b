"""Marginal af_q/af_r contribution of each dropped 2-anchor chain, and
subset feasibility for the golden AF window."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyskani_tpu.oracle import chain as oc
from golden_sweep import sketches, GOLD

r, q = sketches()
cfg = oc.ChainConfig()

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
c_rev = rev[first_member]
keep = (c_anchors >= cfg.min_anchors_chain) & (c_score >= cfg.min_chain_score)
kept = np.nonzero(keep)[0]


def union_len(iv):
    by = {}
    for cid, lo, hi in iv:
        by.setdefault(cid, []).append((lo, hi))
    total = 0
    for cid, ivs in by.items():
        ivs.sort()
        cur_lo, cur_hi = ivs[0]
        for lo, hi in ivs[1:]:
            if lo > cur_hi:
                total += cur_hi - cur_lo + 1
                cur_lo, cur_hi = lo, hi
            else:
                cur_hi = max(cur_hi, hi)
        total += cur_hi - cur_lo + 1
    return total


def ivs_of(cis):
    qiv = [(int(c_qcid[ci]), int(c_qmin[ci]), int(c_qmax[ci]) + 14)
           for ci in cis]
    riv = [(int(c_rcid[ci]), int(c_rmin[ci]), int(c_rmax[ci]) + 14)
           for ci in cis]
    return qiv, riv


qiv0, riv0 = ivs_of(kept)
uq0, ur0 = union_len(qiv0), union_len(riv0)
need_r_lo = (GOLD["af_r"] - 0.00005) * r.total_sequence_length - ur0
need_r_hi = (GOLD["af_r"] + 0.00005) * r.total_sequence_length - ur0
slack_q = (GOLD["af_q"] + 0.00005) * q.total_sequence_length - uq0
print(f"ref union {ur0}, need +[{need_r_lo:.0f}, {need_r_hi:.0f}] bp; "
      f"query union {uq0}, slack +{slack_q:.0f} bp")

drop = np.nonzero(~keep & (c_anchors >= 2))[0]
rows = []
for ci in drop:
    qiv, riv = ivs_of(np.concatenate([kept, [ci]]))
    dq = union_len(qiv) - uq0
    dr = union_len(riv) - ur0
    rows.append((ci, c_anchors[ci], c_score[ci], dq, dr, bool(c_rev[ci])))
rows.sort(key=lambda t: -t[4])
print(f"{'chain':>6} {'anch':>4} {'score':>6} {'d_afq_bp':>9} "
      f"{'d_afr_bp':>9} rev")
for ci, na, sc, dq, dr, rv in rows:
    if dr > 0 or dq > 0:
        print(f"{ci:>6} {na:>4} {sc:>6.1f} {dq:>9} {dr:>9} {rv}")
