"""NumPy oracle for anchor chaining and ANI/AF estimation.

Re-implements the behaviour behind ``skani::chain::chain_seeds`` as invoked
by the reference at /root/reference/src/pyskani/_skani/lib.rs:646-653 for a
single (reference, query) sketch pair:

1. anchors    — shared FracMinHash seeds between the two sketches
2. chunking   — query contigs partitioned into fixed-length fragments;
                each fragment yields one ANI estimate
3. chain DP   — banded sparse chaining with diagonal-drift gap scoring;
                union-find groups anchors into chains
4. intervals  — per-chain query/reference intervals, filtered for quality
                and reference-overlap consistency
5. estimate   — per-fragment ANI = (anchors-in-chains / seeds-in-fragment)
                ^ (1/k); aggregated with mean / 10-90% trimmed mean
                (robust) / median; aligned fraction from interval unions

The skani crate is not vendored in the reference ([RECON] throughout); the
uncertain details are exposed on ``ChainConfig`` and are pinned by the
golden values in /root/reference/src/pyskani/tests/test_ani.py.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from .seeding import Sketch


@dataclasses.dataclass(frozen=True)
class ChainConfig:
    """All reconstruction dials for the chaining pipeline. [RECON]"""

    fragment_length: int = 20_000
    max_gap_length: int = 300
    chain_band: int = 25
    anchor_score: float = 50.0
    gap_cost_scale: float = 0.1          # score -= gap * scale
    min_anchors_chain: int = 3           # chains smaller than this dropped
    min_anchors_interval: int = 3        # intervals smaller than this dropped
    max_seed_multiplicity: int = 10_000  # k-mers with more occurrences skipped
    interval_extend: int = 0             # extend chain intervals by this many bp
    sort_by: str = "ref"                 # anchor sort order within a fragment
    ani_cap: bool = True                 # cap per-fragment ratio at 1.0
    weighted_mean: bool = False          # weight fragment ANIs by seed count
    nonoverlap_on_ref: bool = True       # greedy consistency filter on ref
    nonoverlap_frac: float = 0.5         # max allowed overlap fraction
    denom_mode: str = "fragment"         # "fragment" | "covered"
    numer_mode: str = "anchors"          # "anchors" | "distinct"
    min_frag_anchors: int = 1            # fragments with fewer anchors excluded


@dataclasses.dataclass
class AniEstResult:
    """Mirror of skani::types::AniEstResult fields used by the reference
    (hit.rs:78-104)."""

    ani: float = 0.0
    align_fraction_query: float = 0.0
    align_fraction_ref: float = 0.0
    query_file: str = ""
    ref_file: str = ""
    # diagnostics (not part of the reference surface)
    num_anchors: int = 0
    num_chains: int = 0
    fragment_anis: Optional[np.ndarray] = None


def get_anchors(ref: Sketch, query: Sketch, cfg: ChainConfig):
    """Sort-merge join of the two seed tables -> anchor arrays.

    Returns dict of arrays: qpos, rpos, qcid, rcid, reverse (bool).
    """
    qk, rk = query.kmers, ref.kmers
    # unique runs in each sorted table
    qu, qstart, qcount = np.unique(qk, return_index=True, return_counts=True)
    ru, rstart, rcount = np.unique(rk, return_index=True, return_counts=True)
    common, qi, ri = np.intersect1d(qu, ru, assume_unique=True, return_indices=True)
    qs, qc = qstart[qi], qcount[qi]
    rs, rc = rstart[ri], rcount[ri]
    mult_ok = (qc <= cfg.max_seed_multiplicity) & (rc <= cfg.max_seed_multiplicity)
    qs, qc, rs, rc = qs[mult_ok], qc[mult_ok], rs[mult_ok], rc[mult_ok]

    rep = (qc * rc).astype(np.int64)
    total = int(rep.sum())
    if total == 0:
        return None
    kidx = np.repeat(np.arange(len(rep)), rep)
    offs = np.concatenate([[0], np.cumsum(rep)[:-1]])
    j = np.arange(total, dtype=np.int64) - np.repeat(offs, rep)
    rc_k = rc[kidx]
    q_idx = qs[kidx] + j // rc_k
    r_idx = rs[kidx] + j % rc_k
    return {
        "qpos": query.positions[q_idx].astype(np.int64),
        "rpos": ref.positions[r_idx].astype(np.int64),
        "qcid": query.contig_ids[q_idx].astype(np.int64),
        "rcid": ref.contig_ids[r_idx].astype(np.int64),
        "reverse": query.strands[q_idx] != ref.strands[r_idx],
    }


def _fragment_offsets(contig_lengths: List[int], fl: int) -> np.ndarray:
    """Global fragment-index offset for each contig."""
    counts = [max(1, -(-length // fl)) for length in contig_lengths]
    return np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)


def assign_fragments(qcid: np.ndarray, qpos: np.ndarray,
                     contig_lengths: List[int], fl: int) -> Tuple[np.ndarray, int]:
    offs = _fragment_offsets(contig_lengths, fl)
    frag = offs[qcid] + qpos // fl
    return frag, int(offs[-1])


class _UnionFind:
    __slots__ = ("parent",)

    def __init__(self, n: int):
        self.parent = np.arange(n, dtype=np.int64)

    def find(self, x: int) -> int:
        p = self.parent
        root = x
        while p[root] != root:
            root = p[root]
        while p[x] != root:
            p[x], x = root, p[x]
        return root

    def union(self, a: int, b: int):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def chain_fragment(qpos, rpos, rcid, qcid, reverse, cfg: ChainConfig, dp_out=None):
    """Banded chain DP over the anchors of one query fragment.

    Anchors must already be sorted (by cfg.sort_by order).  Returns
    (scores, parent) where parent[i] is the chained predecessor or -1.
    """
    n = len(qpos)
    scores = np.full(n, cfg.anchor_score)
    parent = np.full(n, -1, dtype=np.int64)
    band = cfg.chain_band
    for i in range(1, n):
        best = cfg.anchor_score
        bestj = -1
        lo = i - band if i > band else 0
        for j in range(i - 1, lo - 1, -1):
            if rcid[j] != rcid[i] or qcid[j] != qcid[i] or reverse[j] != reverse[i]:
                continue
            if cfg.sort_by == "ref":
                dr = rpos[i] - rpos[j]
                dq = qpos[i] - qpos[j] if not reverse[i] else qpos[j] - qpos[i]
            else:
                dq_raw = qpos[i] - qpos[j]
                dq = dq_raw
                dr = rpos[i] - rpos[j] if not reverse[i] else rpos[j] - rpos[i]
            if dr <= 0 or dq <= 0:
                continue
            gap = abs(dr - dq)
            if gap >= cfg.max_gap_length:
                continue
            cand = scores[j] + cfg.anchor_score - gap * cfg.gap_cost_scale
            if cand > best:
                best = cand
                bestj = j
        scores[i] = best
        parent[i] = bestj
    return scores, parent


def chain_seeds(ref: Sketch, query: Sketch, cfg: ChainConfig,
                robust: bool = False, median: bool = False) -> AniEstResult:
    """Full pair pipeline: anchors -> chains -> intervals -> ANI/AF."""
    res = AniEstResult(query_file=query.name, ref_file=ref.name)
    anchors = get_anchors(ref, query, cfg)
    if anchors is None:
        return res

    fl = cfg.fragment_length
    frag, n_frags = assign_fragments(anchors["qcid"], anchors["qpos"],
                                     query.contig_lengths, fl)
    # seeds per fragment (denominator): all query seed occurrences
    qfrag, _ = assign_fragments(query.contig_ids.astype(np.int64),
                                query.positions.astype(np.int64),
                                query.contig_lengths, fl)
    seeds_in_frag = np.bincount(qfrag, minlength=n_frags)

    # sort anchors: fragment-major, then skani Anchor ordering within
    if cfg.sort_by == "ref":
        order = np.lexsort((anchors["qpos"], anchors["qcid"],
                            anchors["rpos"], anchors["rcid"], frag))
    else:
        order = np.lexsort((anchors["rpos"], anchors["rcid"],
                            anchors["qpos"], anchors["qcid"], frag))
    qpos = anchors["qpos"][order]
    rpos = anchors["rpos"][order]
    qcid = anchors["qcid"][order]
    rcid = anchors["rcid"][order]
    rev = anchors["reverse"][order]
    frag = frag[order]

    n = len(qpos)
    res.num_anchors = n
    uf = _UnionFind(n)
    scores = np.zeros(n)
    frag_bounds = np.concatenate([[0], np.nonzero(np.diff(frag))[0] + 1, [n]])
    for b in range(len(frag_bounds) - 1):
        s, e = frag_bounds[b], frag_bounds[b + 1]
        sc, par = chain_fragment(qpos[s:e], rpos[s:e], rcid[s:e], qcid[s:e],
                                 rev[s:e], cfg)
        scores[s:e] = sc
        for i in range(e - s):
            if par[i] >= 0:
                uf.union(s + par[i], s + i)

    roots = np.array([uf.find(i) for i in range(n)], dtype=np.int64)
    # per-chain aggregates
    uniq_roots, chain_id = np.unique(roots, return_inverse=True)
    n_chains = len(uniq_roots)
    res.num_chains = n_chains
    c_anchors = np.bincount(chain_id, minlength=n_chains)
    c_qmin = _seg_min(qpos, chain_id, n_chains)
    c_qmax = _seg_max(qpos, chain_id, n_chains)
    c_rmin = _seg_min(rpos, chain_id, n_chains)
    c_rmax = _seg_max(rpos, chain_id, n_chains)
    c_score = _seg_max(scores, chain_id, n_chains)
    # chain members all share a fragment; take any member's fragment
    first_member = np.zeros(n_chains, dtype=np.int64)
    first_member[chain_id[::-1]] = np.arange(n - 1, -1, -1)
    c_frag = frag[first_member]
    c_qcid = qcid[first_member]
    c_rcid = rcid[first_member]

    good = c_anchors >= cfg.min_anchors_chain
    # consistency filter: greedily keep highest-score chains whose reference
    # interval does not substantially overlap an already-kept chain
    keep = good.copy()
    if cfg.nonoverlap_on_ref:
        idx_sorted = np.argsort(-c_score[good])
        good_idx = np.nonzero(good)[0][idx_sorted]
        kept: dict[int, list] = {}
        for ci in good_idx:
            ivs = kept.setdefault(int(c_rcid[ci]), [])
            lo, hi = c_rmin[ci], c_rmax[ci]
            length = max(1, hi - lo)
            ov = 0
            for (klo, khi) in ivs:
                ov = max(ov, min(hi, khi) - max(lo, klo))
            if ov > cfg.nonoverlap_frac * length:
                keep[ci] = False
            else:
                ivs.append((lo, hi))
    kept_chains = np.nonzero(keep)[0]
    if len(kept_chains) == 0:
        return res

    # ---- ANI per fragment ----
    k = float(query.k)
    kept_mask_anchor = keep[chain_id]
    if cfg.numer_mode == "distinct":
        # count distinct (qcid, qpos) among kept-chain anchors, per fragment
        sel = np.nonzero(kept_mask_anchor)[0]
        key = (qcid[sel] << 40) | qpos[sel].astype(np.int64)
        _, first_idx = np.unique(key, return_index=True)
        anchors_in_frag = np.bincount(frag[sel[first_idx]], minlength=n_frags)
    else:
        anchors_in_frag = np.zeros(n_frags, dtype=np.int64)
        np.add.at(anchors_in_frag, c_frag[kept_chains], c_anchors[kept_chains])

    if cfg.denom_mode == "covered":
        denom = _covered_seeds_per_fragment(
            kept_chains, c_frag, c_qcid, c_qmin, c_qmax, query, n_frags, fl)
    else:
        denom = seeds_in_frag
    covered = anchors_in_frag >= max(1, cfg.min_frag_anchors)
    ratio = anchors_in_frag[covered] / np.maximum(denom[covered], 1)
    if cfg.ani_cap:
        ratio = np.minimum(ratio, 1.0)
    frag_ani = ratio ** (1.0 / k)
    res.fragment_anis = frag_ani
    weights = denom[covered].astype(np.float64)

    if median:
        res.ani = float(np.median(frag_ani))
    elif robust:
        lo, hi = np.quantile(frag_ani, [0.1, 0.9])
        sel = (frag_ani >= lo) & (frag_ani <= hi)
        res.ani = float(frag_ani[sel].mean()) if sel.any() else float(frag_ani.mean())
    elif cfg.weighted_mean:
        res.ani = float((frag_ani * weights).sum() / weights.sum())
    else:
        res.ani = float(frag_ani.mean())

    # ---- aligned fractions ----
    ext = cfg.interval_extend
    q_iv = [(int(c_qcid[ci]), int(c_qmin[ci]), int(c_qmax[ci]) + ext)
            for ci in kept_chains]
    r_iv = [(int(c_rcid[ci]), int(c_rmin[ci]), int(c_rmax[ci]) + ext)
            for ci in kept_chains]
    res.align_fraction_query = _covered_fraction(q_iv, query.contig_lengths,
                                                 query.total_sequence_length)
    res.align_fraction_ref = _covered_fraction(r_iv, ref.contig_lengths,
                                               ref.total_sequence_length)
    return res


def _covered_seeds_per_fragment(kept_chains, c_frag, c_qcid, c_qmin, c_qmax,
                                query: Sketch, n_frags: int, fl: int):
    """Per fragment: number of query seeds inside the union of kept-chain
    query intervals clipped to the fragment."""
    from collections import defaultdict
    ivs_by_frag: dict[int, list] = defaultdict(list)
    offs = _fragment_offsets(query.contig_lengths, fl)
    for ci in kept_chains:
        f = int(c_frag[ci])
        cid = int(c_qcid[ci])
        base = (f - offs[cid]) * fl
        lo = max(int(c_qmin[ci]), base)
        hi = min(int(c_qmax[ci]), base + fl - 1)
        if hi >= lo:
            ivs_by_frag[f].append((cid, lo, hi))
    # sorted query seed positions per contig
    order = np.lexsort((query.positions, query.contig_ids))
    cid_sorted = query.contig_ids[order]
    pos_sorted = query.positions[order].astype(np.int64)
    contig_starts = np.searchsorted(cid_sorted, np.arange(len(query.contig_lengths) + 1))
    denom = np.zeros(n_frags, dtype=np.int64)
    for f, ivs in ivs_by_frag.items():
        ivs.sort(key=lambda t: (t[0], t[1]))
        merged = []
        for cid, lo, hi in ivs:
            if merged and merged[-1][0] == cid and lo <= merged[-1][2] + 1:
                merged[-1][2] = max(merged[-1][2], hi)
            else:
                merged.append([cid, lo, hi])
        count = 0
        for cid, lo, hi in merged:
            s, e = contig_starts[cid], contig_starts[cid + 1]
            count += np.searchsorted(pos_sorted[s:e], hi, side="right") - \
                     np.searchsorted(pos_sorted[s:e], lo, side="left")
        denom[f] = count
    return denom


def _seg_min(vals, seg, n):
    out = np.full(n, np.iinfo(np.int64).max if vals.dtype.kind == "i" else np.inf)
    np.minimum.at(out, seg, vals)
    return out


def _seg_max(vals, seg, n):
    out = np.full(n, np.iinfo(np.int64).min if vals.dtype.kind == "i" else -np.inf)
    np.maximum.at(out, seg, vals)
    return out


def _covered_fraction(intervals, contig_lengths, total_len) -> float:
    """Union length of (contig, lo, hi) intervals divided by total length."""
    if not intervals or total_len == 0:
        return 0.0
    by_contig: dict[int, list] = {}
    for cid, lo, hi in intervals:
        by_contig.setdefault(cid, []).append((lo, hi))
    covered = 0
    for cid, ivs in by_contig.items():
        ivs.sort()
        cur_lo, cur_hi = ivs[0]
        clen = contig_lengths[cid]
        for lo, hi in ivs[1:]:
            if lo > cur_hi:
                covered += min(cur_hi, clen - 1) - cur_lo + 1
                cur_lo, cur_hi = lo, hi
            else:
                cur_hi = max(cur_hi, hi)
        covered += min(cur_hi, clen - 1) - cur_lo + 1
    return covered / total_len
