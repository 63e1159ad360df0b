"""Exploration harness: run the oracle on the E. coli pair and compare
against the golden values from the reference test suite."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from pyskani_tpu.io.fasta import read_genome
from pyskani_tpu.oracle.seeding import sketch_genome
from pyskani_tpu.oracle.chain import ChainConfig, chain_seeds
from pyskani_tpu.params import SketchParams

GOLDEN = {
    "mean": 0.9946, "robust": 0.9977, "median": 0.9995,
    "af_query": 0.9189, "af_ref": 0.9246,
}


def main(cfg: ChainConfig | None = None, verbose: bool = True):
    t0 = time.time()
    ref_contigs = read_genome("/root/repo/tests/data/e.coli-EC590.fasta.gz")
    query_contigs = read_genome("/root/repo/tests/data/e.coli-K12.fasta.gz")
    params = SketchParams()
    ref = sketch_genome("EC590", ref_contigs, params)
    query = sketch_genome("K12", query_contigs, params)
    t1 = time.time()
    if verbose:
        print(f"sketching: {t1-t0:.2f}s  ref seeds={len(ref)} markers={len(ref.markers)}  "
              f"query seeds={len(query)} markers={len(query.markers)}")
        print(f"ref len={ref.total_sequence_length} query len={query.total_sequence_length}")

    cfg = cfg or ChainConfig()
    out = {}
    r = chain_seeds(ref, query, cfg)
    out["mean"] = r.ani
    out["af_query"] = r.align_fraction_query
    out["af_ref"] = r.align_fraction_ref
    rr = chain_seeds(ref, query, cfg, robust=True)
    out["robust"] = rr.ani
    rm = chain_seeds(ref, query, cfg, median=True)
    out["median"] = rm.ani
    t2 = time.time()
    if verbose:
        print(f"chain: {(t2-t1)/3:.2f}s/pair  anchors={r.num_anchors} chains={r.num_chains} "
              f"fragments with ANI={len(r.fragment_anis) if r.fragment_anis is not None else 0}")
        for k in ("mean", "robust", "median", "af_query", "af_ref"):
            print(f"  {k:10s} {out[k]:.6f}   golden {GOLDEN[k]:.4f}   diff {out[k]-GOLDEN[k]:+.6f}")
        fa = r.fragment_anis
        if fa is not None and len(fa):
            qs = np.quantile(fa, [0, 0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0])
            print("  frag ANI quantiles:", " ".join(f"{q:.4f}" for q in qs))
    return out, r


if __name__ == "__main__":
    main()
