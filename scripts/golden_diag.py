"""Diagnostic: exact engine + oracle values on the golden E. coli pair.

Prints the current mean/robust/median ANI and AFs at full precision next
to the reference golden values, for fitting the remaining [RECON] dials
(VERDICT r2 next-steps #2/#3).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gzip

import numpy as np

from pyskani_tpu.io.fasta import parse

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests", "data")

GOLD = dict(mean=0.9946, robust=0.9977, median=0.9995,
            af_query=0.9189, af_ref=0.9246, learned=0.9939)


def main():
    ec590 = next(iter(parse(os.path.join(DATA, "e.coli-EC590.fasta.gz")))).seq
    k12 = next(iter(parse(os.path.join(DATA, "e.coli-K12.fasta.gz")))).seq

    import pyskani_tpu

    db = pyskani_tpu.Database()
    db.sketch("EC590", ec590)
    hits = db.query("K12", k12, learned_ani=False)
    h = hits[0]
    print("=== engine (device path) ===")
    print(f"mean     {h.identity:.6f}  gold {GOLD['mean']}  "
          f"diff {h.identity - GOLD['mean']:+.6f}")
    print(f"af_query {h.query_fraction:.6f}  gold {GOLD['af_query']}  "
          f"diff {h.query_fraction - GOLD['af_query']:+.6f}")
    print(f"af_ref   {h.reference_fraction:.6f}  gold {GOLD['af_ref']}  "
          f"diff {h.reference_fraction - GOLD['af_ref']:+.6f}")
    hr = db.query("K12", k12, robust=True, learned_ani=False)[0]
    print(f"robust   {hr.identity:.6f}  gold {GOLD['robust']}  "
          f"diff {hr.identity - GOLD['robust']:+.6f}")
    hm = db.query("K12", k12, median=True)[0]
    print(f"median   {hm.identity:.6f}  gold {GOLD['median']}  "
          f"diff {hm.identity - GOLD['median']:+.6f}")
    hl = db.query("K12", k12, learned_ani=True)[0]
    print(f"learned  {hl.identity:.6f}  gold {GOLD['learned']}  "
          f"diff {hl.identity - GOLD['learned']:+.6f}")

    # oracle path
    from pyskani_tpu.oracle.seeding import sketch_sequences
    from pyskani_tpu.oracle.chain import ChainConfig, chain_seeds

    cfg = ChainConfig()
    r = sketch_sequences("EC590", [ec590], c=125, k=15, marker_c=1000)
    q = sketch_sequences("K12", [k12], c=125, k=15, marker_c=1000)
    res = chain_seeds(r, q, cfg)
    print("=== oracle (numpy) ===")
    print(f"mean     {res.ani:.6f}  diff {res.ani - GOLD['mean']:+.6f}")
    print(f"af_query {res.align_fraction_query:.6f}  diff "
          f"{res.align_fraction_query - GOLD['af_query']:+.6f}")
    print(f"af_ref   {res.align_fraction_ref:.6f}  diff "
          f"{res.align_fraction_ref - GOLD['af_ref']:+.6f}")
    rr = chain_seeds(r, q, cfg, robust=True)
    rm = chain_seeds(r, q, cfg, median=True)
    print(f"robust   {rr.ani:.6f}  diff {rr.ani - GOLD['robust']:+.6f}")
    print(f"median   {rm.ani:.6f}  diff {rm.ani - GOLD['median']:+.6f}")
    print(f"n_anchors={res.num_anchors} n_chains={res.num_chains} "
          f"n_frag_est={len(res.fragment_anis)}")


if __name__ == "__main__":
    main()
