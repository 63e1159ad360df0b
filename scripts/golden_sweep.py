"""Sweep the remaining [RECON] chain dials against ALL golden values.

Golden bars (reference test_ani.py, 4 d.p.): mean 0.9946, robust 0.9977,
median 0.9995, af_q 0.9189, af_r 0.9246.  A config passes when every
value rounds to the golden at 4 decimals.  Sketches are cached to disk so
each config costs one oracle chain_seeds call.
"""

import os
import pickle
import sys
import dataclasses
import itertools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyskani_tpu.io.fasta import parse
from pyskani_tpu.oracle.seeding import sketch_genome
from pyskani_tpu.oracle.chain import ChainConfig, chain_seeds
from pyskani_tpu.params import SketchParams

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests", "data")
CACHE = "/tmp/golden_sketches.pkl"

GOLD = dict(mean=0.9946, robust=0.9977, median=0.9995,
            af_q=0.9189, af_r=0.9246)


def sketches():
    if os.path.exists(CACHE):
        with open(CACHE, "rb") as f:
            return pickle.load(f)
    params = SketchParams()
    ec590 = next(iter(parse(os.path.join(DATA, "e.coli-EC590.fasta.gz")))).seq
    k12 = next(iter(parse(os.path.join(DATA, "e.coli-K12.fasta.gz")))).seq
    r = sketch_genome("EC590", [ec590], params)
    q = sketch_genome("K12", [k12], params)
    with open(CACHE, "wb") as f:
        pickle.dump((r, q), f)
    return r, q


def evaluate(r, q, cfg):
    res = chain_seeds(r, q, cfg)
    fa = res.fragment_anis
    if fa is None or len(fa) == 0:
        return None
    lo, hi = np.quantile(fa, [0.1, 0.9])
    sel = (fa >= lo) & (fa <= hi)
    return dict(
        mean=float(fa.mean()),
        robust=float(fa[sel].mean()) if sel.any() else float(fa.mean()),
        median=float(np.median(fa)),
        af_q=res.align_fraction_query,
        af_r=res.align_fraction_ref,
        n_chains=res.num_chains,
        n_frag=len(fa),
    )


def score(vals):
    if vals is None:
        return None, False
    diffs = {k: vals[k] - GOLD[k] for k in GOLD}
    ok = all(round(d, 4) == 0 for d in diffs.values())
    return diffs, ok


def main():
    r, q = sketches()
    base = ChainConfig()

    variants = []
    for mcs, mac in itertools.product([105.0, 102.5, 100.0, 55.0, 50.0, 0.0],
                                      [1, 2, 3]):
        variants.append(dict(min_chain_score=mcs, min_anchors_chain=mac))

    # allow extra overrides from argv as key=value (parsed as python)
    extra = {}
    for arg in sys.argv[1:]:
        k, v = arg.split("=", 1)
        extra[k] = eval(v)
    if extra:
        variants = [dict(**extra)]

    print(f"{'config':<52} {'mean':>9} {'robust':>9} {'median':>9} "
          f"{'af_q':>9} {'af_r':>9}  pass")
    for ov in variants:
        cfg = dataclasses.replace(base, **ov)
        vals = evaluate(r, q, cfg)
        diffs, ok = score(vals)
        tag = ",".join(f"{k}={v}" for k, v in ov.items())
        if vals is None:
            print(f"{tag:<52} (no result)")
            continue
        print(f"{tag:<52} "
              + " ".join(f"{diffs[k]:+9.5f}" for k in
                         ("mean", "robust", "median", "af_q", "af_r"))
              + f"  {'PASS' if ok else ''} nc={vals['n_chains']} "
                f"nf={vals['n_frag']}")


if __name__ == "__main__":
    main()
