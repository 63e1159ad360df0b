"""Train the learned-ANI correction model (GBDT) on synthetic truth.

The reference enables a gradient-boosted-tree correction of the raw
chain ANI (skani::regression, called at
/root/reference/src/pyskani/_skani/lib.rs:611-614).  skani's weights were
trained on MAGs and live inside the skani crate — unavailable in this
network-isolated build — so this script RETRAINS the correction from
first principles: generate genome pairs whose true ANI is known exactly
(substitutions to a different base at distinct positions => divergence
== sub_rate; block deletions vary aligned fraction without changing the
identity of aligned regions), run the reconstruction's raw estimator
(the NumPy oracle), and fit raw -> true.

Output: pyskani_tpu/data/gbdt_model.json (schema in
pyskani_tpu/regression.py), features [ani, af_query, af_ref].

Run:  JAX_PLATFORMS=cpu python scripts/train_learned_ani.py
"""

from __future__ import annotations

import json
import os
import sys
from multiprocessing import Pool

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyskani_tpu.oracle.chain import ChainConfig, chain_seeds
from pyskani_tpu.oracle.seeding import sketch_genome
from pyskani_tpu.params import SketchParams

CODES = np.frombuffer(b"ACGT", np.uint8)
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "pyskani_tpu", "data", "gbdt_model.json")


def make_pair(seed: int):
    """One training example: (features [ani, af_q, af_r], true_ani)."""
    rng = np.random.default_rng(seed)
    L = int(rng.choice([200_000, 400_000, 800_000]))
    sub = float(rng.uniform(0.0, 0.20))          # true ANI in [0.80, 1.0]
    n_sub = int(round(sub * L))
    base = rng.choice(CODES, size=L)
    mut = base.copy()
    if n_sub:
        idx = rng.choice(L, n_sub, replace=False)
        mut[idx] = CODES[(np.searchsorted(CODES, mut[idx]) +
                          rng.integers(1, 4, n_sub)) % 4]
    true_ani = 1.0 - n_sub / L
    # delete blocks from one/both sides to vary aligned fractions
    def drop_blocks(arr, frac):
        if frac <= 0:
            return arr
        nblk = rng.integers(1, 6)
        keep = np.ones(len(arr), bool)
        for _ in range(nblk):
            blen = int(frac * len(arr) / nblk)
            st = rng.integers(0, len(arr) - blen)
            keep[st:st + blen] = False
        return arr[keep]
    ref = drop_blocks(base, float(rng.uniform(0, 0.3)) if rng.random() < 0.5
                      else 0.0)
    qry = drop_blocks(mut, float(rng.uniform(0, 0.3)) if rng.random() < 0.5
                      else 0.0)
    params = SketchParams()
    s_ref = sketch_genome("r", [ref.tobytes()], params)
    s_qry = sketch_genome("q", [qry.tobytes()], params)
    res = chain_seeds(s_ref, s_qry, ChainConfig())
    if res.ani <= 0.1:
        return None
    return ([float(res.ani), float(res.align_fraction_query),
             float(res.align_fraction_ref)], true_ani)


def export_sklearn_gbdt(est, features, path):
    """sklearn GradientBoostingRegressor -> the engine's JSON schema."""
    trees = []
    lr = est.learning_rate
    for stage in est.estimators_[:, 0]:
        t = stage.tree_
        feature = np.where(t.children_left < 0, -1, t.feature).astype(int)
        trees.append({
            "feature": feature.tolist(),
            "threshold": t.threshold.astype(float).tolist(),
            "left": np.maximum(t.children_left, 0).astype(int).tolist(),
            "right": np.maximum(t.children_right, 0).astype(int).tolist(),
            "value": (t.value[:, 0, 0] * lr).astype(float).tolist(),
        })
    base = float(est.init_.constant_[0, 0])
    with open(path, "w") as f:
        json.dump({"trees": trees, "base": base, "features": features,
                   "training": "synthetic substitution pairs, "
                               "see scripts/train_learned_ani.py"}, f)


def main(n_pairs=800, workers=8):
    with Pool(workers) as pool:
        rows = pool.map(make_pair, range(n_pairs))
    rows = [r for r in rows if r is not None]
    X = np.array([r[0] for r in rows])
    y = np.array([r[1] for r in rows])
    print(f"dataset: {len(y)} pairs, raw MAE="
          f"{np.mean(np.abs(X[:, 0] - y)):.5f}")

    from sklearn.ensemble import GradientBoostingRegressor
    from sklearn.model_selection import cross_val_score
    est = GradientBoostingRegressor(n_estimators=200, max_depth=3,
                                    learning_rate=0.05, random_state=0)
    cv = cross_val_score(est, X, y, cv=5,
                         scoring="neg_mean_absolute_error")
    print(f"5-fold CV MAE: {-cv.mean():.5f} +- {cv.std():.5f}")
    est.fit(X, y)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    export_sklearn_gbdt(est, ["ani", "af_query", "af_ref"], OUT)

    # verify the export round-trips through the engine's inference
    from pyskani_tpu.regression import load_model_file
    model = load_model_file(OUT)
    pred_sk = est.predict(X)
    pred_js = model.predict(X)
    err = np.max(np.abs(pred_sk - pred_js))
    print(f"export check: max |sklearn - engine| = {err:.2e}")
    assert err < 1e-5
    print(f"corrected MAE: {np.mean(np.abs(pred_sk - y)):.5f} "
          f"(raw {np.mean(np.abs(X[:, 0] - y)):.5f})")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main(int(os.environ.get("TRAIN_PAIRS", "800")),
         int(os.environ.get("TRAIN_WORKERS", "8")))
