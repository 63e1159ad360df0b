"""Learned-ANI (GBDT) regression: bundled model + inference machinery.

The reference loads skani's MAG-trained GBDT via regression::get_model
(/root/reference/src/pyskani/_skani/lib.rs:611-614).  This build bundles
a model RETRAINED on synthetic pairs with exactly-known ANI
(scripts/train_learned_ani.py); these tests pin the weight-file contract
and the behavioral rules around when the correction applies.
"""

import numpy as np
import pytest

from pyskani_tpu import regression
from pyskani_tpu.params import use_learned_ani


def test_bundled_model_loads():
    model = regression.get_model(125, True)
    assert model is not None
    assert model.features == ["ani", "af_query", "af_ref"]
    assert model.feature.ndim == 2 and model.feature.shape[0] >= 50


def test_model_correction_is_small_and_monotone_neighborhood():
    model = regression.get_model(125, True)
    # the correction is a debiasing step: it must stay close to the raw
    # value across the trained range and preserve coarse ordering
    raw = np.linspace(0.85, 1.0, 16)
    x = np.stack([raw, np.full(16, 0.9), np.full(16, 0.9)], axis=1)
    pred = model.predict(x)
    assert np.all(np.abs(pred - raw) < 0.02)
    assert pred[-1] > pred[0]


def test_get_model_disabled():
    assert regression.get_model(125, False) is None


def test_use_learned_ani_rule():
    # reference rule (lib.rs:524-528): c >= 70 and not median
    assert use_learned_ani(125, False, False, False)
    assert not use_learned_ani(125, False, False, True)   # median
    assert not use_learned_ani(30, False, False, False)   # c < 70


def test_apply_model_identity_without_model():
    assert regression.apply_model(None, 0.95, 0.9, 0.9) == 0.95
