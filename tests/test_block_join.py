"""chain_block (all-pairs single-sort join) must match chain_pair exactly.

The block join amortises the anchor join's stream sort over G_r x G_q
pairs; these tests pin its numerical equivalence to the per-pair path
(same anchors, same chains, same estimators) including multi-contig
genomes and unrelated pairs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import mutate, random_genome
from pyskani_tpu.engine.batch import stack_sketches, take_sketch
from pyskani_tpu.oracle.chain import ChainConfig
from pyskani_tpu.ops.chain import (EngineBudgets, chain_block, chain_pair,
                                   chain_triangle, triu_pairs)
from pyskani_tpu.ops.sketch import sketch_genome_device
from pyskani_tpu.params import SketchParams

CFG = ChainConfig()
BUDGETS = EngineBudgets(max_anchors=4096, max_fragments=64,
                        max_anchors_per_fragment=128)


@pytest.fixture(scope="module")
def family():
    rng = np.random.default_rng(5)
    base = random_genome(rng, 60_000)
    params = SketchParams()
    genomes = [
        ("base", [base]),
        ("mut1", [mutate(rng, base, 0.01)]),
        ("mut2", [mutate(rng, base, 0.03)]),
        ("multi", [mutate(rng, base[:30_000], 0.02),
                   mutate(rng, base[30_000:], 0.02)]),
        ("unrelated", [random_genome(rng, 60_000)]),
    ]
    sketches = [sketch_genome_device(n, c, params, seed_budget=1024,
                                     marker_budget=512, length_bucket=1 << 16,
                                     max_contigs=8)
                for n, c in genomes]
    return stack_sketches(sketches)


def test_block_matches_pairwise(family):
    n = family.kmers.shape[0]
    block = jax.jit(lambda r, q: chain_block(
        r, q, cfg=CFG, budgets=BUDGETS))(family, family)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            ref = take_sketch(family, i)
            qry = take_sketch(family, j)
            single = chain_pair(ref, qry, cfg=CFG, budgets=BUDGETS)
            for key in ("ani_mean", "ani_robust", "ani_median",
                        "af_query", "af_ref"):
                np.testing.assert_allclose(
                    np.asarray(block[key])[i, j], np.asarray(single[key]),
                    rtol=0, atol=1e-6,
                    err_msg=f"{key} mismatch for pair ({i},{j})")
            assert int(np.asarray(block["n_anchors"])[i, j]) == \
                int(np.asarray(single["n_anchors"])), f"anchors ({i},{j})"
            assert int(np.asarray(block["n_fragments"])[i, j]) == \
                int(np.asarray(single["n_fragments"])), f"frags ({i},{j})"


def test_block_shapes_and_padding(family):
    two = take_sketch(family, jnp.asarray([0, 1]))
    three = take_sketch(family, jnp.asarray([1, 2, 3]))
    out = chain_block(two, three, cfg=CFG, budgets=BUDGETS)
    assert out["ani_mean"].shape == (2, 3)
    # ref 0 (base) vs query 1 (mut1) must match the transposed direction
    single = chain_pair(take_sketch(family, 0), take_sketch(family, 1),
                        cfg=CFG, budgets=BUDGETS)
    np.testing.assert_allclose(np.asarray(out["ani_mean"])[0, 0],
                               np.asarray(single["ani_mean"]), atol=1e-6)


def test_triangle_matches_pairwise(family):
    """chain_triangle (single self-join sort over the whole stack) must
    equal chain_pair on every unordered pair, including the multi-contig
    and unrelated genomes."""
    n = family.kmers.shape[0]
    out = jax.jit(lambda g: chain_triangle(
        g, cfg=CFG, budgets=BUDGETS))(family)
    ri, qi = triu_pairs(n)
    assert out["ani_mean"].shape == (n * (n - 1) // 2,)
    for p in range(len(ri)):
        ref = take_sketch(family, int(ri[p]))
        qry = take_sketch(family, int(qi[p]))
        single = chain_pair(ref, qry, cfg=CFG, budgets=BUDGETS)
        for key in ("ani_mean", "ani_robust", "ani_median",
                    "af_query", "af_ref"):
            np.testing.assert_allclose(
                np.asarray(out[key])[p], np.asarray(single[key]),
                rtol=0, atol=1e-6,
                err_msg=f"{key} mismatch for pair ({ri[p]},{qi[p]})")
        assert int(np.asarray(out["n_anchors"])[p]) == \
            int(np.asarray(single["n_anchors"])), f"anchors ({ri[p]},{qi[p]})"
        assert int(np.asarray(out["n_fragments"])[p]) == \
            int(np.asarray(single["n_fragments"])), f"frags ({ri[p]},{qi[p]})"


def test_triangle_too_large_rejected(family):
    big = EngineBudgets(max_anchors=1024, max_fragments=1 << 16,
                        max_anchors_per_fragment=64)
    with pytest.raises(ValueError, match="triangle too large"):
        chain_triangle(family, cfg=CFG, budgets=big)


def test_block_too_large_rejected(family):
    big = EngineBudgets(max_anchors=1024, max_fragments=1 << 16,
                        max_anchors_per_fragment=64)
    two = take_sketch(family, jnp.asarray([0, 1]))
    with pytest.raises(ValueError, match="block too large"):
        chain_block(two, two, cfg=CFG, budgets=big)
