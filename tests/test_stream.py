"""stream_one_vs_many (out-of-core double-buffered search) correctness.

The streaming path must reproduce the in-memory one_vs_many results for
any chunking, including ragged last chunks (reference semantics: each
shortlisted sketch chained identically, lib.rs:639-657).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import mutate, random_genome
from pyskani_tpu.engine.batch import one_vs_many, repad_sketch, stack_sketches
from pyskani_tpu.engine.stream import stream_one_vs_many
from pyskani_tpu.oracle.chain import ChainConfig
from pyskani_tpu.ops.chain import EngineBudgets
from pyskani_tpu.ops.sketch import sketch_genome_device
from pyskani_tpu.params import SketchParams

CFG = ChainConfig()
BUDGETS = EngineBudgets(max_anchors=4096, max_fragments=64,
                        max_anchors_per_fragment=128)


@pytest.fixture(scope="module")
def family():
    rng = np.random.default_rng(17)
    base = random_genome(rng, 60_000)
    params = SketchParams()
    named = [("g%d" % i, mutate(rng, base, 0.005 * (i + 1)))
             for i in range(5)]
    sketches = {
        n: sketch_genome_device(n, [c], params, seed_budget=1024,
                                marker_budget=512, length_bucket=1 << 16,
                                max_contigs=8)
        for n, c in named
    }
    query = sketch_genome_device("q", [base], params, seed_budget=1024,
                                 marker_budget=512, length_bucket=1 << 16,
                                 max_contigs=8)
    return sketches, query


@pytest.mark.parametrize("chunk", [1, 2, 5, 16])
def test_stream_matches_memory(family, chunk):
    sketches, query = family
    names = list(sketches)
    qpad = repad_sketch(query, 1024, 512, max_contigs=8)

    stack = stack_sketches(list(sketches.values()), seed_budget=1024,
                           marker_budget=512)
    mem = one_vs_many(stack, qpad, jnp.arange(len(names)), cfg=CFG,
                      budgets=BUDGETS, chunk=2)

    loads = []

    def load(name):
        loads.append(name)
        return sketches[name]

    out = stream_one_vs_many(load, names, qpad, cfg=CFG, budgets=BUDGETS,
                             seed_budget=1024, marker_budget=512,
                             chunk=chunk)
    for key in ("ani_mean", "ani_robust", "ani_median", "af_query",
                "af_ref"):
        np.testing.assert_allclose(out[key], np.asarray(mem[key]),
                                   atol=1e-6, err_msg=f"{key} chunk={chunk}")
    # every name loaded exactly once
    assert sorted(loads) == sorted(names)


def test_stream_empty():
    assert stream_one_vs_many(lambda n: None, [], None, cfg=CFG,
                              budgets=BUDGETS, seed_budget=64,
                              marker_budget=64) == {}
