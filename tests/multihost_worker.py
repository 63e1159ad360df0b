"""Worker process for the multi-host smoke test (test_multihost.py).

Usage: python multihost_worker.py <coordinator> <num_processes> <process_id>

Each process contributes 2 virtual CPU devices (4 global on a 2-process
run), initialises the distributed runtime via
pyskani_tpu.parallel.dist.initialize_multihost, builds deterministic
sketches, places globally-sharded arrays with make_array_from_callback,
runs one sharded search step and prints the replicated global stats.
"""

import os
import sys

coordinator, num_processes, process_id = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))

# 4 global devices regardless of process count (2x2 mesh)
local_devices = 4 // num_processes
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") +
    f" --xla_force_host_platform_device_count={local_devices}")

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyskani_tpu.parallel.dist import initialize_multihost

if num_processes > 1:
    initialize_multihost(coordinator=coordinator,
                         num_processes=num_processes,
                         process_id=process_id)
    assert jax.process_count() == num_processes
assert len(jax.devices()) == 4

from jax.sharding import NamedSharding, PartitionSpec as P

from pyskani_tpu.engine.batch import stack_sketches
from pyskani_tpu.oracle.chain import ChainConfig
from pyskani_tpu.ops.chain import EngineBudgets
from pyskani_tpu.ops.sketch import sketch_genome_device
from pyskani_tpu.parallel.dist import make_sharded_search
from pyskani_tpu.parallel.mesh import make_mesh
from pyskani_tpu.params import SketchParams


def family(n, seed=0, length=4000):
    rng = np.random.default_rng(1234)
    base = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=length)
    rng = np.random.default_rng(seed)
    params = SketchParams()
    out = []
    for i in range(n):
        arr = base.copy()
        idx = rng.integers(0, length, length // 50)
        arr[idx] = rng.choice(np.frombuffer(b"ACGT", np.uint8),
                              size=len(idx))
        out.append(sketch_genome_device(
            f"g{i}", [arr.tobytes()], params, seed_budget=1024,
            marker_budget=512, length_bucket=1 << 13, max_contigs=8))
    return out


def shard_global(mesh, tree, axis):
    """Multi-process-safe placement of a host-replicated stacked pytree."""
    def place(x):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, P(axis))
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])
    return jax.tree.map(place, tree)


mesh = make_mesh(db=2, batch=2, devices=jax.devices())
refs = stack_sketches(family(4, seed=1))
queries = stack_sketches(family(4, seed=2))
cfg = ChainConfig()
budgets = EngineBudgets(max_anchors=2048, max_fragments=64,
                        max_anchors_per_fragment=128)
step = make_sharded_search(mesh, cfg, budgets, chunk=2)
out = step(shard_global(mesh, refs, "db"),
           shard_global(mesh, queries, "batch"))
jax.block_until_ready(out)

# replicated outputs are addressable on every process
total_hits = int(np.asarray(out["total_hits"])[0])
n_chained = int(np.asarray(out["n_chained"])[0])
# gather the full ANI plane to process 0 for a value-level check
from jax.experimental import multihost_utils

ani = np.asarray(multihost_utils.process_allgather(out["ani_mean"],
                                                   tiled=True))
print(f"RESULT process={process_id} total_hits={total_hits} "
      f"n_chained={n_chained} ani_sum={ani.sum():.6f}", flush=True)
