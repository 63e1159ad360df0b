"""Per-fusion device profile of one rect chain_block tile (r4).

Recipe from the r3 notes: jax.profiler trace -> parse trace.json.gz
device events; map fusion names to source lines via compiled HLO text.
"""

import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyskani_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

import bench
from pyskani_tpu.engine.batch import take_sketch
from pyskani_tpu.oracle.chain import ChainConfig
from pyskani_tpu.ops.chain import EngineBudgets, chain_block
from pyskani_tpu.ops.sketch import round_up
from pyskani_tpu.params import SketchParams

N = 16
LEN = 2_300_000
params = SketchParams()
batch, _, _ = bench.make_batch_on_device(N, LEN, params)
cfg = ChainConfig()
nf = round_up(-(-LEN // cfg.fragment_length) + 2, 128)
budgets = EngineBudgets(
    max_anchors=round_up(batch.kmers.shape[1] * 3 // 2 + 4096, 8192),
    max_fragments=nf, max_anchors_per_fragment=256)
app = round_up(batch.kmers.shape[1] * 3 // 4, 1024)
total = round_up(8 * 8 * app, 8192)

rp = jnp.asarray(np.arange(8, dtype=np.int32))
qp = jnp.asarray(np.arange(8, 16, dtype=np.int32))

tile = jax.jit(lambda r, q: chain_block(
    take_sketch(batch, r), take_sketch(batch, q),
    cfg=cfg, budgets=budgets, total_anchors=total))
out = tile(rp, qp)
jax.device_get(out["ani_mean"][:1, :1])
ts = []
for _ in range(3):
    t0 = time.time()
    out = tile(rp, qp)
    jax.device_get(out["ani_mean"][:1, :1])
    ts.append(time.time() - t0)
print(f"rect 8x8 tile: {min(ts)*1e3:.1f} ms ({min(ts)/64*1e3:.2f} ms/pair)",
      file=sys.stderr)

trace_dir = "/tmp/chain_trace_r4"
os.system(f"rm -rf {trace_dir}")
jax.profiler.start_trace(trace_dir)
out = tile(rp, qp)
jax.device_get(out["ani_mean"][:1, :1])
jax.profiler.stop_trace()

# parse the trace: sum device-side event durations by op name
paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
print("trace files:", paths, file=sys.stderr)
ev_by_name = {}
for p in paths:
    with gzip.open(p, "rt") as f:
        doc = json.load(f)
    pids = {e.get("pid"): e.get("args", {}).get("name", "")
            for e in doc.get("traceEvents", [])
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tpu_pids = {pid for pid, name in pids.items()
                if "TPU" in str(name) or "/device" in str(name)}
    for e in doc.get("traceEvents", []):
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            nm = e.get("name", "")
            ev_by_name.setdefault(nm, [0.0, 0])
            ev_by_name[nm][0] += e.get("dur", 0) / 1e3  # ms
            ev_by_name[nm][1] += 1
tot = sum(v[0] for v in ev_by_name.values())
print(f"total device time: {tot:.1f} ms", file=sys.stderr)
for nm, (dur, cnt) in sorted(ev_by_name.items(), key=lambda kv: -kv[1][0])[:60]:
    print(f"{dur:8.2f} ms x{cnt:<4d} {nm[:100]}", file=sys.stderr)

# map fusion names to source lines
txt = tile.lower(rp, qp).compile().as_text()
import re
lines = {}
for m in re.finditer(r"%?([a-z0-9_.\-]*fusion[a-z0-9_.\-]*) = [^\n]*?"
                     r"metadata=\{[^}]*?source_line=(\d+)[^}]*?"
                     r"(?:source_file=\"([^\"]*)\")?", txt):
    lines[m.group(1)] = (m.group(3), m.group(2))
for m in re.finditer(r"%?([a-z0-9_.\-]*fusion[a-z0-9_.\-]*) = [^\n]*?"
                     r"source_file=\"([^\"]+)\"[^\n]*?source_line=(\d+)", txt):
    lines[m.group(1)] = (m.group(2), m.group(3))
shown = 0
for nm, (dur, cnt) in sorted(ev_by_name.items(), key=lambda kv: -kv[1][0]):
    base = nm.split("(")[0].strip("%")
    if base in lines and shown < 20:
        f, ln = lines[base]
        print(f"{dur:8.2f} ms  {base}  -> {f}:{ln}", file=sys.stderr)
        shown += 1
