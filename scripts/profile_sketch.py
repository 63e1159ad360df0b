"""Per-fusion device profile of the sketch kernel (r4).

Times the full vmapped sketch_kernel on an 8 x 2.3 Mbp device-generated
stack, then maps the hottest fusions to source lines via the compiled
HLO (recipe from the r3 axon notes).  Run on the real TPU.
"""

import functools, sys, time, glob, gzip, json, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from pyskani_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from pyskani_tpu.params import SketchParams
from pyskani_tpu.ops.sketch import (marker_budget_for, round_up, seed_budget_for, sketch_kernel)
LEN=2_300_000; B=8
params=SketchParams()
L=max(round_up(LEN,1<<20),1<<20)
SB=seed_budget_for(LEN,params.c); MB=marker_budget_for(LEN,params.marker_c)
@jax.jit
def gen(sk):
    base=jax.random.randint(jax.random.PRNGKey(0),(LEN,),0,4,dtype=jnp.uint8)
    def mut(k):
        ki,kv=jax.random.split(k)
        idx=jax.random.randint(ki,(LEN//100,),0,LEN)
        vals=jax.random.randint(kv,(LEN//100,),0,4,dtype=jnp.uint8)
        return base.at[idx].set(vals)
    codes=jax.vmap(mut)(jax.random.split(sk,B))
    codes=jnp.pad(codes,((0,0),(0,L-LEN)))
    q=codes.reshape(B,L//4,4)
    return (q[...,0]|(q[...,1]<<2)|(q[...,2]<<4)|(q[...,3]<<6)).astype(jnp.uint8)
packed=gen(jax.random.PRNGKey(1)); jax.device_get(packed[:1,:1])
MC=8
starts=np.zeros(MC+1,np.int32); starts[1:]=LEN
starts_d=jnp.asarray(np.broadcast_to(starts,(B,MC+1)).copy())
ncon=jnp.ones(B,jnp.int32)
kern=functools.partial(sketch_kernel,k=15,marker_k=21,c=params.c,marker_c=params.marker_c,seed_budget=SB,marker_budget=MB)
full=jax.jit(lambda p: jax.vmap(kern)(p,starts_d,ncon))
out=full(packed); jax.device_get(out['n_seeds'])
td="/tmp/sk_trace"; os.system(f"rm -rf {td}")
jax.profiler.start_trace(td)
out=full(packed); jax.device_get(out['n_seeds'])
jax.profiler.stop_trace()
ev={}
for p in glob.glob(f"{td}/**/*.trace.json.gz", recursive=True):
    with gzip.open(p,'rt') as f: doc=json.load(f)
    pids={e.get("pid"): e.get("args",{}).get("name","") for e in doc.get("traceEvents",[]) if e.get("ph")=="M" and e.get("name")=="process_name"}
    tpids={pid for pid,name in pids.items() if "TPU" in str(name) or "/device" in str(name)}
    for e in doc.get("traceEvents",[]):
        if e.get("ph")=="X" and e.get("pid") in tpids:
            nm=e.get("name","")
            ev.setdefault(nm,[0.0,0]); ev[nm][0]+=e.get("dur",0)/1e3; ev[nm][1]+=1
for nm,(d,c) in sorted(ev.items(), key=lambda kv:-kv[1][0])[:20]:
    print(f"{d:8.2f} ms x{c:<3d} {nm[:90]}")
txt = full.lower(packed).compile().as_text()
import re
lines={}
for m in re.finditer(r"%?([a-z0-9_.\-]*(?:fusion|sort|iota|scatter)[a-z0-9_.\-]*) = [^\n]*?source_line=(\d+)", txt):
    lines.setdefault(m.group(1), m.group(2))
for m in re.finditer(r"%?([a-z0-9_.\-]*(?:fusion|sort)[a-z0-9_.\-]*) = [^\n]*?source_file=\"([^\"]+)\"[^\n]*?source_line=(\d+)", txt):
    lines[m.group(1)] = f"{m.group(2).split('/')[-1]}:{m.group(3)}"
shown=0
for nm,(d,c) in sorted(ev.items(), key=lambda kv:-kv[1][0]):
    base=nm.split("(")[0].strip("%")
    if base in lines and shown<15:
        print(f"{d:8.2f} ms  {base} -> {lines[base]}")
        shown+=1
