"""jax.profiler trace of the production step; prints top self-time ops."""
import os, sys, time, glob, gzip, json, collections
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/repo/.jax_cache')
import jax
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import jax.numpy as jnp
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rxmd_tpu import ffield, system, md
from rxmd_tpu.config import RunConfig

dtype = jnp.float32
mc = tuple(int(x) for x in os.environ.get("MC", "3,3,3").split(","))
ff = ffield.parse_ffield("/root/reference/ffield")
st = system.from_cellfile("/root/reference/conf/init.rdx/input.xyz",
                          ff.name_to_type, mc=mc, dtype=dtype)
cfg = RunConfig(mdmode=1, dt_fs=0.25, ntime_step=20, pstep=10**9,
                sstep=10**9, isQEq=2, QEq_tol=1e-7, dtype="float32")
eng = md.Engine(ff, st, cfg, dtype=dtype)
eng.prepare()
eng.run(3, log=None)

outdir = "/tmp/jaxtrace"
os.system(f"rm -rf {outdir}")
with jax.profiler.trace(outdir):
    eng.run(5, log=None)

# parse the trace: sum TPU-side op durations
files = glob.glob(outdir + "/**/*.trace.json.gz", recursive=True)
print("trace files:", files, flush=True)
ev = []
for fp in files:
    with gzip.open(fp, "rt") as f:
        data = json.load(f)
    ev.extend(data.get("traceEvents", []))
# find TPU device pids
pid_names = {e["pid"]: e["args"].get("name", "") for e in ev
             if e.get("ph") == "M" and e.get("name") == "process_name"
             and "args" in e}
dev_pids = {p for p, nm in pid_names.items()
            if "TPU" in nm or "/device" in nm.lower()}
agg = collections.Counter()
cnt = collections.Counter()
for e in ev:
    if e.get("ph") == "X" and e.get("pid") in dev_pids:
        agg[e["name"]] += e.get("dur", 0)
        cnt[e["name"]] += 1
tot = sum(agg.values())
print(f"total device us: {tot} over 5 steps -> {tot/5/1000:.1f} ms/step")
for name, us in agg.most_common(45):
    print(f"{us/5/1000:9.2f} ms  x{cnt[name]//5:<4d} {name[:120]}")
