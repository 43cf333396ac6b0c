"""Timing harness for dryrun_multichip restructure (scratch)."""
import os, time, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
t0 = time.time()

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from rxmd_tpu import ffield, system
from rxmd_tpu.config import RunConfig
from rxmd_tpu.parallel.engine import ShardedEngine, factor_mesh

def lap(msg):
    print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)

lap("imports")
mesh_shape = factor_mesh(8)
ff = ffield.parse_ffield("/root/reference/ffield")
base = np.array([13.18, 11.57, 10.71])
skin = max(3 * 3.16, 10.0) + 0.3
mc = tuple(int(np.ceil(skin * m / b)) for m, b in zip(mesh_shape, base))
st = system.from_cellfile("/root/reference/conf/init.rdx/input.xyz",
                          ff.name_to_type, mc=mc, dtype=jnp.float32)
lap(f"deck built: mc={mc} n={st.n}")
cfg = RunConfig(mdmode=1, dt_fs=0.25, isQEq=2, qstep=1, dtype="float32")
eng = ShardedEngine(ff, st, cfg, mesh_shape=mesh_shape,
                    devices=jax.devices()[:8])
lap("engine init (incl. probe_capacities)")
# skip prepare(): start from zero force, one compiled program
eng.force = jnp.zeros((eng.sstate.frac.shape[0], 3), eng.dtype)
eng.run(1)
lap("step 1 (compile + run)")
eng.run(1)
lap("step 2 (cached)")
pe = float(eng.comps[0]) / st.n
print("PE/atom", pe, "nqeq", int(eng.nqeq), "natoms", eng.n_atoms)
