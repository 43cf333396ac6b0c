import time
import jax, jax.numpy as jnp
from rxmd_tpu import ffield, system, md
from rxmd_tpu.config import RunConfig

ff = ffield.parse_ffield("/root/reference/ffield")
st = system.from_cellfile("/root/reference/conf/init.rdx/input.xyz",
                          ff.name_to_type, mc=(3, 3, 3), dtype=jnp.float32)
t0 = time.time()
cfg = RunConfig(mdmode=1, dt_fs=0.25, isQEq=2, dtype="float32")
eng = md.Engine(ff, st, cfg, dtype=jnp.float32)
print("engine init", time.time() - t0, "caps", eng.kb, eng.knb, eng.caps,
      flush=True)
t0 = time.time()
eng.prepare()
eng.run(1, log=None)
print("prepare+step compile", time.time() - t0, flush=True)
t0 = time.time()
eng.run(20, log=None)
print("step steady:", (time.time() - t0) / 20 * 1000, "ms", flush=True)
print("PE/atom", float(eng.comps[0]) / st.n, flush=True)
