import time, numpy as np
import jax, jax.numpy as jnp
from rxmd_tpu import ffield, system, neighbors, reax, qeq, units, md
from rxmd_tpu.config import RunConfig

ff = ffield.parse_ffield("/root/reference/ffield")
st = system.from_cellfile("/root/reference/conf/init.rdx/input.xyz", ff.name_to_type, mc=(3,3,3), dtype=jnp.float32)
t0=time.time()
cfg = RunConfig(mdmode=1, dt_fs=0.25, isQEq=2, dtype="float32")
eng = md.Engine(ff, st, cfg, dtype=jnp.float32)
print("engine init", time.time()-t0, "caps", eng.kb, eng.knb, eng.caps, flush=True)
s = eng.state

def timeit(name, fn, *a):
    t0=time.time(); r = fn(*a); jax.block_until_ready(r)
    print(f"{name} compile+run: {time.time()-t0:.1f} s", flush=True)
    t0=time.time()
    for _ in range(5): r = fn(*a)
    jax.block_until_ready(r)
    print(f"{name}: {(time.time()-t0)/5*1000:.1f} ms", flush=True)
    return r

bn = jax.jit(lambda p: eng._build_nbrs(p, s.H, s.types))
nbrs = timeit("neighbors", bn, s.pos)
qf = jax.jit(lambda p,q0: qeq.solve(p, q0, s.qsfp, s.H, s.types, eng.img, nbrs, eng.ffd, isqeq=2, nmax=1).q)
qv = timeit("qeq(isQEq=2)", qf, s.pos, s.q)
ef = jax.jit(lambda p,q0: reax.energy_and_forces(p, q0, s.H, s.types, s.gid, eng.img, nbrs, eng.ffd, caps=eng.caps))
r = timeit("energy+forces", ef, s.pos, qv)
ec = jax.jit(lambda p,q0: reax.energy_components(p, q0, s.H, s.types, s.gid, eng.img, nbrs, eng.ffd, caps=eng.caps))
timeit("  fwd all-components", ec, s.pos, qv)
t0=time.time(); eng.prepare(); eng.run(1, log=None); print("step compile total", time.time()-t0, flush=True)
t0=time.time(); eng.run(5, log=None); print("step steady:", (time.time()-t0)/5*1000, "ms", flush=True)
print("PE/atom", float(eng.comps[0])/st.n, flush=True)
