"""Break down per-step time on the real chip: step vs rebuild vs QEq/force."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from rxmd_tpu import ffield, system, md, neighbors, reax
from rxmd_tpu.config import RunConfig

dtype = jnp.float32
ff = ffield.parse_ffield("/root/reference/ffield")
st = system.from_cellfile("/root/reference/conf/init.rdx/input.xyz",
                          ff.name_to_type, mc=(3, 3, 3), dtype=dtype)
cfg = RunConfig(mdmode=1, dt_fs=0.25, ntime_step=20, pstep=1000, sstep=10000,
                isQEq=2, QEq_tol=1e-7, dtype="float32")
eng = md.Engine(ff, st, cfg, dtype=dtype)
print("caps:", eng.kb, eng.knb, eng.caps, flush=True)
t0 = time.time()
eng.prepare()
print(f"prepare {time.time()-t0:.1f}s", flush=True)

def timeit(name, fn, reps=10):
    r = fn(); jax.block_until_ready(jax.tree.leaves(r)[0])
    t0 = time.time()
    for _ in range(reps):
        r = fn()
    jax.block_until_ready(jax.tree.leaves(r)[0])
    print(f"{name}: {(time.time()-t0)/reps*1000:8.2f} ms", flush=True)
    return r

timeit("full step", lambda: eng._step(eng.state, eng.force, eng.nbrs))
timeit("rebuild", lambda: eng._rebuild(eng.state))

s = eng.state
nbrs = eng.nbrs

# forces only
ffn = jax.jit(lambda pos, q: eng._forces(pos, q, s.H, s.types, s.gid, nbrs))
timeit("forces only", lambda: ffn(s.pos, s.q))

# qeq only
qfn = jax.jit(lambda pos, q, qsfp, qsfv: eng._qeq_step(
    pos, q, qsfp, qsfv, s.H, s.types, nbrs))
timeit("qeq only (exL)", lambda: qfn(s.pos, s.q, s.qsfp, s.qsfv))

# energy component breakdown: time total_energy vs grad
efn = jax.jit(lambda pos: reax.total_energy(
    pos, s.q, s.H, s.types, s.gid, eng.img, nbrs, eng.ffd, caps=eng.caps))
timeit("energy fwd only", lambda: efn(s.pos))
gfn = jax.jit(jax.grad(lambda pos: reax.total_energy(
    pos, s.q, s.H, s.types, s.gid, eng.img, nbrs, eng.ffd,
    caps=eng.caps).sum()))
timeit("energy grad", lambda: gfn(s.pos))
