"""Compile-time breakdown of the production step programs.

Times `.lower()` (trace) and `.compile()` (XLA) separately for each
component of the MD step, with a FRESH compilation cache so the numbers are
true cold-compile costs.  Run on the real chip:

    RXMD_TPU_CACHE=$(mktemp -d) python scripts/prof_compile.py
"""
import os, sys, time
os.environ.setdefault("RXMD_TPU_CACHE", "/tmp/jc_" + str(os.getpid()))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np
from rxmd_tpu import ffield, system, md, neighbors, reax, qeq
from rxmd_tpu.config import RunConfig

dtype = jnp.float32
mc = tuple(int(x) for x in os.environ.get("MC", "3,3,3").split(","))
ff = ffield.parse_ffield("/root/reference/ffield")
st = system.from_cellfile("/root/reference/conf/init.rdx/input.xyz",
                          ff.name_to_type, mc=mc, dtype=dtype)
ISQEQ = int(os.environ.get("ISQEQ", "1"))
cfg = RunConfig(mdmode=1, dt_fs=0.25, ntime_step=20, pstep=10**9,
                sstep=10**9, isQEq=ISQEQ, QEq_tol=1e-7, dtype="float32")
t0 = time.time()
eng = md.Engine(ff, st, cfg, dtype=dtype)
print(f"N={st.n} isQEq={ISQEQ} engine-init {time.time()-t0:.1f}s", flush=True)


def lc(name, jitted, *args):
    t0 = time.time()
    lowered = jitted.lower(*args)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    try:
        hlo = lowered.as_text()
        nlines = hlo.count("\n")
    except Exception:
        nlines = -1
    print(f"{name:40s} trace {t1-t0:7.1f}s  compile {t2-t1:7.1f}s  "
          f"hlo_lines {nlines}", flush=True)
    return compiled


# rebuild first (cheap) to get real operands
s0, nbrs, lists, sm = jax.eval_shape(eng._rebuild, eng.state), None, None, None
t0 = time.time()
reb = lc("rebuild", eng._rebuild, eng.state)
state, nbrs, lists, sm = reb(eng.state)
pos_ref = state.pos
astr = jnp.zeros((6,), dtype)
f0 = jnp.zeros_like(state.pos)

lc("prepare", eng._prepare, state, nbrs, lists, sm)
lc("step (full)", eng._step, state, f0, nbrs, lists, sm, pos_ref, astr)

# components
amask = jnp.ones(state.n, bool)
qeqf = jax.jit(lambda p, q, qs: qeq.solve(
    p, q, qs, state.H, state.types, eng.img, nbrs, eng.ffd, isqeq=ISQEQ,
    nmax=cfg.NMAXQEq, tol=cfg.QEq_tol, closed_form=eng.closed_form,
    dense_max=cfg.qeq_dense_max))
lc("qeq.solve alone", qeqf, state.pos, state.q, state.qsfp)

eff = jax.jit(lambda p, q: reax.energy_and_forces(
    p, q, state.H, state.types, state.gid, eng.img, nbrs, eng.ffd,
    caps=eng.caps, lists=lists, closed_form=eng.closed_form))
lc("energy_and_forces (no virial)", eff, state.pos, state.q)

effv = jax.jit(lambda p, q: reax.energy_and_forces(
    p, q, state.H, state.types, state.gid, eng.img, nbrs, eng.ffd,
    caps=eng.caps, lists=lists, closed_form=eng.closed_form,
    with_virial=True))
lc("energy_and_forces (virial)", effv, state.pos, state.q)

etot = jax.jit(lambda p, q: reax.total_energy(
    p, q, state.H, state.types, state.gid, eng.img, nbrs, eng.ffd,
    caps=eng.caps))
lc("total_energy fwd", etot, state.pos, state.q)
print(f"TOTAL {time.time()-t0:.1f}s", flush=True)
