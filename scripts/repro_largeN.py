"""Minimal repro/bisection harness for the large-N rebuild compile crash.

SCALING.md: at mc=(5,5,4) (N=16,800) the remote XLA compile service dies
("TPU worker process crashed or restarted") while compiling the rebuild
program; sizes <= 10.7k are fine.  Env knobs:
  MC=5,5,4      system size
  PARTS=all     which pieces to compile/run: nbrs, bo, ang, tor, hb, all,
                rebuild (the engine's fused program)
"""
import os, sys, time
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/repo/.jax_cache')
import jax
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rxmd_tpu import ffield, system, md, neighbors, reax
from rxmd_tpu.config import RunConfig

dtype = jnp.float32
mc = tuple(int(x) for x in os.environ.get("MC", "5,5,4").split(","))
parts = os.environ.get("PARTS", "all").split(",")
ff = ffield.parse_ffield("/root/reference/ffield")
st = system.from_cellfile("/root/reference/conf/init.rdx/input.xyz",
                          ff.name_to_type, mc=mc, dtype=dtype)
cfg = RunConfig(mdmode=1, dt_fs=0.25, ntime_step=10, pstep=1000, sstep=10000,
                isQEq=2, QEq_tol=1e-7, dtype="float32")
print(f"N={st.n}", flush=True)
eng = md.Engine(ff, st, cfg, dtype=dtype)
print(f"caps={eng.caps} kb={eng.kb} knb={eng.knb}", flush=True)
s = eng.state


def run(name, fn, *a):
    t0 = time.time()
    r = fn(*a)
    jax.block_until_ready(jax.tree.leaves(r))
    print(f"{name:12s}: ok  {time.time()-t0:.1f}s", flush=True)
    return r


if "rebuild" in parts:
    run("rebuild", eng._rebuild, s)
    sys.exit(0)

pos = jax.jit(eng._wrap)(s.pos, s.H)
nbrs = run("nbrs", jax.jit(eng._build_nbrs), pos, s.H, s.types)
amask = jnp.ones(pos.shape[0], bool)
bo = run("bo", jax.jit(lambda p: reax.bond_order(
    p, s.H, s.types, eng.img, nbrs, eng.ffd)), pos)

if "ang" in parts or "all" in parts:
    run("angle", jax.jit(lambda: reax.build_angle_list(
        s.types, eng.img, nbrs, bo, amask, eng.ffd,
        cap=eng.caps["ang"], ks=eng.caps["ks"], slack=eng.term_slack,
        margin=eng.term_margin, rowcap=eng.caps.get("ang_row", 0))))
if "tor" in parts or "all" in parts:
    run("torsion", jax.jit(lambda: reax.build_torsion_list(
        s.types, s.gid, eng.img, nbrs, bo, amask, eng.ffd,
        cap=eng.caps["tor"], ks=eng.caps["ks"], slack=eng.term_slack,
        margin=eng.term_margin, rowcap=eng.caps.get("tor_row", 0))))
if "hb" in parts or "all" in parts:
    run("hbond", jax.jit(lambda: reax.build_hbond_list(
        pos, s.H, s.types, eng.img, nbrs, bo, amask, eng.ffd,
        cap=eng.caps["hbf"], kh=eng.caps["kh"], slack=eng.term_slack,
        margin=eng.term_margin, rowcap=eng.caps.get("hb_row", 0))))
print("done", flush=True)
