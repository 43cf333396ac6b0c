"""Per-term timing on the real chip + N scaling."""
import time, sys, os
import numpy as np
import jax, jax.numpy as jnp
from rxmd_tpu import ffield, system, md, neighbors, reax
from rxmd_tpu.config import RunConfig

dtype = jnp.float32
mc = tuple(int(x) for x in os.environ.get("MC", "3,3,3").split(","))
ff = ffield.parse_ffield("/root/reference/ffield")
st = system.from_cellfile("/root/reference/conf/init.rdx/input.xyz",
                          ff.name_to_type, mc=mc, dtype=dtype)
cfg = RunConfig(mdmode=1, dt_fs=0.25, ntime_step=20, pstep=1000, sstep=10000,
                isQEq=2, QEq_tol=1e-7, dtype="float32")
eng = md.Engine(ff, st, cfg, dtype=dtype)
print(f"N={st.n} kb={eng.kb} knb={eng.knb} caps={eng.caps}", flush=True)
eng.prepare()
s = eng.state
nbrs = eng.nbrs
img = eng.img
ffd = eng.ffd
caps = eng.caps
amask = jnp.ones(s.n, bool)


def timeit(name, fn, reps=5):
    r = fn(); jax.block_until_ready(jax.tree.leaves(r)[0])
    t0 = time.time()
    for _ in range(reps):
        r = fn()
    jax.block_until_ready(jax.tree.leaves(r)[0])
    print(f"{name:28s}: {(time.time()-t0)/reps*1000:8.2f} ms", flush=True)
    return r


ctx = jax.jit(lambda p, q: reax.nb_ctx(p, q, s.H, s.types, img, nbrs,
                                        s.gid, amask, ffd))
timeit("nb_ctx", lambda: ctx(s.pos, s.q))
ctxv = ctx(s.pos, s.q)

nbf = jax.jit(lambda c, q: reax.nonbond_tbl_energy_forces(c, q, s.types,
                                                          amask, ffd))
timeit("nonbond tbl e+f", lambda: nbf(ctxv, s.q))

bofn = jax.jit(lambda p: reax.bond_order(p, s.H, s.types, img, nbrs, ffd))
timeit("bond_order fwd", lambda: bofn(s.pos))
bov = bofn(s.pos)

lpv = reax.lone_pair(s.types, bov.delta, ffd)

eb = jax.jit(lambda b: reax.e_bond(s.types, img, nbrs, b, s.gid, amask, ffd))
timeit("e_bond fwd", lambda: eb(bov))

el = jax.jit(lambda b: reax.e_lnpr(
    s.types, img, nbrs, b, reax.lone_pair(s.types, b.delta, ffd), amask, ffd))
timeit("e_lnpr fwd", lambda: el(bov))

e3 = jax.jit(lambda p, b: reax.e_3body(
    p, s.H, s.types, img, nbrs, b, reax.lone_pair(s.types, b.delta, ffd),
    amask, ffd, cap=caps["ang"], ks=caps["ks"]))
timeit("e_3body fwd", lambda: e3(s.pos, bov))

e4 = jax.jit(lambda p, b: reax.e_4body(
    p, s.H, s.types, img, nbrs, b, amask, s.gid, ffd, cap=caps["tor"],
    ks=caps["ks"]))
timeit("e_4body fwd", lambda: e4(s.pos, bov))

ehb = jax.jit(lambda p, b, c: reax.e_hbond(
    p, s.H, s.types, img, nbrs, b, amask, ffd, cap=caps["hb"],
    kh=caps["kh"], ctx=c))
timeit("e_hbond fwd", lambda: ehb(s.pos, bov, ctxv))

# bonded grad (everything except nonbond)
def ebonded(p):
    c = reax.energy_components(p, s.q, s.H, s.types, s.gid, img, nbrs, ffd,
                               amask, caps, include_nonbond=False, ctx=ctxv)
    return c[0]
gb = jax.jit(jax.grad(ebonded))
timeit("bonded grad", lambda: gb(s.pos))
ebf = jax.jit(ebonded)
timeit("bonded fwd", lambda: ebf(s.pos))
