import time, numpy as np
import jax, jax.numpy as jnp
from rxmd_tpu import ffield, system, neighbors, reax, qeq, units, md
from rxmd_tpu.config import RunConfig

ff = ffield.parse_ffield("/root/reference/ffield")
st = system.from_cellfile("/root/reference/conf/init.rdx/input.xyz", ff.name_to_type, mc=(3,3,3), dtype=jnp.float32)
cfg = RunConfig(mdmode=1, dt_fs=0.25, isQEq=2, dtype="float32")
t0=time.time()
eng = md.Engine(ff, st, cfg, dtype=jnp.float32)
print("engine init", time.time()-t0, "kb/knb", eng.kb, eng.knb, "caps", eng.caps, flush=True)
s = eng.state
img = eng.img
ffd = eng.ffd
caps = eng.caps

nbrs_sk = jax.jit(lambda p: eng._build_nbrs(p, s.H, s.types))(s.pos)
jax.block_until_ready(nbrs_sk)
nbrs = nbrs_sk

def timeit(name, fn, *a, n=10):
    f = jax.jit(fn)
    r = f(*a); jax.block_until_ready(r)
    t0=time.time()
    for _ in range(n): r = f(*a)
    jax.block_until_ready(r)
    print(f"{name}: {(time.time()-t0)/n*1000:7.1f} ms", flush=True)
    return r

bo = timeit("bond_order fwd", lambda p: reax.bond_order(p, s.H, s.types, img, nbrs, ffd), s.pos)
amask = jnp.ones(s.pos.shape[0], bool)
lp = reax.lone_pair(s.types, bo.delta, ffd)
timeit("e_bond+lnpr fwd", lambda p: (reax.e_bond(s.types, img, nbrs, bo, s.gid, amask, ffd),
                                     reax.e_lnpr(s.types, img, nbrs, bo, lp, amask, ffd)), s.pos)
timeit("e_3body fwd", lambda p: reax.e_3body(p, s.H, s.types, img, nbrs, bo, lp, amask, ffd, cap=caps["ang"], ks=caps["ks"]), s.pos)
timeit("e_4body fwd", lambda p: reax.e_4body(p, s.H, s.types, img, nbrs, bo, amask, s.gid, ffd, cap=caps["tor"], ks=caps["ks"]), s.pos)
ctx = jax.jit(lambda p: reax.nb_ctx(p, s.q, s.H, s.types, img, nbrs, s.gid, amask, ffd))(s.pos)
timeit("nb_ctx build", lambda p: reax.nb_ctx(p, s.q, s.H, s.types, img, nbrs, s.gid, amask, ffd), s.pos)
timeit("e_hbond fwd (ctx)", lambda p: reax.e_hbond(p, s.H, s.types, img, nbrs, bo, amask, ffd, cap=caps["hb"], kh=caps["kh"], ctx=ctx), s.pos)
timeit("nonbond tbl fwd", lambda p: reax.nonbond_tbl_energy_forces(ctx, s.q, s.types, amask, ffd), s.pos)
timeit("nonbond cf fwd", lambda p: reax.nonbond_cf_energy_forces(ctx, s.q, s.types, amask, ffd), s.pos)
timeit("qeq exL", lambda p: qeq.solve(p, s.q, s.qsfp, s.H, s.types, img, nbrs, ffd, isqeq=2, nmax=1).q, s.pos)
timeit("energy_and_forces", lambda p: reax.energy_and_forces(p, s.q, s.H, s.types, s.gid, img, nbrs, ffd, caps=caps), s.pos)
timeit("fwd bonded-only", lambda p: reax.energy_components(p, s.q, s.H, s.types, s.gid, img, nbrs, ffd, caps=caps, include_nonbond=False), s.pos)
timeit("grad bonded-only", lambda p: jax.grad(lambda pp: reax.energy_components(pp, s.q, s.H, s.types, s.gid, img, nbrs, ffd, caps=caps, include_nonbond=False)[0])(p), s.pos)
