import numpy as np, jax, jax.numpy as jnp
from rxmd_tpu import ffield, system, md
from rxmd_tpu.config import RunConfig
ff = ffield.parse_ffield("/root/reference/ffield")
st = system.from_cellfile("/root/reference/conf/init.rdx/input.xyz", ff.name_to_type, mc=(2,2,2), dtype=jnp.float32)
cfg = RunConfig(mdmode=1, dt_fs=0.25, isQEq=2, dtype="float32")
eng = md.Engine(ff, st, cfg, dtype=jnp.float32)
eng.prepare()
def chk(tag):
    s = eng.state
    print(tag, "PE/atom %.4f"%(float(eng.comps[0])/st.n),
          "nan f:", bool(jnp.isnan(eng.force).any()),
          "nan q:", bool(jnp.isnan(s.q).any()),
          "nan v:", bool(jnp.isnan(s.vel).any()),
          "max|q| %.3f"%float(jnp.abs(s.q).max()),
          "max|qsfp| %.3f"%float(jnp.abs(s.qsfp).max()),
          "maxT %.1f"%(float((eng.hmas[s.types]*(s.vel**2).sum(1)).max())*335.6), flush=True)
chk("prep")
for k in range(12):
    eng.run(1, log=None)
    chk("step%d"%(k+1))
