"""Multi-chip dry run: one full sharded MD step on an n-device mesh.

Used by __graft_entry__.dryrun_multichip — the driver runs this with N
virtual CPU devices to validate that the full training step (spatial domain
decomposition + halo exchange + QEq psum + grad-through-ppermute forces +
migration) compiles and executes without N physical chips.
"""
import numpy as np


def run(n_devices: int) -> None:
    import jax
    if len(jax.devices()) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, have {len(jax.devices())} "
            "(set XLA_FLAGS=--xla_force_host_platform_device_count=N)")
    import jax.numpy as jnp
    from rxmd_tpu import ffield, system
    from rxmd_tpu.config import RunConfig
    from rxmd_tpu.parallel.engine import ShardedEngine, factor_mesh

    mesh_shape = factor_mesh(n_devices)
    # replicate the RDX cell so each subdomain is wider than the ghost skin
    ff = ffield.parse_ffield("/root/reference/ffield")
    from rxmd_tpu.ffield import effective_maxrc
    # choose replication so local box >= skin on every axis
    base = np.array([13.18, 11.57, 10.71])
    skin = max(3 * 3.16, 10.0) + 0.3      # match ShardedEngine's skin rule
    mc = tuple(int(np.ceil(skin * m / b)) for m, b in zip(mesh_shape, base))
    st = system.from_cellfile("/root/reference/conf/init.rdx/input.xyz",
                              ff.name_to_type, mc=mc, dtype=jnp.float32)
    cfg = RunConfig(mdmode=1, dt_fs=0.25, isQEq=2, qstep=1, dtype="float32")
    eng = ShardedEngine(ff, st, cfg, mesh_shape=mesh_shape,
                        devices=jax.devices()[:n_devices])
    comps = eng.prepare()
    eng.run(1)
    pe = float(eng.comps[0]) / st.n
    ke = float(eng.ke) / st.n
    print(f"dryrun ok: mesh={mesh_shape} atoms={st.n} "
          f"PE/atom={pe:.4f} KE/atom={ke:.3e} nqeq={int(eng.nqeq)}")
    assert np.isfinite(pe)
