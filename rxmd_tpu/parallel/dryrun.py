"""Multi-chip dry run: one full sharded MD step on an n-device mesh.

Used by __graft_entry__.dryrun_multichip — the driver runs this with N
virtual CPU devices to validate that the full training step (spatial domain
decomposition + halo exchange + QEq psum + grad-through-ppermute forces +
migration) compiles and executes without N physical chips.

Design constraints (learned from round 1, where the full-physics dryrun was
killed on timeout): virtual CPU devices timeshare a couple of host cores, so
the dryrun must be TINY — reduced cutoffs (rctap=5 A instead of 10,
one bonded ghost layer instead of three), the single 168-atom RDX cell, and
ONE compiled program (no separate prepare: the first step starts from zero
force, exercising the identical step graph).  Exact-physics multi-device
validation lives in tests/test_parallel.py (2-device golden match, the
analog of the reference's examples/2-reaxff-dc check).
"""
import time

import numpy as np


def run(n_devices: int) -> None:
    t0 = time.time()
    import os
    import jax
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        # honor a cpu request even when the environment's sitecustomize
        # force-registers an accelerator backend (it stomps the env var;
        # the config route wins if no backend is initialized yet)
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    if len(jax.devices()) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, have {len(jax.devices())} "
            "(set XLA_FLAGS=--xla_force_host_platform_device_count=N)")
    import jax.numpy as jnp
    from rxmd_tpu import ffield, system
    from rxmd_tpu.config import RunConfig
    from rxmd_tpu.parallel.engine import ShardedEngine, factor_mesh

    mesh_shape = factor_mesh(n_devices)
    # FULL physics: mc=(2,2,2) RDX so every local box exceeds the complete
    # ghost skin (taper rctap=10 A + 3-layer bonded dependency chain) on a
    # 2x2x2 mesh — the same configuration the value-parity test drives
    # (tests/test_sharded_product.py::test_2x2x2_full_physics...); ref
    # transitive-corner forwarding comm.F90:282-287
    ff = ffield.parse_ffield("/root/reference/ffield")
    st = system.from_cellfile("/root/reference/conf/init.rdx/input.xyz",
                              ff.name_to_type, mc=(2, 2, 2),
                              dtype=jnp.float32)
    # extended-Lagrangian charges (isQEq=2): one CG iteration per step —
    # the reference's scaling configuration (conf/bg-bench/rxmd.in)
    cfg = RunConfig(mdmode=1, dt_fs=0.25, isQEq=2, qstep=1, dtype="float32")
    eng = ShardedEngine(ff, st, cfg, mesh_shape=mesh_shape,
                        devices=jax.devices()[:n_devices])
    assert eng.skin > 10.0, eng.skin      # full physics, not a reduced deck
    print(f"[dryrun +{time.time()-t0:.0f}s] engine built: mesh={mesh_shape} "
          f"atoms={st.n} ncap={eng.ncap} mext={eng.mext} "
          f"skin={eng.skin:.1f}", flush=True)
    # prepare = the cold-start full CG charge solve + first force
    # (ref: main.F90:27-32), then one full MD step — charges are
    # converged, so the PE value check below is meaningful
    eng.prepare()
    print(f"[dryrun +{time.time()-t0:.0f}s] prepared: "
          f"PE/atom={float(eng.comps[0])/st.n:.4f}", flush=True)
    eng.run(1)
    pe = float(eng.comps[0]) / st.n
    ke = float(eng.ke) / st.n
    n_after = eng.n_atoms
    print(f"[dryrun +{time.time()-t0:.0f}s] step done: PE/atom={pe:.4f} "
          f"KE/atom={ke:.3e} nqeq={int(eng.nqeq)} atoms={n_after}",
          flush=True)
    assert np.isfinite(pe), "non-finite energy"
    assert np.isfinite(ke), "non-finite kinetic energy"
    assert n_after == st.n, f"atom count changed: {n_after} != {st.n}"
    # VALUE check, not just finiteness: the RDX lattice PE/atom after one
    # cold step must match the golden trace (ref README.md:156-159:
    # PE/atom = -98.247 at step 0; one 0.25 fs step shifts it < 0.01)
    assert abs(pe + 98.247) < 0.05, pe
