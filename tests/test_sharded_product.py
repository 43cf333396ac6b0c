"""Sharded-engine product surface: CLI vprocs wiring, 1-vs-2-device
trajectory match, thermostats on the sharded path, overflow traps,
gather-to-host output (VERDICT r1 items 3/5/6)."""
import dataclasses
import os
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rxmd_tpu import ffield, system, md
from rxmd_tpu.config import RunConfig
from rxmd_tpu.parallel.engine import ShardedEngine

FF = "/root/reference/ffield"
CELL = "/root/reference/conf/init.rdx/input.xyz"


@pytest.mark.slow
def test_two_device_trajectory_matches_single(tmp_path):
    """3 NVE steps with full QEq: the 2-device domain-decomposed
    trajectory matches the single-device engine (the reference's
    examples/2-reaxff-dc check, Makefile:5)."""
    ff = ffield.parse_ffield(FF)
    st = system.from_cellfile(CELL, ff.name_to_type, mc=(2, 1, 1))
    # qeq_dense_max=0 forces the single-device engine onto the same ELL
    # matvec the sharded path uses.  QEq termination tests the electrostatic
    # energy Est, whose pair weights are decomposition-dependent by design
    # (resident vs ghost weighting, ref: qeq.F90:304-306), so the two
    # engines legitimately stop after different CG iteration counts; a
    # tight tolerance drives both to the same unique minimizer, making q
    # comparable to ~1e3x better than the tolerance-limited difference.
    cfg = RunConfig(mdmode=1, dt_fs=0.25, isQEq=1, QEq_tol=1e-11, qstep=1,
                    pstep=100, sstep=1000, qeq_dense_max=0)

    e1 = md.Engine(ff, st, cfg)
    e1.prepare()
    e1.run(3, log=None)
    s1 = e1.state

    e2 = ShardedEngine(ff, st, cfg, mesh_shape=(2, 1, 1),
                       devices=jax.devices()[:2])
    e2.prepare()
    e2.run(3)
    s2 = e2.to_state()

    # gather ordering is by gid; engine order == gid order for this deck
    assert s2.n == s1.n
    assert np.array_equal(np.asarray(s2.gid), np.asarray(s1.gid))
    # positions: e1 drifts unwrapped, e2 wraps every step -> compare frac
    Hi = np.linalg.inv(np.asarray(st.H))
    f1 = (np.asarray(s1.pos) @ Hi.T) % 1.0
    f2 = (np.asarray(s2.pos) @ Hi.T) % 1.0
    d = np.abs(f1 - f2)
    d = np.minimum(d, 1.0 - d)                 # periodic distance
    assert d.max() < 2e-7
    assert np.abs(np.asarray(s1.q) - np.asarray(s2.q)).max() < 1e-7
    # pressure column: both engines accumulated 3 steps of kinetic+virial
    # stress; the sharded strain-grad virial must match the single-device
    # one (ref stress accumulation: main.F90:86-94 + pot.F90:65-72)
    p1 = e1.pressure_gpa(reset=False)
    p2 = e2.pressure_gpa(reset=False)
    assert abs(p1 - p2) < 5e-3 * max(1.0, abs(p1))
    line = e2.printe_line()
    assert "MDstep:" in line and len(line.split()) == 15


@pytest.mark.slow
def test_2x2x2_full_physics_matches_single():
    """mc=(2,2,2) RDX on a 2x2x2 mesh with FULL physics (rctap=10,
    3-layer bonded ghost skin): the first correct-VALUE check of y/z-axis
    halos and transitive corner forwarding (ref: comm.F90:282-287,
    examples/2-reaxff-dc is the x-only analog).  2 NVE steps with
    extended-Lagrangian charges; trajectory must match single device."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    ff = ffield.parse_ffield(FF)
    st = system.from_cellfile(CELL, ff.name_to_type, mc=(2, 2, 2))
    # tight tol: the cold-start seed solve (isQEq=2 prepare) must converge
    # to the unique minimizer on both engines (Est termination weights are
    # decomposition-dependent, see test_two_device_trajectory...)
    cfg = RunConfig(mdmode=1, dt_fs=0.25, isQEq=2, qstep=1, QEq_tol=1e-12,
                    pstep=100, sstep=1000, qeq_dense_max=0)

    e1 = md.Engine(ff, st, cfg)
    e1.prepare()
    e1.run(2, log=None)
    s1 = e1.state

    e2 = ShardedEngine(ff, st, cfg, mesh_shape=(2, 2, 2),
                       devices=jax.devices()[:8])
    # full physics: the defaults (rctap=10, skin_layers=3) must fit —
    # assert we are NOT on a reduced-physics configuration
    assert e2.skin > 10.0
    e2.prepare()
    e2.run(2)
    s2 = e2.to_state()

    assert s2.n == s1.n
    assert np.array_equal(np.asarray(s2.gid), np.asarray(s1.gid))
    Hi = np.linalg.inv(np.asarray(st.H))
    f1 = (np.asarray(s1.pos) @ Hi.T) % 1.0
    f2 = (np.asarray(s2.pos) @ Hi.T) % 1.0
    d = np.abs(f1 - f2)
    d = np.minimum(d, 1.0 - d)
    assert d.max() < 5e-9, d.max()
    assert np.abs(np.asarray(s1.q) - np.asarray(s2.q)).max() < 1e-9
    # energies agree (isQEq=2 is deterministic: exactly 1 CG iter/step)
    c1 = np.asarray(e1.comps) / st.n
    c2 = np.asarray(e2.comps) / st.n
    assert np.abs(c1 - c2).max() < 5e-9, np.abs(c1 - c2).max()


def test_sharded_thermostat_mdmode5():
    """mdmode=5 velocity rescale on the sharded path hits treq exactly."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    from rxmd_tpu import units
    ff = ffield.parse_ffield(FF)
    st = system.from_cellfile(CELL, ff.name_to_type, mc=(2, 1, 1),
                              dtype=jnp.float64)
    cfg = RunConfig(mdmode=5, dt_fs=0.25, isQEq=0, treq=300.0, sstep=1,
                    pstep=100)
    eng = ShardedEngine(ff, st, cfg, mesh_shape=(2, 1, 1),
                        devices=jax.devices()[:2])
    rng = np.random.default_rng(7)
    v = rng.normal(size=eng.sstate.vel.shape) * 1e-3
    v[~np.asarray(eng.sstate.valid)] = 0.0
    eng.sstate = eng.sstate._replace(vel=jnp.asarray(v, eng.dtype))
    eng.force = jnp.zeros_like(eng.sstate.vel)
    eng.comps = jnp.zeros(14, eng.dtype)
    eng.nqeq = jnp.int32(0)
    eng.run(1)
    # after the rescale at step 0 the pre-kick KE corresponds to treq;
    # with zero charge and one force step T stays within a few % of treq
    t = float(eng.ke) / st.n * units.UTEMP
    assert abs(t - 300.0) / 300.0 < 0.05


def test_migration_overflow_trap():
    """Deliberately tiny mcap: mass migration must raise, not drop atoms
    (ref: comm.F90:467-472)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    ff = ffield.parse_ffield(FF)
    st = system.from_cellfile(CELL, ff.name_to_type, mc=(2, 1, 1))
    cfg = RunConfig(mdmode=1, dt_fs=0.25, isQEq=0, pstep=100, sstep=1000)
    eng = ShardedEngine(ff, st, cfg, mesh_shape=(2, 1, 1),
                        devices=jax.devices()[:2], mcap=2)
    eng.prepare()
    # teleport many device-0 atoms into device 1's half-box
    ss = eng.sstate
    frac = np.asarray(ss.frac).copy()
    valid = np.asarray(ss.valid)
    ncap = eng.ncap
    sel = np.where(valid[:ncap])[0][:8]
    frac[sel, 0] = 0.75
    eng.sstate = ss._replace(frac=jnp.asarray(frac, eng.dtype))
    # migration runs on the rebuild cadence (the step reuses the saved
    # halo plan); the trap must fire on the next rebuild
    with pytest.raises(RuntimeError, match="migration buffer overflow"):
        eng.rebuild()


def test_cli_vprocs_two_devices(tmp_path):
    """`python -m rxmd_tpu` with processors 2 1 1 runs end-to-end on two
    virtual devices and writes gathered output (VERDICT r1 item 6)."""
    outdir = tmp_path / "DAT"
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=2")
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)   # keep the axon TPU plugin out
    r = subprocess.run(
        [sys.executable, "-m", "rxmd_tpu",
         "--rxmdin", "/dev/null",
         "--ffield", FF, "--run_from_xyz", CELL,
         "--mc", "2", "1", "1",
         "--ntime_step", "2", "--pstep", "1", "--qstep", "1",
         "--isQEq", "2", "--dtype", "float32",
         "--vprocs", "2", "1", "1",
         "--outDir", str(outdir)],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "MDstep:" in r.stdout
    assert "successfully finished" in r.stdout
    assert (outdir / "rxff.npz").exists()
    assert (outdir / "rxff.bin").exists()


@pytest.mark.slow
def test_sharded_mdmode6_matches_single():
    """mdmode 6 (periodic Maxwell-Boltzmann redraw, ref: main.F90:53-54 +
    INITVELOCITY init.F90:292-360): the sharded redraw is gid-deterministic
    and the 2-device trajectory matches single-device bit-for-bit in f64."""
    ff = ffield.parse_ffield(FF)
    st = system.from_cellfile(CELL, ff.name_to_type, mc=(2, 1, 1))
    cfg = RunConfig(mdmode=6, dt_fs=0.25, isQEq=2, qstep=1, QEq_tol=1e-12,
                    treq=300.0, sstep=2, pstep=100, qeq_dense_max=0)

    e1 = md.Engine(ff, st, cfg)
    e1.run(3, log=None)
    s1 = e1.state

    e2 = ShardedEngine(ff, st, cfg, mesh_shape=(2, 1, 1),
                       devices=jax.devices()[:2])
    e2.run(3)
    s2 = e2.to_state()

    Hi = np.linalg.inv(np.asarray(st.H))
    f1 = (np.asarray(s1.pos) @ Hi.T) % 1.0
    f2 = (np.asarray(s2.pos) @ Hi.T) % 1.0
    d = np.abs(f1 - f2)
    d = np.minimum(d, 1.0 - d)
    assert d.max() < 5e-9, d.max()
    assert np.abs(np.asarray(s1.vel) - np.asarray(s2.vel)).max() < 1e-9


@pytest.mark.slow
def test_sharded_cg_optimizer_matches_single():
    """mdmode 10 on the sharded engine: the CG loop drives the sharded
    evaluator (EvaluateEnergyWithStep analog, ref: cg.F90:358-387) with
    direction vectors migrating across the mesh (MigrateVec3D,
    ref: cg.F90:292-314); energies track the single-device optimizer."""
    from rxmd_tpu import opt
    ff = ffield.parse_ffield(FF)
    st = system.from_cellfile(CELL, ff.name_to_type, mc=(2, 1, 1))
    rng = np.random.default_rng(3)
    st = dataclasses.replace(
        st, pos=st.pos + jnp.asarray(rng.normal(0, 0.03, (st.n, 3))))
    cfg = RunConfig(mdmode=10, dt_fs=0.25, isQEq=1, QEq_tol=1e-11,
                    qeq_dense_max=0)

    e1 = md.Engine(ff, st, cfg)
    pe1 = opt.conjugate_gradient(e1, max_iter=2, ftol=1e-12, log=None)

    e2 = ShardedEngine(ff, st, cfg, mesh_shape=(2, 1, 1),
                       devices=jax.devices()[:2])
    pe2 = opt.conjugate_gradient(e2, max_iter=2, ftol=1e-12, log=None)

    # both minimized the same surface with the same line search
    assert pe2 < float(e2.state0.n) * -90.0        # sane magnitude
    assert abs(pe1 - pe2) < 1e-5 * abs(pe1), (pe1, pe2)


def test_cg_rejects_unknown_engine():
    from rxmd_tpu import opt
    with pytest.raises(TypeError):
        opt.conjugate_gradient(object(), log=None)


@pytest.mark.slow
def test_slab_writers_match_gathered(tmp_path):
    """Per-process slab output (the MPI-IO offsets analog, ref:
    fileio.F90:81-95): byte-identical xyz and a reference-format bin that
    reads back to the same state — without gathering positions."""
    from rxmd_tpu.io import traj, refbin
    ff = ffield.parse_ffield(FF)
    st = system.from_cellfile(CELL, ff.name_to_type, mc=(2, 1, 1))
    cfg = RunConfig(mdmode=1, dt_fs=0.25, isQEq=2, qstep=1,
                    qeq_dense_max=0)
    eng = ShardedEngine(ff, st, cfg, mesh_shape=(2, 1, 1),
                        devices=jax.devices()[:2])
    eng.prepare()
    eng.run(1)

    d = str(tmp_path)
    # serial (gathered) writers as ground truth
    stg = eng.to_state()
    traj.write_xyz(d + "/ref.xyz", stg, ff.atom_names)
    eng.write_frame_slab(d + "/slab")  # cfg.is_xyz/is_binary default True?
    from rxmd_tpu.io import slab as slab_mod
    slab_mod.write_xyz_slab(d + "/slab.xyz", eng)
    slab_mod.write_bin_slab(d + "/slab.bin", eng)

    assert open(d + "/ref.xyz", "rb").read() == \
        open(d + "/slab.xyz", "rb").read()

    st2, meta = refbin.read_rxff_bin(d + "/slab.bin")
    assert meta["nprocs"] == 2 and st2.n == st.n
    order = np.argsort(np.asarray(st2.gid))
    dpos = np.abs(np.asarray(st2.pos)[order] - np.asarray(stg.pos))
    L = np.diag(np.asarray(st.H))
    dpos = np.minimum(dpos, L - dpos)
    assert dpos.max() < 1e-9
    assert np.abs(np.asarray(st2.q)[order] - np.asarray(stg.q)).max() < 1e-9
