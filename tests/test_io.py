"""I/O round-trip tests: reference rxff.bin format, native checkpoint,
trajectory writers."""
import os

import numpy as np

from rxmd_tpu import ffield, system
from rxmd_tpu.io import refbin, checkpoint, traj

FF = "/root/reference/ffield"
CELL = "/root/reference/conf/init.rdx/input.xyz"


def _state():
    ff = ffield.parse_ffield(FF)
    st = system.from_cellfile(CELL, ff.name_to_type)
    rng = np.random.default_rng(1)
    import dataclasses
    import jax.numpy as jnp
    return ff, dataclasses.replace(
        st,
        vel=jnp.asarray(rng.normal(size=(st.n, 3)) * 1e-3),
        q=jnp.asarray(rng.normal(size=st.n) * 0.1),
        qsfp=jnp.asarray(rng.normal(size=st.n) * 0.1),
        qsfv=jnp.asarray(rng.normal(size=st.n) * 0.01))


def test_refbin_roundtrip(tmp_path):
    ff, st = _state()
    path = str(tmp_path / "rxff.bin")
    refbin.write_rxff_bin(path, st)
    st2, meta = refbin.read_rxff_bin(path)
    assert meta["nprocs"] == 1
    assert st2.n == st.n
    assert np.allclose(np.asarray(st2.pos), np.asarray(st.pos), atol=1e-9)
    assert np.allclose(np.asarray(st2.vel), np.asarray(st.vel))
    assert np.allclose(np.asarray(st2.q), np.asarray(st.q))
    assert np.allclose(np.asarray(st2.qsfp), np.asarray(st.qsfp))
    assert (np.asarray(st2.types) == np.asarray(st.types)).all()
    assert (np.asarray(st2.gid) == np.asarray(st.gid)).all()


def test_atype_encoding():
    t0 = np.array([0, 1, 2, 3], np.int32)
    gid = np.array([0, 7, 123456, 99999], np.int32)
    enc = refbin.encode_atype(t0, gid)
    t1, g1 = refbin.decode_atype(enc)
    assert (t0 == t1).all() and (gid == g1).all()


def test_checkpoint_roundtrip(tmp_path):
    ff, st = _state()
    path = str(tmp_path / "ck.npz")
    checkpoint.save(path, st)
    st2 = checkpoint.load(path)
    assert np.allclose(np.asarray(st2.pos), np.asarray(st.pos))
    assert np.allclose(np.asarray(st2.qsfv), np.asarray(st.qsfv))
    assert int(st2.step) == int(st.step)


def test_xyz_roundtrip(tmp_path):
    ff, st = _state()
    path = str(tmp_path / "t.xyz")
    traj.write_xyz(path, st, ff.atom_names)
    frames = list(traj.read_xyz_frames(path, ff.name_to_type))
    assert len(frames) == 1
    f = frames[0]
    assert np.allclose(f["pos"], np.asarray(st.pos), atol=1e-5)
    assert (f["types"] == np.asarray(st.types)).all()
    assert np.allclose(f["cell"][:3], [13.18, 11.57, 10.71], atol=1e-3)
