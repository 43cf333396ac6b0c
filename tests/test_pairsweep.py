"""Pallas cell-column pair sweep vs the ELL reference implementation.

The kernel runs in interpreter mode on CPU here; the math must match the
independent (n, knb) closed-form path at f32 accuracy on the RDX deck.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rxmd_tpu import ffield, system, neighbors, reax, units
from rxmd_tpu.ops import pairsweep

FF = "/root/reference/ffield"
CELL = "/root/reference/conf/init.rdx/input.xyz"


@pytest.fixture(scope="module")
def setup():
    dtype = jnp.float32
    ff = ffield.parse_ffield(FF)
    st = system.from_cellfile(CELL, ff.name_to_type, mc=(2, 2, 2),
                              dtype=dtype)
    ffd = reax.ffdev_from(ff, dtype=dtype)
    img = neighbors.make_image_table(
        st.n, neighbors.nimg_for_cutoff(np.asarray(st.H), units.RCTAP0),
        dtype)
    nbrs = neighbors.build_neighbors_brute(
        st.pos, st.H, st.types, img, ffd.rc2b, ffd.rctap2, 20, 768)
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.normal(scale=0.1, size=st.n), dtype)
    q = q - q.mean()

    grid = pairsweep.make_pair_grid(np.asarray(st.H), units.RCTAP0,
                                    skin=0.3, ccap=8)
    pose = neighbors.ext_positions(st.pos, st.H, img)
    valid = jnp.ones(pose.shape[0], bool)
    sm = pairsweep.bin_slots(pose, valid, grid, st.n)
    assert int(sm.overflow) <= grid.ccap, int(sm.overflow)
    assert int(sm.slot_of_atom.min()) >= 0
    return ff, st, ffd, img, nbrs, q, grid, sm, pose


def test_slot_binning_roundtrip(setup):
    """Every primary atom's slot holds that atom's ext row."""
    _, st, _, img, _, _, grid, sm, pose = setup
    src = np.asarray(sm.slot_src)
    soa = np.asarray(sm.slot_of_atom)
    assert (src[soa] == np.arange(st.n)).all()
    # padded slots are -1; filled slots reference valid ext rows (images
    # beyond the region margin are dropped by design)
    filled = src >= 0
    assert st.n <= filled.sum() <= pose.shape[0]


def test_nonbond_sweep_matches_ell(setup):
    ff, st, ffd, img, nbrs, q, grid, sm, pose = setup
    n = st.n
    dtype = jnp.float32
    amask = jnp.ones(n, bool)
    ctx = reax.nb_ctx(st.pos, q, st.H, st.types, img, nbrs,
                      st.gid, amask, ffd)
    evdw_r, eclmb_r, echg_r, f_r, w_r = reax.nonbond_cf_energy_forces(
        ctx, q, st.types, amask, ffd, with_virial=True, img=img)

    # pack: x y z type gid q  (gid of ext rows = owner's gid)
    own = np.asarray(img.owner)
    cols = [pose[:, 0], pose[:, 1], pose[:, 2],
            st.types[img.owner].astype(dtype),
            st.gid[img.owner].astype(dtype),
            jnp.tile(q, img.n_images)]
    packed = pairsweep.pack_slots(sm.slot_src, cols)
    pair_fn, out_k, consts = pairsweep.make_nonbond_pair_fn(
        ffd, ffd.cf_pair.shape[0], float(ffd.rctap2))
    out = pairsweep._sweep(grid, packed, pair_fn, out_k, consts=consts,
                           interpret=True)
    rows = pairsweep.gather_rows(grid, out, sm.slot_of_atom)  # (11, n)

    evdw_k = float(rows[0].sum())
    eclmb_k = float(rows[1].sum())
    f_k = np.asarray(rows[2:5]).T
    w_k = np.asarray(rows[5:11].sum(axis=1))

    assert abs(evdw_k - float(evdw_r)) < 2e-3 * abs(float(evdw_r))
    assert abs(eclmb_k - float(eclmb_r)) < 2e-3 * max(1.0, abs(float(eclmb_r)))
    fr = np.asarray(f_r)
    scale = np.abs(fr).max()
    assert np.abs(f_k - fr).max() < 2e-4 * scale, np.abs(f_k - fr).max()
    # virial channels vs the ELL pair virial (xx,yy,zz,yz,zx,xy)
    wr = np.asarray(w_r)
    wr6 = np.array([wr[0, 0], wr[1, 1], wr[2, 2], wr[1, 2], wr[2, 0],
                    wr[0, 1]])
    assert np.abs(w_k - wr6).max() < 2e-3 * max(1.0, np.abs(wr6).max())


def test_qeq_sweep_matches_ell(setup):
    ff, st, ffd, img, nbrs, q, grid, sm, pose = setup
    n = st.n
    dtype = jnp.float32
    amask = jnp.ones(n, bool)
    rng = np.random.default_rng(3)
    hs = jnp.asarray(rng.normal(size=n), dtype)
    ht = jnp.asarray(rng.normal(size=n), dtype)

    # ELL reference: hessian rows + matvec + est pair sum
    ctx = reax.nb_ctx(st.pos, None, st.H, st.types, img, nbrs, st.gid,
                      amask, ffd)
    in_range = ctx.mask & (ctx.dr2 < ffd.rctap2)
    hess = reax.cf_qeq_kernel(ctx.dr2, reax.ctx_prm(ctx, st.types, ffd),
                              ffd, in_range)
    oj = img.owner_of(ctx.idx)
    mask = nbrs.masknb
    hz = jnp.where(mask, hess, 0.0)
    mv_hs = jnp.einsum("nk,nk->n", hz, jnp.where(mask, hs[oj], 0.0))
    mv_ht = jnp.einsum("nk,nk->n", hz, jnp.where(mask, ht[oj], 0.0))
    idxnb = jnp.where(mask, nbrs.idxnb, 0)
    estw = jnp.where(idxnb < n, 1.0, 0.5)
    est = jnp.einsum("nk,nk->n", estw * hz, jnp.where(mask, q[oj], 0.0))

    S = img.n_images
    cols = [pose[:, 0], pose[:, 1], pose[:, 2],
            st.types[img.owner].astype(dtype),
            (jnp.arange(pose.shape[0]) < n).astype(dtype),  # is_primary
            jnp.tile(hs, S), jnp.tile(ht, S), jnp.tile(q, S)]
    packed = pairsweep.pack_slots(sm.slot_src, cols)
    pair_fn, out_k, consts = pairsweep.make_qeq_pair_fn(
        ffd, ffd.cf_pair.shape[0], float(ffd.rctap2))
    out = pairsweep._sweep(grid, packed, pair_fn, out_k, consts=consts,
                           interpret=True)
    rows = pairsweep.gather_rows(grid, out, sm.slot_of_atom)

    for got, want, name in ((rows[0], mv_hs, "H hs"), (rows[1], mv_ht,
                            "H ht"), (rows[2], est, "est")):
        g = np.asarray(got)
        w = np.asarray(want)
        scale = max(1.0, np.abs(w).max())
        assert np.abs(g - w).max() < 3e-4 * scale, (
            name, np.abs(g - w).max(), scale)
