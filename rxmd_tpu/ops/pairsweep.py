"""Gatherless nonbonded pair sweeps — the TPU-native cell-column kernel.

The reference's nonbonded hot loops (ENbond pot.F90:676-781, the QEq
hessian/matvec qeq.F90:183-318) walk per-atom neighbor lists.  The ELL
(n, knb) translation of that design is gather-bound on TPU: XLA's dynamic
gathers run at ~5-30 GB/s against an ~800 GB/s HBM.  This module replaces
the per-pair index arrays entirely:

  * atoms (owned + periodic images) are binned into a cell grid and packed
    into a fixed-capacity SLOT layout, sorted z-fastest so one (cx, cy)
    column of cells is CONTIGUOUS;
  * a Pallas kernel walks, for each block of target slots, the pruned 2-D
    column stencil; each neighbor candidate set is a contiguous z-window
    slab — a regular VMEM slice, not a gather;
  * pair candidates are evaluated as dense masked (C, W) tiles on the VPU,
    with per-pair type parameters produced by tiny one-hot matmuls on the
    MXU (rowOH @ P @ slabOH);
  * padded slots carry FAR coordinates and fail every cutoff naturally.

Pad-pair inflation (each tile evaluates ~10-20x more candidates than land
within the cutoff) is the deliberate TPU trade: dense regular arithmetic
beats irregular memory by a larger factor.

Layout is struct-of-arrays, shape (K, nslots): the lane dimension runs
along slots, so a slab is one tile-row per 128 slots.

Used for: the vdW+Coulomb energy/force/virial sweep (replacing
nonbond_cf/tbl_energy_forces' shared-context path) and the QEq matvec+Est
sweep inside the CG loop (replacing the (n, knb, 3) row gathers).
Validation paths (f64, reference-table interpolation) are unaffected.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import units


FAR = 1.0e4          # padded-slot coordinate sentinel: dr2 ~ 1e8 fails every
                     # cutoff and stays finite through every kernel


class PairGrid(NamedTuple):
    """Static geometry of the sweep (hashable; host-side setup).

    Alignment contract (Mosaic requires lane offsets provably divisible by
    128): a column's slot count nzc = nc[2]*ccap is a multiple of 128, the
    target z-offset zb_lo*ccap is a multiple of 128, target blocks are
    C = 128 slots, and windows are W slots (a multiple of 128) starting at
    down-rounded 128-aligned offsets with one extra 128-slot of slack.
    """
    lo: tuple            # region lower corner (3,)
    cellsize: tuple      # (3,)
    nc: tuple            # (nx, ny, nz) cells
    ccap: int            # slots per cell
    block_zc: int        # z-cells per target block (C = block_zc*ccap)
    wslots: int          # window size in slots (128-multiple)
    zreach: int          # z-cells of cutoff reach (window margin)
    cols: tuple          # pruned 2-D stencil (dx, dy) offsets
    tc_lo: tuple         # (cx, cy) of first target column
    tc_n: tuple          # number of target columns per axis
    zb_lo: int           # first target z-cell (multiple of block_zc)
    n_zb: int            # z-blocks per target column
    rc2: float           # (rctap + skin)^2 candidate cutoff

    @property
    def nslots(self) -> int:
        return self.nc[0] * self.nc[1] * self.nc[2] * self.ccap

    @property
    def C(self) -> int:
        return self.block_zc * self.ccap

    @property
    def W(self) -> int:
        return self.wslots

    @property
    def n_targets(self) -> int:
        return self.tc_n[0] * self.tc_n[1] * self.n_zb * self.C


def make_pair_grid(H, rctap: float, skin: float, ccap: int = 8,
                   cell_target: float = 3.0) -> PairGrid:
    """Build the sweep geometry for an orthogonal box H (diagonal).

    The region covers the primary box plus a margin of rctap+skin on every
    side (periodic images beyond it cannot interact with primary atoms).
    """
    H = np.asarray(H)
    L = np.diag(H).astype(float)
    if not np.allclose(H, np.diag(np.diag(H))):
        raise NotImplementedError("pair sweep requires an orthogonal box")
    rc = float(rctap) + float(skin)
    # margin: cutoff reach from the target region, which itself extends one
    # drift-slack cell past the primary box on every side
    margin = rc + 2.0 * cell_target + 1e-6
    lo = -margin * np.ones(3)
    ext = L + 2 * margin
    nc = np.maximum(np.round(ext / cell_target).astype(int), 3)
    cs = ext / nc

    # block size: 128 lanes worth of slots (ccap must divide 128)
    assert 128 % ccap == 0, ccap
    block_zc = 128 // ccap
    # fix the z cell size at the target; the region is then EXTENDED in z
    # (empty padding cells) so the column slot count is 128-aligned and a
    # window always fits inside one column
    cs[2] = ext[2] / max(int(np.round(ext[2] / cell_target)), 1)
    zreach = int(np.ceil(rc / cs[2])) + 1
    # window: target block + 2*reach, rounded up to 128 slots, + one extra
    # 128-slot for the down-rounding of the runtime window offset
    wslots = (-(-(block_zc + 2 * zreach) * ccap // 128)) * 128 + 128
    nz = int(np.ceil(ext[2] / cs[2]))
    nzc = max(-(-nz * ccap // 128) * 128, wslots)
    nc[2] = nzc // ccap
    # target z-cells: primary box plus one cell of drift slack each side;
    # aligned down to a block boundary
    zb_lo = int(np.floor((0 - lo[2]) / cs[2])) - 1
    zb_lo = (zb_lo // block_zc) * block_zc
    zb_hi = int(np.floor((L[2] - 1e-9 - lo[2]) / cs[2])) + 1
    n_zb = -(-(zb_hi - zb_lo + 1) // block_zc)

    # pruned 2-D column stencil: nearest xy-distance between columns <= rc
    reach_x = int(np.ceil(rc / cs[0]))
    reach_y = int(np.ceil(rc / cs[1]))
    cols = []
    for dx in range(-reach_x, reach_x + 1):
        for dy in range(-reach_y, reach_y + 1):
            ex = max(abs(dx) - 1, 0) * cs[0]
            ey = max(abs(dy) - 1, 0) * cs[1]
            if ex * ex + ey * ey <= rc * rc:
                cols.append((dx, dy))

    # target columns: those intersecting the primary box in xy, plus one
    # ring of drift slack
    tcx_lo = int(np.floor((0 - lo[0]) / cs[0])) - 1
    tcx_hi = int(np.floor((L[0] - 1e-9 - lo[0]) / cs[0])) + 1
    tcy_lo = int(np.floor((0 - lo[1]) / cs[1])) - 1
    tcy_hi = int(np.floor((L[1] - 1e-9 - lo[1]) / cs[1])) + 1
    # stencil reach must stay inside the grid for every target column
    assert tcx_lo - reach_x >= 0 and tcx_hi + reach_x < nc[0], (
        tcx_lo, tcx_hi, reach_x, nc[0])
    assert tcy_lo - reach_y >= 0 and tcy_hi + reach_y < nc[1]
    assert zb_lo >= 0

    return PairGrid(
        lo=tuple(lo), cellsize=tuple(cs), nc=tuple(int(x) for x in nc),
        ccap=int(ccap), block_zc=int(block_zc), wslots=int(wslots),
        zreach=int(zreach), cols=tuple(cols),
        tc_lo=(tcx_lo, tcy_lo),
        tc_n=(tcx_hi - tcx_lo + 1, tcy_hi - tcy_lo + 1),
        zb_lo=int(zb_lo), n_zb=int(n_zb), rc2=float(rc * rc))


class SlotMap(NamedTuple):
    """Per-rebuild product: where each extended atom lives in slot space."""
    slot_src: jax.Array      # (nslots,) ext row filling the slot, -1 pad
    slot_of_atom: jax.Array  # (n,) slot of each primary atom
    overflow: jax.Array      # () max per-cell occupancy (host-checked)


@functools.partial(jax.jit, static_argnames=("grid", "n"))
def bin_slots(pose, valid, grid: PairGrid, n: int) -> SlotMap:
    """Assign extended atoms to slots (sort by cell id, fixed capacity) —
    the cell-binning analog of LINKEDLIST (ref: main.F90:277-318), built on
    the rebuild cadence."""
    m = pose.shape[0]
    nc = np.array(grid.nc)
    ctot = int(np.prod(nc))
    lo = jnp.asarray(grid.lo, pose.dtype)
    cs = jnp.asarray(grid.cellsize, pose.dtype)
    rel = (pose - lo) / cs
    inside = valid & jnp.all((rel >= 0) & (rel < jnp.asarray(nc, pose.dtype)),
                             axis=1)
    cid3 = jnp.clip(rel.astype(jnp.int32), 0, jnp.asarray(nc - 1, jnp.int32))
    cid = (cid3[:, 0] * nc[1] + cid3[:, 1]) * nc[2] + cid3[:, 2]
    cid = jnp.where(inside, cid, ctot)
    order = jnp.argsort(cid)
    scid = cid[order]
    start = jnp.searchsorted(scid, jnp.arange(ctot + 1, dtype=scid.dtype))
    rank = jnp.arange(m, dtype=jnp.int32) - start[scid].astype(jnp.int32)
    slot_src = jnp.full((ctot * grid.ccap,), -1, jnp.int32)
    inb = (rank < grid.ccap) & (scid < ctot)
    dst = jnp.where(inb, scid * grid.ccap + rank, ctot * grid.ccap)
    slot_src = slot_src.at[dst].set(
        jnp.where(inb, order.astype(jnp.int32), -1), mode="drop")
    overflow = jnp.max(jnp.where(scid < ctot, rank + 1, 0))
    # primary atoms are ext rows < n and always inside the region
    slot_of_atom = jnp.full((n,), -1, jnp.int32)
    src = jnp.where(inb, order.astype(jnp.int32), m)
    take = inb & (src < n)
    slot_of_atom = slot_of_atom.at[jnp.where(take, src, n)].set(
        jnp.where(take, dst, -1), mode="drop")
    return SlotMap(slot_src=slot_src, slot_of_atom=slot_of_atom,
                   overflow=overflow)


def pack_slots(slot_src, cols, far_cols: int = 3):
    """Pack per-ext-atom columns into the (K, nslots) slot layout.
    `cols`: list of (m,) arrays.  The first `far_cols` (positions) get the
    FAR sentinel in padded slots; the rest get 0."""
    ok = slot_src >= 0
    src = jnp.where(ok, slot_src, 0)
    packed = jnp.stack([c[src] for c in cols], axis=0)
    fills = jnp.asarray([FAR] * far_cols + [0.0] * (len(cols) - far_cols),
                        packed.dtype)
    return jnp.where(ok[None, :], packed, fills[:, None])


def _target_tables(grid: PairGrid):
    """Prefetch arrays: per target column, its slot base and output block
    base; plus the static per-stencil column offsets."""
    nx, ny, nz = grid.nc
    ccap = grid.ccap
    nzc = nz * ccap
    cxs = np.arange(grid.tc_lo[0], grid.tc_lo[0] + grid.tc_n[0])
    cys = np.arange(grid.tc_lo[1], grid.tc_lo[1] + grid.tc_n[1])
    cx, cy = np.meshgrid(cxs, cys, indexing="ij")
    col_base = ((cx * ny + cy) * nz * ccap).reshape(-1).astype(np.int32)
    coloffs = np.asarray([(dx * ny + dy) * nz * ccap
                          for dx, dy in grid.cols], np.int32)
    return jnp.asarray(col_base), jnp.asarray(coloffs)


def _sweep(grid: PairGrid, packed, pair_fn, out_k: int, consts=(),
           interpret=False):
    """Run the generic column sweep.

    packed: (K, nslots) f32.  pair_fn(rows (K, C), slab (K, W), *consts) ->
    (out_k, C) partial row accumulators for this slab; summed over the
    stencil.  `consts` are small parameter arrays (type-pair matrices,
    taper coefficients) passed through VMEM.
    Returns (out_k, n_targets) where target t = (col p, z-block zb, slot c)
    maps to slot col_base[p] + (zb_lo + zb*block_zc)*ccap + c.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, W = grid.C, grid.W
    ncols = len(grid.cols)
    ccap = grid.ccap
    nzc = grid.nc[2] * ccap
    npc = grid.tc_n[0] * grid.tc_n[1]
    zoff0 = (grid.zb_lo - grid.zreach) * ccap
    zlo_rel = grid.zb_lo * ccap

    col_base, coloffs = _target_tables(grid)

    def kernel(cb_ref, co_ref, packed_ref, *rest):
        out_ref = rest[-1]
        const_refs = rest[:-1]
        cvals = [r[:] for r in const_refs]
        p = pl.program_id(0)
        zb = pl.program_id(1)
        base = cb_ref[p]
        tstart = pl.multiple_of(base + zlo_rel + zb * C, 128)
        rows = packed_ref[:, pl.ds(tstart, C)]

        def body(s, acc):
            nb = base + co_ref[s]
            # down-round to a 128 lane boundary (W carries the slack) and
            # clamp inside the column; all bounds are 128-multiples
            ws = jnp.clip(((nb + zoff0 + zb * C) // 128) * 128,
                          nb, nb + nzc - W)
            slab = packed_ref[:, pl.ds(pl.multiple_of(ws, 128), W)]
            return acc + pair_fn(rows, slab, *cvals)

        acc = jax.lax.fori_loop(0, ncols, body,
                                jnp.zeros((out_k, C), jnp.float32))
        out_ref[:] = acc.reshape(1, out_k, C)

    # out block (1, out_k, C): the last two dims equal the array dims, as
    # the TPU lowering requires
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(npc, grid.n_zb),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(consts),
        out_specs=pl.BlockSpec((1, out_k, C),
                               lambda p, zb, cb, co: (p * grid.n_zb + zb,
                                                      0, 0)),
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((npc * grid.n_zb, out_k, C),
                                       jnp.float32),
        interpret=interpret,
    )(col_base, coloffs, packed, *consts)
    return out.transpose(1, 0, 2).reshape(out_k, npc * grid.n_zb * C)


def gather_rows(grid: PairGrid, out, slot_of_atom):
    """Per-primary-atom rows of a sweep output: map atom -> target index."""
    ccap = grid.ccap
    nz = grid.nc[2]
    slot = slot_of_atom
    colslot = slot // (nz * ccap)               # (cx*ny + cy)
    ny = grid.nc[1]
    cx = colslot // ny - grid.tc_lo[0]
    cy = colslot % ny - grid.tc_lo[1]
    z = slot % (nz * ccap) - grid.zb_lo * ccap  # slot within target z-range
    p = cx * grid.tc_n[1] + cy
    tidx = p * (grid.n_zb * grid.C) + z
    # every primary atom must land inside the target region by construction
    return out[:, tidx]


# ---------------------------------------------------------------------------
# pair functions
# ---------------------------------------------------------------------------

def _planes(rows, slab, k):
    r = rows[k].reshape(-1, 1)
    s = slab[k].reshape(1, -1)
    return r, s


def _pair_geom(rows, slab, rc2):
    rx, sx = _planes(rows, slab, 0)
    ry, sy = _planes(rows, slab, 1)
    rz, sz = _planes(rows, slab, 2)
    dx = rx - sx
    dy = ry - sy
    dz = rz - sz
    dr2 = dx * dx + dy * dy + dz * dz
    within = (dr2 <= rc2) & (dr2 > 1e-6)        # excludes the self slot
    return (dx, dy, dz), dr2, within


def _type_onehots(rows, slab, nso):
    # integer iota (float iota is unsupported by the Mosaic verifier)
    tvals = jax.lax.broadcasted_iota(jnp.int32, (1, nso), 1).astype(
        jnp.float32)
    rt = rows[3].reshape(-1, 1)
    st = slab[3].reshape(-1, 1)
    rOH = (rt == tvals).astype(jnp.float32)     # (C, nso)
    sOH = (st == tvals).astype(jnp.float32)     # (W, nso)
    return rOH, sOH


def _pair_param(rOH, sOH, P):
    """prm (C, W) = rowOH @ P @ slabOH^T via two small MXU matmuls."""
    a = jnp.dot(rOH, P, preferred_element_type=jnp.float32)      # (C, nso)
    return jax.lax.dot_general(
        a, sOH, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                       # (C, W)


def make_nonbond_pair_fn(ffd, nso: int, rc2_true: float):
    """Closed-form vdW + Coulomb row sweep (the kernel analog of
    cf_nonbond + nonbond_cf_energy_forces; ref hot loop pot.F90:702-773).

    packed columns: 0:x 1:y 2:z 3:type 4:gid 5:q
    outputs (11, C): evdw, eclmb, fx, fy, fz, w_xx, w_yy, w_zz, w_yz,
    w_zx, w_xy   (energies and virial carry the directed-pair 0.5)
    """
    cf = np.asarray(ffd.cf_pair, np.float32)          # (nso, nso, 11)
    pvdW1h = float(ffd.pvdW1h)
    pvdW1inv = float(ffd.pvdW1inv)
    # consts: the 6 (nso, nso) param matrices + taper coefficients
    consts = (jnp.asarray(cf[..., :6]),
              jnp.asarray(np.asarray(ffd.ctap), jnp.float32))

    def pair_fn(rows, slab, cfc, ctap):
        Pex, Pgw, Pal = cfc[..., 0], cfc[..., 1], cfc[..., 2]
        Prv, Pdj, Pgc = cfc[..., 3], cfc[..., 4], cfc[..., 5]
        d, dr2, within = _pair_geom(rows, slab, rc2_true)
        rg, sg = _planes(rows, slab, 4)
        rq, sq = _planes(rows, slab, 5)
        rOH, sOH = _type_onehots(rows, slab, nso)
        ok = within & (rg != sg)                      # ref: pot.F90:715
        ok = ok & (_pair_param(rOH, sOH, Pex) > 0.5)

        dr2s = jnp.where(ok, dr2, 1.0)
        dr1 = jnp.sqrt(dr2s)
        tap, dtap = _taper(dr2s, dr1, ctap)
        gamw = _pair_param(rOH, sOH, Pgw)
        alpha = _pair_param(rOH, sOH, Pal)
        rvdwi = _pair_param(rOH, sOH, Prv)
        dij = _pair_param(rOH, sOH, Pdj)
        gamij = _pair_param(rOH, sOH, Pgc)
        gamw = jnp.where(ok, gamw, 1.0)
        gamij = jnp.where(ok, gamij, 1.0)

        rij_vd1 = dr2s ** pvdW1h
        fn13 = (rij_vd1 + gamw) ** pvdW1inv
        exp1 = jnp.exp(alpha * (1.0 - fn13 * rvdwi))
        exp2 = jnp.sqrt(exp1)
        dr3 = dr1 * dr2s
        dr3gam = (dr3 + gamij) ** (-1.0 / 3.0)
        qq = rq * sq
        evdw = tap * dij * (exp1 - 2.0 * exp2)
        eclmb = tap * units.CCLMB0 * dr3gam * qq
        # derivative columns, (dE/dr)/r (ref: pot.F90:736-761); reuses the
        # fn13/rij_vd1 powers instead of two extra pow evaluations
        dfn13 = fn13 / (rij_vd1 + gamw) * (rij_vd1 / dr2s)
        devdw = dij * (dtap * (exp1 - 2.0 * exp2)
                       - tap * (alpha * rvdwi) * (exp1 - exp2) * dfn13)
        declmb = units.CCLMB0 * dr3gam * (dtap - dr3gam ** 3 * tap * dr1) * qq
        ffac = jnp.where(ok, devdw + declmb, 0.0)
        evdw = jnp.where(ok, evdw, 0.0)
        eclmb = jnp.where(ok, eclmb, 0.0)

        fx = -jnp.sum(ffac * d[0], axis=1)
        fy = -jnp.sum(ffac * d[1], axis=1)
        fz = -jnp.sum(ffac * d[2], axis=1)
        wxx = -0.5 * jnp.sum(ffac * d[0] * d[0], axis=1)
        wyy = -0.5 * jnp.sum(ffac * d[1] * d[1], axis=1)
        wzz = -0.5 * jnp.sum(ffac * d[2] * d[2], axis=1)
        wyz = -0.5 * jnp.sum(ffac * d[1] * d[2], axis=1)
        wzx = -0.5 * jnp.sum(ffac * d[2] * d[0], axis=1)
        wxy = -0.5 * jnp.sum(ffac * d[0] * d[1], axis=1)
        return jnp.stack([
            0.5 * jnp.sum(evdw, axis=1), 0.5 * jnp.sum(eclmb, axis=1),
            fx, fy, fz, wxx, wyy, wzz, wyz, wzx, wxy], axis=0)

    return pair_fn, 11, consts


def _taper(dr2, dr1, ctap):
    dr3 = dr1 * dr2
    dr4 = dr2 * dr2
    dr5 = dr1 * dr4
    dr6 = dr2 * dr4
    dr7 = dr1 * dr6
    tap = (ctap[7] * dr7 + ctap[6] * dr6 + ctap[5] * dr5 + ctap[4] * dr4
           + ctap[0])
    dtap = (7.0 * ctap[7] * dr5 + 6.0 * ctap[6] * dr4 + 5.0 * ctap[5] * dr3
            + 4.0 * ctap[4] * dr2)
    return tap, dtap


def make_qeq_pair_fn(ffd, nso: int, rc2_true: float):
    """QEq hessian sweep: H·hs, H·ht and the Est pair sum in one pass (the
    kernel analog of get_hsh, ref: qeq.F90:271-318, with the closed-form
    shielded-Coulomb kernel of init.F90:487-489).

    packed columns: 0:x 1:y 2:z 3:type 4:is_primary 5:hs 6:ht 7:q
    outputs (3, C): hshs, hsht, est_pair  (Est weight: 1.0 primary
    neighbor, 0.5 image/ghost — ref: qeq.F90:304-306 semantics)
    """
    cf = np.asarray(ffd.cf_pair, np.float32)
    # consts: [exists, gamma^-3] pair matrices + taper coefficients
    consts = (jnp.asarray(np.stack([cf[..., 0], cf[..., 5]], axis=-1)),
              jnp.asarray(np.asarray(ffd.ctap), jnp.float32))

    def pair_fn(rows, slab, cfc, ctap):
        Pex, Pg = cfc[..., 0], cfc[..., 1]
        d, dr2, within = _pair_geom(rows, slab, rc2_true)
        rOH, sOH = _type_onehots(rows, slab, nso)
        within = within & (_pair_param(rOH, sOH, Pex) > 0.5)
        gamij = jnp.where(within, _pair_param(rOH, sOH, Pg), 1.0)
        dr2s = jnp.where(within, dr2, 1.0)
        dr1 = jnp.sqrt(dr2s)
        tap, _ = _taper(dr2s, dr1, ctap)
        dr3 = dr1 * dr2s
        hess = units.CCLMB0_QEQ * tap * (dr3 + gamij) ** (-1.0 / 3.0)
        hess = jnp.where(within, hess, 0.0)
        _, sprim = _planes(rows, slab, 4)
        _, shs = _planes(rows, slab, 5)
        _, sht = _planes(rows, slab, 6)
        _, sq = _planes(rows, slab, 7)
        estw = jnp.where(sprim > 0.5, 1.0, 0.5)
        return jnp.stack([
            jnp.sum(hess * shs, axis=1),
            jnp.sum(hess * sht, axis=1),
            jnp.sum(hess * estw * sq, axis=1)], axis=0)

    return pair_fn, 3, consts
