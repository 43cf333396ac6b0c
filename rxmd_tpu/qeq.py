"""Charge equilibration (QEq) — two-vector conjugate-gradient solver.

TPU-native re-design of the reference solver (ref: src/qeq.F90).  The
(s, t) vectors are solved jointly; the sparse "hessian" rows are the
taper*shielded-Coulomb kernel over the nonbonded pair list
(ref: qeq.F90:183-268), the diagonal is the atomic stiffness eta.

The CG iteration runs entirely on-device inside a `lax.while_loop` with the
exact termination semantics of the reference (two tests on the electrostatic
energy, ref: qeq.F90:114-115).  Reductions go through a pluggable `allreduce`
hook so the identical code runs single-chip (identity) and under shard_map
(`psum`) — the JAX analog of the reference's nompi/MPI duality
(ref: nompi.f90, qeq.F90:107-144).

The reference stores the line-minimization step in real(4) (qeq.F90:23);
we optionally mirror that (`lmin_f32=True`) so iteration counts match.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .neighbors import ImageTable, Neighbors, ext_positions
from .reax import FFDev, _table_lerp, _safe


class QEqResult(NamedTuple):
    q: jax.Array          # (N,) converged charges
    qs: jax.Array
    qt: jax.Array
    iters: jax.Array      # () int32 — number of completed CG updates
    est: jax.Array        # () final electrostatic energy [eV]


def qeq_hessian(pos, H, types, img: ImageTable, nbrs: Neighbors, ffd: FFDev):
    """Sparse hessian rows H_ij = Tap(r)*C_qeq(r) over the nonbonded list
    (ref: qeq.F90:200-256)."""
    pose = ext_positions(pos, H, img)
    mask = nbrs.masknb
    idx = jnp.where(mask, nbrs.idxnb, 0)
    oj = img.owner[idx]
    dr = pos[:, None, :] - pose[idx]
    dr2 = jnp.sum(dr * dr, axis=-1)
    b = ffd.inxn2[types[:, None], types[oj]]
    bc = jnp.where(b >= 0, b, 0)
    h = _table_lerp(ffd.tbl_eclmb_qeq, bc, dr2, ffd.udr, ffd.udri, mask)
    # pairs beyond the taper radius contribute zero (kernel is tapered) but
    # the reference's list is built with dr2 < rctap2, so mask explicitly
    h = jnp.where(mask & (dr2 < ffd.rctap2), h, 0.0)
    return h, oj, mask


def solve(pos, q, qsfp, H, types, img: ImageTable, nbrs: Neighbors,
          ffd: FFDev, amask=None, isqeq: int = 1, nmax: int = 500,
          tol: float = 1e-7, lex_fqs: float = 1.0, allreduce=None,
          lmin_f32: bool = False, refresh=None,
          resident_ext=None) -> QEqResult:
    """Solve for charges.  isqeq=1: full CG (ref: qeq.F90:39-48);
    isqeq=2: extended-Lagrangian warm start, one iteration
    (ref: qeq.F90:51-57).

    Multi-device hooks: `allreduce` (psum under shard_map), `refresh`
    (re-exchange ghost entries of a per-atom vector — the reference's
    per-iteration MODE_QCOPY1/2 halos, ref: qeq.F90:86-164) and
    `resident_ext` (which extended-index entries are locally resident,
    for the Est pair weights, ref: qeq.F90:304-306).
    """
    local_only = refresh is None
    if allreduce is None:
        allreduce = lambda x: x
    if refresh is None:
        refresh = lambda x: x
    n = pos.shape[0]
    dtype = pos.dtype
    if amask is None:
        amask = jnp.ones((n,), dtype=bool)
    w = amask.astype(dtype)

    hess, oj, mask = qeq_hessian(pos, H, types, img, nbrs, ffd)
    eta = jnp.where(amask, ffd.eta[types], 0.0)
    chi = jnp.where(amask, ffd.chi[types], 0.0)

    # Est pair weight: 0.5 per directed entry plus another 0.5 when the
    # neighbor is locally resident (ref: qeq.F90:304-306).
    idxnb = jnp.where(mask, nbrs.idxnb, 0)
    if resident_ext is None:
        resident_ext = jnp.arange(img.owner.shape[0]) < n
    est_w = jnp.where(resident_ext[idxnb], 1.0, 0.5)

    # On a single shard with moderate N the sparse ELL matvec (a (n, knb)
    # gather per CG step) is gather-bound on TPU; fold the owner mapping
    # into a dense matrix once and ride the MXU instead.
    dense = local_only and n <= 8192
    if dense:
        row = jnp.broadcast_to(jnp.arange(n)[:, None], oj.shape)
        hz = jnp.where(mask, hess, 0.0)
        Hd = jnp.zeros((n, n), dtype).at[row, oj].add(hz)
        Ew = jnp.zeros((n, n), dtype).at[row, oj].add(est_w * hz)

        def matvec(x):
            return eta * x + Hd @ x

        def pair_energy(qcur):
            return (Ew @ qcur) * qcur
    else:
        def matvec(x):
            """(eta*I + H) x with ghost values refreshed from owners."""
            x = refresh(x)
            xs = jnp.where(mask, x[oj], 0.0)
            return eta * x + jnp.sum(hess * xs, axis=1)

        def pair_energy(qcur):
            qj = jnp.where(mask, refresh(qcur)[oj], 0.0)
            return jnp.sum(est_w * hess * qj, axis=1) * qcur

    def gradient(qs, qt):
        gs = jnp.where(amask, -chi - matvec(qs), 0.0)
        gt = jnp.where(amask, -1.0 * w - matvec(qt), 0.0)
        gnew = jnp.stack([allreduce(jnp.sum(gs * gs)),
                          allreduce(jnp.sum(gt * gt))])
        return gs, gt, gnew

    def electrostatic(qcur):
        per_atom = chi * qcur + 0.5 * eta * qcur * qcur + pair_energy(qcur)
        return allreduce(jnp.sum(jnp.where(amask, per_atom, 0.0)))

    if isqeq == 2:
        qs0 = jnp.where(amask, lex_fqs * qsfp + (1.0 - lex_fqs) * q, 0.0)
        nmax_eff = 1
    else:
        qs0 = jnp.where(amask, q, 0.0)
        nmax_eff = nmax
    qt0 = jnp.zeros_like(q)

    gs0, gt0, gnew0 = gradient(qs0, qt0)
    hs0, ht0 = gs0, gt0

    def gnew_safe(g):
        return jnp.where(jnp.abs(g) > 0.0, g, 1.0)

    init = (jnp.int32(0), qs0, qt0, q, hs0, ht0, gs0, gt0, gnew0,
            jnp.asarray(1e99, dtype), jnp.asarray(0.0, dtype), False)

    def cond(c):
        it, *_, done = c
        return (it < nmax_eff) & jnp.logical_not(done)

    def body(c):
        (it, qs, qt, qcur, hs, ht, gs, gt, gnew, gest2, _, done) = c
        hshs_v = matvec(hs)
        hsht_v = matvec(ht)
        est = electrostatic(qcur)
        ex1 = 0.5 * (jnp.abs(gest2) + jnp.abs(est)) < tol
        ex2 = (jnp.abs(gest2) > 0.0) & (jnp.abs(est / gest2 - 1.0) < tol)
        stop = ex1 | ex2

        g_h = jnp.stack([allreduce(jnp.sum(gs * hs)),
                         allreduce(jnp.sum(gt * ht))])
        h_hsh = jnp.stack([allreduce(jnp.sum(hs * hshs_v)),
                           allreduce(jnp.sum(ht * hsht_v))])
        lmin = g_h / jnp.where(h_hsh != 0.0, h_hsh, 1.0)
        if lmin_f32:
            lmin = lmin.astype(jnp.float32).astype(dtype)  # ref: qeq.F90:23
        qs1 = qs + lmin[0] * hs
        qt1 = qt + lmin[1] * ht
        ssum = allreduce(jnp.sum(qs1))
        tsum = allreduce(jnp.sum(qt1))
        mu = ssum / tsum
        q1 = jnp.where(amask, qs1 - mu * qt1, 0.0)
        gs1, gt1, gnew1 = gradient(qs1, qt1)
        hs1 = gs1 + (gnew1[0] / gnew_safe(gnew[0])) * hs
        ht1 = gt1 + (gnew1[1] / gnew_safe(gnew[1])) * ht

        sel = lambda a, b_: jax.tree.map(
            lambda x, y: jnp.where(stop, x, y), a, b_)
        new = (it + 1, qs1, qt1, q1, hs1, ht1, gs1, gt1, gnew1, est, est,
               False)
        old = (it, qs, qt, qcur, hs, ht, gs, gt, gnew, gest2, est, True)
        return sel(old, new)

    out = jax.lax.while_loop(cond, body, init)
    it, qs, qt, qcur, *_rest = out
    est_last = out[10]
    return QEqResult(q=qcur, qs=qs, qt=qt, iters=it, est=est_last)
