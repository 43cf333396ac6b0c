"""Neighbor-list construction on fixed-shape padded arrays.

TPU-first redesign of the reference's linked-cell + neighbor-list machinery
(ref: main.F90:277-477).  Instead of ragged linked lists we build:

  * an *extended* atom set: the N owned atoms followed by ghost periodic
    images, described by (owner, shift) tables.  Ghost positions are always
    recomputed as ``pos[owner] + shift @ H.T`` *inside* the differentiated
    energy function, so `jax.grad` automatically performs the ghost-force
    copy-back reduction that the reference implements by hand as
    COPYATOMS(MODE_CPBK) (ref: comm.F90:74-78, pot.F90:74).

  * fixed-capacity neighbor index arrays:
      - bonded list   (N, kb)  within the per-pair sigma-bond cutoff rc
        (ref: NEIGHBORLIST main.F90:321-417, cap MAXNEIGHBS module.F90:81)
      - nonbonded list (N, knb) within the taper cutoff rctap
        (ref: GetNonbondingPairList main.F90:420-477, cap MAXNEIGHBS10)

Padding uses index -1 with a validity mask derived from per-row counts.
Overflow is detected (count > capacity) like the reference's error traps
(ref: main.F90:402-407, qeq.F90:248-252) but surfaced as data so the host
driver can recompile with a larger capacity instead of aborting.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class ImageTable(NamedTuple):
    """Mapping from extended index -> (owning atom, periodic shift)."""
    owner: jax.Array   # (M,) int32, m % N
    shift: jax.Array   # (M, 3) shift in lattice-vector units
    nimg: tuple        # images per axis (static)


def make_image_table(n: int, nimg=(1, 1, 1), dtype=jnp.float64) -> ImageTable:
    """All periodic images with |s_k| <= nimg_k; the zero shift comes first so
    ext index m < n is the owned atom m itself."""
    rng = [np.arange(-k, k + 1) for k in nimg]
    shifts = np.stack(np.meshgrid(*rng, indexing="ij"), axis=-1).reshape(-1, 3)
    # put the zero shift first
    order = np.argsort((shifts != 0).any(axis=1), kind="stable")
    shifts = shifts[order]
    S = shifts.shape[0]
    owner = np.tile(np.arange(n, dtype=np.int32), S)
    shift = np.repeat(shifts, n, axis=0)
    return ImageTable(jnp.asarray(owner), jnp.asarray(shift, dtype), tuple(nimg))


def nimg_for_cutoff(H: np.ndarray, rcut: float) -> tuple:
    """Images per axis needed so every neighbor within rcut has a ghost.

    Uses the perpendicular distances between opposite box faces.
    """
    H = np.asarray(H)
    inv = np.linalg.inv(H)
    # row k of inv has norm 1/d_k where d_k is the face spacing
    d = 1.0 / np.linalg.norm(inv, axis=0)
    return tuple(int(np.ceil(rcut / dk)) for dk in d)


def ext_positions(pos, H, img: ImageTable):
    """Positions of the extended set; differentiable in pos (ghost forces
    flow back to owners through this gather)."""
    return pos[img.owner] + img.shift.astype(pos.dtype) @ H.T


class Neighbors(NamedTuple):
    idxb: jax.Array    # (N, kb) int32 ext indices, -1 padded
    cntb: jax.Array    # (N,) int32
    idxnb: jax.Array   # (N, knb) int32 ext indices, -1 padded
    cntnb: jax.Array   # (N,) int32

    @property
    def maskb(self):
        return self.idxb >= 0

    @property
    def masknb(self):
        return self.idxnb >= 0


def _select_k(mask, k):
    """Indices of up to k True entries per row (lowest index first)."""
    score = mask.astype(jnp.int32)
    vals, idx = jax.lax.top_k(score, k)
    idx = jnp.where(vals > 0, idx, -1)
    return idx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("kb", "knb"))
def build_neighbors_brute(pos, H, types, img: ImageTable, rc2_by_type,
                          rctap2, kb: int, knb: int) -> Neighbors:
    """O(N*M) all-pairs neighbor search over the extended set.

    Exact and simple; suitable up to ~10k atoms.  rc2_by_type is an
    (nso, nso) table of squared sigma-bond cutoffs (0 where no bond type).
    """
    n = pos.shape[0]
    pose = ext_positions(pos, H, img)
    d = pos[:, None, :] - pose[None, :, :]
    dr2 = jnp.sum(d * d, axis=-1)                      # (N, M)
    not_self = jnp.arange(n)[:, None] != jnp.arange(pose.shape[0])[None, :]

    tj = types[img.owner]
    rc2_pair = rc2_by_type[types[:, None], tj[None, :]]
    maskb = (dr2 < rc2_pair) & not_self                # strict <, main.F90:366
    masknb = (dr2 <= rctap2) & not_self                # <=, main.F90:458

    idxb = _select_k(maskb, kb)
    idxnb = _select_k(masknb, knb)
    return Neighbors(idxb=idxb, cntb=maskb.sum(axis=1, dtype=jnp.int32),
                     idxnb=idxnb, cntnb=masknb.sum(axis=1, dtype=jnp.int32))


def check_overflow(nbrs: Neighbors):
    """Host-side overflow check; returns (max_bonded, max_nonbonded).

    Raises if either exceeds its capacity — the caller should rebuild jitted
    functions with larger kb/knb (ref: error traps main.F90:402-407)."""
    mb = int(nbrs.cntb.max())
    mnb = int(nbrs.cntnb.max())
    if mb > nbrs.idxb.shape[1]:
        raise RuntimeError(
            f"bonded neighbor overflow: {mb} > capacity {nbrs.idxb.shape[1]}")
    if mnb > nbrs.idxnb.shape[1]:
        raise RuntimeError(
            f"nonbonded neighbor overflow: {mnb} > capacity {nbrs.idxnb.shape[1]}")
    return mb, mnb
