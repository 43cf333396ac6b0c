"""Simulation state and box utilities.

The state is a JAX pytree of fixed-shape arrays.  Unlike the reference's
implicit globals (ref: module.F90:5-6,100-103) we keep positions, velocities,
charges, the extended-Lagrangian charge DOF (qsfp/qsfv, ref: module.F90:162)
and integer type/global-id arrays in one immutable dataclass; integer metadata
(atom type, global id) is stored in separate int arrays rather than the
reference's atype float encoding (ref: geninit.F90:459, main.F90:582-593).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def box_matrix(la, lb, lc, alpha, beta, gamma):
    """H-matrix with lattice vectors as columns (ref: init.F90:610-633)."""
    lal, lbe, lga = (np.deg2rad(x) for x in (alpha, beta, gamma))
    hh1 = lc * (np.cos(lal) - np.cos(lbe) * np.cos(lga)) / np.sin(lga)
    hh2 = lc * np.sqrt(
        1.0 - np.cos(lal) ** 2 - np.cos(lbe) ** 2 - np.cos(lga) ** 2
        + 2 * np.cos(lal) * np.cos(lbe) * np.cos(lga)) / np.sin(lga)
    H = np.zeros((3, 3))
    H[:, 0] = [la, 0.0, 0.0]
    H[:, 1] = [lb * np.cos(lga), lb * np.sin(lga), 0.0]
    H[:, 2] = [lc * np.cos(lbe), hh1, hh2]
    return H


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class State:
    """Per-atom dynamical state plus the periodic box."""

    pos: jax.Array        # (N, 3) real coordinates [A]
    vel: jax.Array        # (N, 3) velocities [A / internal-time]
    q: jax.Array          # (N,) charges [e]
    qsfp: jax.Array       # (N,) extended-Lagrangian fictitious charge
    qsfv: jax.Array       # (N,) its velocity
    types: jax.Array      # (N,) int32 atom type (0-based)
    gid: jax.Array        # (N,) int32 global atom id
    H: jax.Array          # (3, 3) box matrix, columns = lattice vectors
    step: jax.Array       # () int32 current MD step
    spos: jax.Array       # (N, 3) PQEq shell displacement from core
                          # (ref: module.F90:286; zeros unless PQEq)

    @property
    def n(self):
        return self.pos.shape[0]

    def astype(self, dtype):
        cast = lambda a: a.astype(dtype)
        return dataclasses.replace(
            self, pos=cast(self.pos), vel=cast(self.vel), q=cast(self.q),
            qsfp=cast(self.qsfp), qsfv=cast(self.qsfv), H=cast(self.H),
            spos=cast(self.spos))


def make_state(pos, types, H, vel=None, q=None, qsfp=None, qsfv=None,
               gid=None, step=0, spos=None, dtype=jnp.float64):
    pos = jnp.asarray(pos, dtype)
    n = pos.shape[0]
    z = jnp.zeros((n,), dtype)
    z3 = jnp.zeros((n, 3), dtype)
    return State(
        pos=pos,
        vel=z3 if vel is None else jnp.asarray(vel, dtype),
        q=z if q is None else jnp.asarray(q, dtype),
        qsfp=z if qsfp is None else jnp.asarray(qsfp, dtype),
        qsfv=z if qsfv is None else jnp.asarray(qsfv, dtype),
        types=jnp.asarray(types, jnp.int32),
        gid=(jnp.arange(n, dtype=jnp.int32) if gid is None
             else jnp.asarray(gid, jnp.int32)),
        H=jnp.asarray(H, dtype),
        step=jnp.asarray(step, jnp.int32),
        spos=z3 if spos is None else jnp.asarray(spos, dtype),
    )


def read_geninit_xyz(path: str, name_to_type: dict):
    """Read a geninit-style input cell (ref: init/geninit.F90:360-444).

    Format: natoms + comment / "la lb lc alpha beta gamma" / element + three
    fractional coordinates per line.  Returns (frac (N,3), types (N,),
    (la,lb,lc,alpha,beta,gamma)).
    """
    with open(path) as fh:
        first = fh.readline().split()
        n = int(first[0])
        cell = tuple(float(x) for x in fh.readline().split()[:6])
        frac = np.zeros((n, 3))
        types = np.zeros(n, dtype=np.int32)
        for i in range(n):
            tok = fh.readline().split()
            types[i] = name_to_type[tok[0]]
            frac[i] = [float(tok[1]), float(tok[2]), float(tok[3])]
    return frac, types, cell


def replicate(frac, types, cell, mc=(1, 1, 1)):
    """Replicate a unit cell mc times per axis (ref: geninit.F90:446-478).

    Returns fractional coords in the supercell and the supercell parameters.
    """
    la, lb, lc, al, be, ga = cell
    mc = np.asarray(mc)
    out_frac = []
    out_types = []
    for ix in range(mc[0]):
        for iy in range(mc[1]):
            for iz in range(mc[2]):
                out_frac.append((frac + np.array([ix, iy, iz])) / mc)
                out_types.append(types)
    frac_s = np.concatenate(out_frac) % 1.0
    types_s = np.concatenate(out_types)
    cell_s = (la * mc[0], lb * mc[1], lc * mc[2], al, be, ga)
    return frac_s, types_s, cell_s


def from_cellfile(path, name_to_type, mc=(1, 1, 1), dtype=jnp.float64):
    """Build a State from a geninit input cell, optionally replicated."""
    frac, types, cell = read_geninit_xyz(path, name_to_type)
    frac, types, cell = replicate(frac, types, cell, mc)
    H = box_matrix(*cell)
    pos = frac @ H.T
    return make_state(pos, types, H, dtype=dtype)
