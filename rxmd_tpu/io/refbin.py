"""Reference-compatible binary configuration files (rxff.bin).

Format (ref: fileio.F90:444-653 and geninit.F90:539-578):
  int32 header: nprocs, vprocs(3), natoms-per-rank[nprocs], current_step
  6 float64: lata, latb, latc, lalpha, lbeta, lgamma
  per-rank contiguous slabs of 10 float64 per atom:
    pos_norm(3), v(3), q, atype, qsfp, qsfv
atype encodes the 1-based type in the integer part and the global atom id as
fractional part * 1e-13 (ref: geninit.F90:459, decoded by l2g main.F90:582).
"""
from __future__ import annotations

import numpy as np

from ..system import State, box_matrix, make_state


def decode_atype(atype):
    """-> (0-based type, global id) (ref: main.F90:582-593)."""
    ity = np.rint(atype).astype(np.int64)
    gid = np.rint((atype - ity) * 1e13).astype(np.int64)
    return (ity - 1).astype(np.int32), gid.astype(np.int32)


def encode_atype(types0, gid):
    return (np.asarray(types0, np.float64) + 1.0
            + np.asarray(gid, np.float64) * 1e-13)


def read_rxff_bin(path: str, dtype=np.float64):
    """Read a reference rxff.bin into a State (all ranks concatenated)."""
    with open(path, "rb") as fh:
        head = np.fromfile(fh, np.int32, 4)
        nprocs = int(head[0])
        vprocs = tuple(int(x) for x in head[1:4])
        counts = np.fromfile(fh, np.int32, nprocs)
        step = int(np.fromfile(fh, np.int32, 1)[0])
        cell = np.fromfile(fh, np.float64, 6)
        n = int(counts.sum())
        body = np.fromfile(fh, np.float64, n * 10).reshape(n, 10)
    H = box_matrix(*cell)
    pos = body[:, 0:3] @ H.T                       # normalized -> real
    # per-rank slabs are in global normalized coords already offset by the
    # rank origin?  No: WriteBIN stores xu2xs output which subtracts OBOX;
    # geninit stores global normalized.  For nprocs==1 both agree.  For
    # multi-rank files, add the rank origin back:
    if nprocs > 1:
        off = 0
        lo = np.zeros(3)
        k = 0
        for ix in range(vprocs[0]):
            for iy in range(vprocs[1]):
                for iz in range(vprocs[2]):
                    c = int(counts[k])
                    obox = np.array([ix / vprocs[0], iy / vprocs[1],
                                     iz / vprocs[2]])
                    pos[off:off + c] = (body[off:off + c, 0:3] + obox) @ H.T
                    off += c
                    k += 1
    types0, gid = decode_atype(body[:, 7])
    st = make_state(pos.astype(dtype), types0, H,
                    vel=body[:, 3:6], q=body[:, 6], qsfp=body[:, 8],
                    qsfv=body[:, 9], gid=gid, step=step, dtype=dtype)
    return st, {"nprocs": nprocs, "vprocs": vprocs, "counts": counts,
                "cell": tuple(cell)}


def write_rxff_bin(path: str, state: State, cell=None, vprocs=(1, 1, 1),
                   step=None):
    """Write a State as a single-rank reference rxff.bin."""
    import numpy as np
    H = np.asarray(state.H)
    if cell is None:
        la, lb, lc = np.linalg.norm(H, axis=0)
        cosg = H[:, 0] @ H[:, 1] / (la * lb)
        cosb = H[:, 0] @ H[:, 2] / (la * lc)
        cosa = H[:, 1] @ H[:, 2] / (lb * lc)
        cell = (la, lb, lc, np.degrees(np.arccos(cosa)),
                np.degrees(np.arccos(cosb)), np.degrees(np.arccos(cosg)))
    n = state.n
    Hi = np.linalg.inv(H)
    frac = (np.asarray(state.pos) @ Hi.T) % 1.0
    body = np.zeros((n, 10))
    body[:, 0:3] = frac
    body[:, 3:6] = np.asarray(state.vel)
    body[:, 6] = np.asarray(state.q)
    body[:, 7] = encode_atype(np.asarray(state.types), np.asarray(state.gid))
    body[:, 8] = np.asarray(state.qsfp)
    body[:, 9] = np.asarray(state.qsfv)
    step = int(state.step) if step is None else step
    with open(path, "wb") as fh:
        np.array([1, *vprocs], np.int32).tofile(fh)
        np.array([n], np.int32).tofile(fh)
        np.array([step], np.int32).tofile(fh)
        np.asarray(cell, np.float64).tofile(fh)
        body.astype(np.float64).tofile(fh)
