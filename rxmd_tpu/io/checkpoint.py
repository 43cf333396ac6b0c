"""Native checkpoint/restore.

Carries exactly the reference's restart payload (ref: fileio.F90:558-653):
positions, velocities, charges, types, global ids, the extended-Lagrangian
charge state qsfp/qsfv (so QEq warm restart is exact), the step counter and
the box — as a compressed npz.  Unlike the reference's format, restart is
independent of the process layout (no per-rank slab constraint,
cf. fileio.F90:492).
"""
from __future__ import annotations

import numpy as np

from ..system import State, make_state


def save(path: str, state: State):
    np.savez_compressed(
        path,
        pos=np.asarray(state.pos), vel=np.asarray(state.vel),
        q=np.asarray(state.q), qsfp=np.asarray(state.qsfp),
        qsfv=np.asarray(state.qsfv), types=np.asarray(state.types),
        gid=np.asarray(state.gid), H=np.asarray(state.H),
        step=int(state.step), spos=np.asarray(state.spos))


def load(path: str, dtype=np.float64) -> State:
    z = np.load(path)
    return make_state(z["pos"], z["types"], z["H"], vel=z["vel"], q=z["q"],
                      qsfp=z["qsfp"], qsfv=z["qsfv"], gid=z["gid"],
                      step=int(z["step"]),
                      spos=z["spos"] if "spos" in z else None, dtype=dtype)
