"""Structural optimization: nonlinear conjugate gradient (mdmode=10).

Reimplements the reference optimizer (ref: src/cg.F90:26-393): Polak-Ribiere
style CG over atom positions, bracketing by step doubling from 1e-2/N with
Wolfe-condition tests, golden-section line minimization, convergence when
|dPE| <= ftol * N.  Each energy evaluation re-solves QEq, exactly like
EvaluateEnergyWithStep (ref: cg.F90:358-387).

The line-search control flow runs on the host; each probe is one jitted
(QEq + energy) evaluation.  The same loop drives both engines through an
adapter: the single-device engine needs no migration, the sharded engine
migrates the CG gradient/direction vectors with their atoms between
iterations (the analog of MigrateVec3D, ref: cg.F90:292-314) and bounds
line-search drift by the halo skin margin.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

GOLD = 0.5 * (np.sqrt(5.0) - 1.0)

# reference line-search constants (ref: cg.F90:6-16)
CG_MAX_BRACKET = 20       # CG_MaxBracketLoop
CG_MAX_LINEMIN = 100      # CG_MaxLineMinLoop
CG_WC1 = 1e-4             # Armijo constant
CG_GSTOL = 1e-6           # golden-section interval tolerance (per atom)


class _MDAdapter:
    """Single-device engine: positions are a plain (n, 3) array."""

    def __init__(self, engine):
        self.engine = engine
        self.n = engine.state.n
        self.drift_limit = np.inf
        s = engine.state

        @jax.jit
        def evaluate(pos):
            nbrs = engine._build_nbrs(pos, s.H, s.types)
            q, _, _, _, spos = engine._qeq_step(
                pos, s.q, s.qsfp, s.qsfv, s.H, s.types, nbrs, isqeq=1,
                spos=s.spos)
            comps, f = engine._forces(pos, q, s.H, s.types, s.gid, nbrs,
                                      spos=spos)
            return comps[0], f, q

        self._evaluate = evaluate

    def positions(self):
        return self.engine.state.pos

    def evaluate(self, pos):
        return self._evaluate(pos)

    def resync(self, pos, g, p):
        return pos, g, p

    def commit(self, pos, q):
        import dataclasses
        self.engine.state = dataclasses.replace(self.engine.state,
                                                pos=pos, q=q)


class _ShardedAdapter:
    """Sharded engine: positions in device-block layout; CG vectors ride
    atom migration at every iteration boundary (MigrateVec3D analog), and
    probes are bounded by the Verlet-skin margin so the per-probe fresh
    halo plan stays complete."""

    def __init__(self, engine):
        self.engine = engine
        self.n = engine.state0.n
        # residents may sit at most this far outside their subdomain
        # before ghost selection could miss an interaction
        self.drift_limit = 0.5 * engine.skin_nb

    def positions(self):
        return self.engine.cg_positions()

    def evaluate(self, pos):
        return self.engine.cg_evaluate(pos)

    def resync(self, pos, g, p):
        return self.engine.cg_resync(pos, g, p)

    def commit(self, pos, q):
        self.engine.cg_commit(pos, q)


def _make_adapter(engine):
    from .md import Engine as MDEngine
    if isinstance(engine, MDEngine):
        return _MDAdapter(engine)
    from .parallel.engine import ShardedEngine
    if isinstance(engine, ShardedEngine):
        return _ShardedAdapter(engine)
    raise TypeError(
        f"conjugate_gradient needs md.Engine or ShardedEngine, got "
        f"{type(engine).__name__}")


def conjugate_gradient(engine, max_iter: int = 500, ftol: float = None,
                       max_bracket: int = 50, log=print, writer=None):
    """Minimize the potential energy of the engine's state in place
    (ref: ConjugateGradient cg.F90:26-98)."""
    ad = _make_adapter(engine)
    cfg = engine.cfg
    ftol = cfg.ftol if ftol is None else ftol
    n = ad.n

    pos = ad.positions()
    pe_, g, q = ad.evaluate(pos)
    pe = float(pe_)
    p = g                                   # initial direction (cg.F90:50)
    if log:
        log(f"Start structural optimization. ftol={ftol:.2e} PE0={pe:.6f}")

    def e_at(alpha, pos, p, pmax):
        if alpha * pmax > ad.drift_limit:
            # probe would outrun the halo skin margin: re-anchor the
            # decomposition first (migration keeps slots consistent)
            return None
        e, _, _ = ad.evaluate(pos + alpha * p)
        return float(e)

    def bracket(pos, p, pe0, f0, pmax):
        """Double the step from 1e-2/N until the Armijo test fails
        (ref: BracketSearchRange cg.F90:101-141 + WolfeConditions
        cg.F90:144-208).  The reference's stop test reads
        `.not.WolfeC1 .or. .not.WolfeC1` — i.e. only the Armijo rule
        gates the bracket (the curvature bool is computed but unused);
        we reproduce that observable behavior."""
        stepl = 1e-2 / n
        p_dot_f = float(jnp.vdot(p, f0))          # p . force(x)
        for _ in range(min(max_bracket, CG_MAX_BRACKET)):
            stepl *= 2.0
            e = e_at(stepl, pos, p, pmax)
            if e is None:
                # cap the bracket at the decomposition's drift limit
                return stepl * 0.5
            armijo = e <= pe0 + p_dot_f * CG_WC1 * stepl
            if not armijo:                         # bracket found
                return stepl
        return None

    def golden(pos, p, b, pmax):
        """Golden-section minimization on [0, b]: interval shrinks until
        |a-d| <= CG_GStol/N, returns the right edge like the reference
        (GoldenSectionSearch returns dx, cg.F90:242-281 + use at :232)."""
        a = 0.0
        x1 = b - GOLD * (b - a)
        x2 = a + GOLD * (b - a)
        f1 = e_at(x1, pos, p, pmax)
        f2 = e_at(x2, pos, p, pmax)
        for _ in range(CG_MAX_LINEMIN):
            if abs(a - b) <= CG_GSTOL / n:
                break
            if f1 < f2:
                b = x2
            else:
                a = x1
            x1 = b - GOLD * (b - a)
            x2 = a + GOLD * (b - a)
            f1 = e_at(x1, pos, p, pmax)
            f2 = e_at(x2, pos, p, pmax)
        return b

    for it in range(max_iter):
        pmax = float(jnp.max(jnp.linalg.norm(p, axis=-1)))
        b = bracket(pos, p, pe, g, pmax)
        if b is None:
            if log:
                log(f"no bracket found at iter {it}; at a minimum")
            break
        alpha = golden(pos, p, b, pmax)
        pos = pos + alpha * p
        # migrate atoms + CG vectors to their new owners before the next
        # evaluation (ref: MigrateVec3D cg.F90:292-314; identity on the
        # single-device engine)
        pos, g_m, p = ad.resync(pos, g, p)
        g_old = g_m
        pe_old = pe
        pe_, g, q = ad.evaluate(pos)
        pe = float(pe_)
        if writer:
            writer(it, pos, pe)
        if log:
            log(f"CG iter {it:4d}: PE={pe:.8f} dPE={pe - pe_old:.3e} "
                f"alpha={alpha:.3e}")
        if abs(pe - pe_old) <= ftol * n:    # ref: cg.F90:75
            if log:
                log(f"Energy converged at iter {it}")
            break
        b1 = float(jnp.vdot(g_old, g_old))
        b2 = float(jnp.vdot(g, g))
        b3 = float(jnp.vdot(g, g_old))
        p = (b2 - b3) / b1 * p + g          # ref: cg.F90:82-89

    ad.commit(pos, q)
    return pe
