"""Structural optimization: nonlinear conjugate gradient (mdmode=10).

Reimplements the reference optimizer (ref: src/cg.F90:26-393): Polak-Ribiere
style CG over atom positions, bracketing by step doubling from 1e-2/N with
Wolfe-condition tests, golden-section line minimization, convergence when
|dPE| <= ftol * N.  Each energy evaluation re-solves QEq, exactly like
EvaluateEnergyWithStep (ref: cg.F90:358-387).

The line-search control flow runs on the host; each probe is one jitted
(QEq + energy) evaluation.  No migration is needed (the single-device engine
treats positions globally; the sharded engine can run the same loop with its
own evaluator).
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


def conjugate_gradient(engine, max_iter: int = 500, ftol: float = None,
                       max_bracket: int = 50, log=print, writer=None):
    """Minimize the potential energy of engine.state in place."""
    cfg = engine.cfg
    ftol = cfg.ftol if ftol is None else ftol
    s = engine.state
    n = s.n

    @jax.jit
    def evaluate(pos):
        nbrs = engine._build_nbrs(pos, s.H, s.types)
        q, _, _, _, spos = engine._qeq_step(
            pos, s.q, s.qsfp, s.qsfv, s.H, s.types, nbrs, isqeq=1,
            spos=s.spos)
        comps, f = engine._forces(pos, q, s.H, s.types, s.gid, nbrs,
                                  spos=spos)
        return comps[0], f, q

    pos = s.pos
    pe, g, q = evaluate(pos)
    pe = float(pe)
    p = g                                   # initial direction (cg.F90:50)
    if log:
        log(f"Start structural optimization. ftol={ftol:.2e} PE0={pe:.6f}")

    def e_at(alpha, pos, p):
        e, _, _ = evaluate(pos + alpha * p)
        return float(e)

    def bracket(pos, p, pe0, f0):
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
            e = e_at(stepl, pos, p)
            armijo = e <= pe0 + p_dot_f * CG_WC1 * stepl
            if not armijo:                         # bracket found
                return stepl
        return None

    def golden(pos, p, b):
        """Golden-section minimization on [0, b]: interval shrinks until
        |a-d| <= CG_GStol/N, returns the right edge like the reference
        (GoldenSectionSearch returns dx, cg.F90:242-281 + use at :232)."""
        a = 0.0
        x1 = b - GOLD * (b - a)
        x2 = a + GOLD * (b - a)
        f1 = e_at(x1, pos, p)
        f2 = e_at(x2, pos, p)
        for _ in range(CG_MAX_LINEMIN):
            if abs(a - b) <= CG_GSTOL / n:
                break
            if f1 < f2:
                b = x2
            else:
                a = x1
            x1 = b - GOLD * (b - a)
            x2 = a + GOLD * (b - a)
            f1 = e_at(x1, pos, p)
            f2 = e_at(x2, pos, p)
        return b

    for it in range(max_iter):
        b = bracket(pos, p, pe, g)
        if b is None:
            if log:
                log(f"no bracket found at iter {it}; at a minimum")
            break
        alpha = golden(pos, p, b)
        pos = pos + alpha * p
        g_old = g
        pe_old = pe
        pe_, g, q = evaluate(pos)
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

    import dataclasses
    engine.state = dataclasses.replace(engine.state, pos=pos, q=q)
    return pe
