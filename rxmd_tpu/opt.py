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

    def bracket(pos, p, pe0):
        """Double the step until energy rises (ref: cg.F90:101-141)."""
        stepl = 1e-2 / n
        last = pe0
        for _ in range(max_bracket):
            stepl *= 2.0
            e = e_at(stepl, pos, p)
            if e > last:                    # minimum bracketed
                return stepl
            last = e
        return None

    def golden(pos, p, b, iters=40):
        """Golden-section minimization on [0, b] (ref: cg.F90:242-281)."""
        a = 0.0
        x1 = b - GOLD * (b - a)
        x2 = a + GOLD * (b - a)
        f1 = e_at(x1, pos, p)
        f2 = e_at(x2, pos, p)
        for _ in range(iters):
            if (b - a) < 1e-12:
                break
            if f1 > f2:
                a, x1, f1 = x1, x2, f2
                x2 = a + GOLD * (b - a)
                f2 = e_at(x2, pos, p)
            else:
                b, x2, f2 = x2, x1, f1
                x1 = b - GOLD * (b - a)
                f1 = e_at(x1, pos, p)
        return 0.5 * (a + b)

    for it in range(max_iter):
        b = bracket(pos, p, pe)
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
