#!/usr/bin/env python
"""Benchmark: RDX ReaxFF MD throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Baseline (BASELINE.md): the reference runs RDX 168 atoms, 100 NVE steps with
FULL QEq CG (isQEq=1, tol 1e-7) in 2.998 s on one CPU rank => 5.6e3
atom-steps/s.  The headline `value`/`vs_baseline` are measured in that SAME
configuration (like-for-like physics).  The extended-Lagrangian production
mode (isQEq=2, 1 CG iteration/step — the reference's own scaling deck,
conf/bg-bench/rxmd.in) is reported alongside as `exl_atom_steps_per_sec`.
"""
import json
import os
import sys
import time

import numpy as np


def run_mode(ff, st, isqeq, nsteps, dtype):
    import jax.numpy as jnp
    from rxmd_tpu import md
    from rxmd_tpu.config import RunConfig

    cfg = RunConfig(mdmode=1, dt_fs=0.25, ntime_step=nsteps, pstep=10**9,
                    sstep=10**9, isQEq=isqeq, QEq_tol=1e-7, dtype="float32")
    t0 = time.time()
    eng = md.Engine(ff, st, cfg, dtype=dtype)
    eng.prepare()
    prep = time.time() - t0
    # warmup: cover the single-step AND the fused-block step programs
    eng.run(2 + getattr(eng, "block_steps", 0), log=None)
    t0 = time.time()
    eng.run(nsteps, log=None)
    wall = time.time() - t0
    return st.n * nsteps / wall, prep, wall


def main():
    import jax
    import jax.numpy as jnp
    from rxmd_tpu import ffield, system

    # backend init first, timed separately: on a shared/tunneled chip the
    # first device op can block on the chip CLAIM for minutes — that wait
    # is environment latency, not framework compile time, and must not
    # pollute prepare_sec
    t0 = time.time()
    jax.block_until_ready(jnp.zeros(()))
    claim_sec = time.time() - t0

    # default = the measured single-chip sweet spot (SCALING.md round 5):
    # full-QEq throughput peaks at N=8,064 (87k) vs N=4,536 (80k)
    mc = tuple(int(x) for x in os.environ.get("BENCH_MC", "4,4,3").split(","))
    nsteps = int(os.environ.get("BENCH_STEPS", "50"))
    dtype = jnp.float32
    ff = ffield.parse_ffield("/root/reference/ffield")
    st = system.from_cellfile("/root/reference/conf/init.rdx/input.xyz",
                              ff.name_to_type, mc=mc, dtype=dtype)

    def note(msg, t0=[time.time()]):
        print(f"[bench +{time.time() - t0[0]:.0f}s] {msg}", file=sys.stderr,
              flush=True)

    note(f"N={st.n} atoms (mc={mc}), {nsteps} timed steps per mode; "
         f"backend claim {claim_sec:.0f}s")
    note("mode isQEq=1 (full CG, tol 1e-7 — the baseline's configuration)")
    aps1, prep1, wall1 = run_mode(ff, st, 1, nsteps, dtype)
    note(f"isQEq=1: {aps1:.3e} atom-steps/s  (prepare {prep1:.0f}s)")
    note("mode isQEq=2 (extended Lagrangian, 1 CG iter/step)")
    aps2, prep2, wall2 = run_mode(ff, st, 2, nsteps, dtype)
    note(f"isQEq=2: {aps2:.3e} atom-steps/s  (prepare {prep2:.0f}s)")

    baseline = 5.6e3  # reference atom-steps/s, isQEq=1 (BASELINE.md)
    print(json.dumps({
        "metric": "rdx_atom_steps_per_sec_per_chip",
        "value": round(aps1, 1),
        "unit": "atom*step/s",
        "vs_baseline": round(aps1 / baseline, 2),
        "exl_atom_steps_per_sec": round(aps2, 1),
        "natoms": st.n,
        "prepare_sec": round(max(prep1, prep2), 1),
        "backend_claim_sec": round(claim_sec, 1),
    }))


if __name__ == "__main__":
    main()
