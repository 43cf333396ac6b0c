#!/usr/bin/env python
"""Benchmark: RDX ReaxFF MD throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference runs RDX 168 atoms, 100 NVE steps with
QEq (tol 1e-7) in 2.998 s on one CPU rank => 5.6e3 atom-steps/s.  We run the
same physics (full QEq CG each step, f32 on TPU) on a replicated RDX cell
sized to keep the chip busy, and report atom-steps/s.
"""
import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from rxmd_tpu import ffield, system, md
    from rxmd_tpu.config import RunConfig

    mc = tuple(int(x) for x in os.environ.get("BENCH_MC", "3,3,3").split(","))
    nsteps = int(os.environ.get("BENCH_STEPS", "20"))
    dtype = jnp.float32
    ff = ffield.parse_ffield("/root/reference/ffield")
    st = system.from_cellfile("/root/reference/conf/init.rdx/input.xyz",
                              ff.name_to_type, mc=mc, dtype=dtype)
    # production setup: extended-Lagrangian QEq (1 CG step/step), as the
    # reference's own scaling deck uses (conf/bg-bench/rxmd.in isQEq=2)
    cfg = RunConfig(mdmode=1, dt_fs=0.25, ntime_step=nsteps, pstep=1000,
                    sstep=10000, isQEq=2, QEq_tol=1e-7, dtype="float32")
    def note(msg, t0=[time.time()]):
        print(f"[bench +{time.time() - t0[0]:.0f}s] {msg}", file=sys.stderr,
              flush=True)

    note(f"engine init (N={st.n})")
    eng = md.Engine(ff, st, cfg, dtype=dtype)
    note("prepare (compile)")
    eng.prepare()
    note("warmup steps (compile)")
    eng.run(2, log=None)
    note("timed run")
    t0 = time.time()
    eng.run(nsteps, log=None)
    wall = time.time() - t0
    note(f"done: {wall:.2f}s for {nsteps} steps")
    atom_steps = st.n * nsteps / wall

    baseline = 5.6e3  # reference atom-steps/s (BASELINE.md, README.md:164)
    print(json.dumps({
        "metric": "rdx_atom_steps_per_sec_per_chip",
        "value": round(atom_steps, 1),
        "unit": "atom*step/s",
        "vs_baseline": round(atom_steps / baseline, 2),
    }))


if __name__ == "__main__":
    main()
