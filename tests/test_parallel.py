"""Multi-device domain-decomposition tests on a virtual CPU mesh.

The 1x1x1 mesh must reproduce the single-device golden numbers exactly (the
halo self-exchange builds the same periodic images the image-table path
builds).  The 2x2x2 mesh over 8 virtual devices checks the full sharded
pipeline: distribution, halo exchange with transitive corners, distributed
QEq, grad-through-ppermute forces, and migration.
"""
import numpy as np
import pytest
import jax

from rxmd_tpu import ffield, system
from rxmd_tpu.config import RunConfig
from rxmd_tpu.parallel.engine import ShardedEngine, factor_mesh

FF = "/root/reference/ffield"
CELL = "/root/reference/conf/init.rdx/input.xyz"


def test_factor_mesh():
    assert factor_mesh(8) == (2, 2, 2)
    assert factor_mesh(4) == (2, 2, 1)
    assert factor_mesh(1) == (1, 1, 1)


@pytest.mark.slow
def test_mesh1_matches_golden():
    ff = ffield.parse_ffield(FF)
    st = system.from_cellfile(CELL, ff.name_to_type)
    cfg = RunConfig(mdmode=1, dt_fs=0.25, isQEq=1, QEq_tol=1e-7)
    eng = ShardedEngine(ff, st, cfg, mesh_shape=(1, 1, 1),
                        devices=jax.devices()[:1])
    comps = eng.prepare()
    assert abs(float(comps[0]) / st.n - (-98.2464)) < 2e-4


@pytest.mark.slow
def test_mesh8_matches_golden_and_steps():
    ff = ffield.parse_ffield(FF)
    st = system.from_cellfile(CELL, ff.name_to_type, mc=(2, 2, 2))
    cfg = RunConfig(mdmode=1, dt_fs=0.25, isQEq=1, QEq_tol=1e-7)
    eng = ShardedEngine(ff, st, cfg, mesh_shape=(2, 2, 2))
    comps = eng.prepare()
    c = np.asarray(comps) / st.n
    assert abs(c[0] - (-98.2464)) < 2e-4
    assert abs(c[1] - (-136.8986)) < 2e-3
    pe0 = c[0]
    eng.run(1)
    assert eng.n_atoms == st.n                      # no atoms lost
    te = (float(eng.comps[0]) + float(eng.ke)) / st.n
    assert abs(te - pe0) < 5e-4                     # energy conserved
