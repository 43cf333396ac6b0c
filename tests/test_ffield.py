"""Force-field ingestion golden tests.

Golden values come from the reference's console banner for the RDX deck
(ref: README.md:127-155): atom ordering C,H,O,N,...; maxrc = 3.160 once
cutoffs of absent types are zeroed (ref: init.F90:404-416).
"""
import numpy as np

from rxmd_tpu import ffield

FF = "/root/reference/ffield"


def test_parse_basic():
    ff = ffield.parse_ffield(FF)
    assert ff.nso == 7
    assert ff.atom_names == ["C", "H", "O", "N", "S", "Si", "X"]
    assert ff.header.startswith("Reactive MD-force field: nitramines")
    assert ff.nboty == 18


def test_cutoffs_match_reference_banner():
    ff = ffield.parse_ffield(FF)
    # README.md:149 prints "maxrc, lcsize [A]: 3.160 ..." for the CHON-only
    # RDX system
    types_chon = np.array([0, 1, 2, 3])
    assert abs(ffield.effective_maxrc(ff, types_chon) - 3.160) < 1e-9


def test_masses_and_valences():
    ff = ffield.parse_ffield(FF)
    assert np.allclose(ff.mass[:4], [12.0, 1.008, 15.999, 14.0], atol=0.2)
    assert np.allclose(ff.Val[:4], [4.0, 1.0, 2.0, 3.0])
    # H has no pi bonds: switch(2:3) must be 0 for any pair involving H
    h = 1
    for j in range(4):
        b = ff.inxn2[h, j]
        assert ff.switch[b, 1] == 0.0 and ff.switch[b, 2] == 0.0


def test_eta_doubling_and_units():
    ff = ffield.parse_ffield(FF)
    # eta stored doubled (ref: param.F90:361); raw file values are ~6-10 eV
    assert (ff.eta[:4] > 10.0).all() and (ff.eta[:4] < 30.0).all()


def test_tables_smooth_at_cutoff():
    ff = ffield.parse_ffield(FF)
    tbl = ffield.build_tables(ff)
    # taper makes the kernels vanish at r = rctap
    assert np.allclose(tbl["evdw"][:, -1], 0.0, atol=1e-8)
    assert np.allclose(tbl["eclmb"][:, -1], 0.0, atol=1e-8)
    # and the Coulomb kernel is positive and decreasing in the midrange
    b = ff.inxn2[0, 0]
    mid = tbl["eclmb"][b, 100:4000]
    assert (mid > 0).all()
    assert (np.diff(mid) < 0).all()
