"""Numeric oracle for the PRINT* extended output columns.

The reference's print loop (redTime.cc:1684-1741) appends, per switch:
  PRINTA     14 unique A_{acd,bef} components, NO scale factor
  PRINTI     the 14 evolved unique I components of y, NO scale factor
  PRINTBIAS  (with PRINTRSD) the P_B split into 5 (j_mu, m_b) columns
             (2,2) (2,1) (4,1) (4,0) (6,0) x (a/a_in)^3, the 9 PTjm
             columns (2,2)(2,1)(2,0)(4,2)(4,1)(4,0)(6,1)(6,0)(8,0)
             x (a/a_in)^4, and the 8 McDonald-Roy PMR columns
             d2d d2t s2d s2t d2d2 d2s2 s2s2 3nl x (a/a_in)^4
  !PRINTBIAS (with PRINTRSD) P_B2 = (2,2)+(2,1), P_B4 = (4,1)+(4,0),
             P_B6 = (6,0) x (a/a_in)^3 and PT2/4/6/8 (m-collapsed,
             redTime.cc:1353-1357) x (a/a_in)^4
  PRINTQ     the 24 evolved Q components x (a/a_in)^3

These tests reconstruct every group INDEPENDENTLY from the raw state —
the P_B columns via a fresh transcription of the reference's Pbisj
rational combos (redTime.cc:265-298) applied directly to the Q slots of
y — so a swapped column, a wrong (a/a_in) power, or a broken Q index
map fails loudly.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from redtime_tpu import driver, trg
from redtime_tpu.config import RunSettings, SolverConfig
from redtime_tpu.fastpt import engine_consts


def _setup():
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _cosmo, _example_inputs
    from redtime_tpu import model as mdl

    cfg = SolverConfig(nk=16, np_factor=4, growth_n_lna=10, growth_n_lnk=6,
                       quad_panels=8, quad_order=8,
                       print_a=True, print_i=True, print_q=True,
                       print_bias=True, fft_mode="fft")
    settings = RunSettings(one_loop=True, z_out=(3.0, 0.0))
    lin = _example_inputs(cfg)
    model = jax.jit(lambda c, l: mdl.prepare_model(cfg, c, l))(_cosmo(1),
                                                               lin)
    return cfg, settings, model


@pytest.fixture(scope="module")
def evolved():
    cfg, settings, model = _setup()
    ys, cache = trg.evolve(cfg, settings, model, mode="fft")
    return cfg, settings, model, np.asarray(ys)


def _pbis_reference(k, y, nk):
    """Fresh transcription of Pbisj (redTime.cc:265-298): QQ(ellm1,a,b,c)
    = y[(nUP + nUI + ellm1*8 + 4a + 2b + c)*nk + i]."""
    def QQ(ellm1, a, b, c):
        return y[trg.NUP + trg.NUI + ellm1 * 8 + 4 * a + 2 * b + c]

    p22 = -2.0 * QQ(0, 0, 1, 0) + (4.0 / 3.0) * QQ(1, 0, 1, 0)
    p21 = (4.0 / 3.0) * QQ(1, 0, 1, 1) + (6.0 / 5.0) * QQ(2, 0, 1, 1)
    p41 = (-2.0 * QQ(0, 1, 1, 0) + (4.0 / 3.0) * QQ(1, 1, 1, 0)
           - 2.0 * QQ(0, 0, 1, 1) - 2.0 * QQ(2, 0, 1, 1))
    p40 = (4.0 / 3.0) * QQ(1, 1, 1, 1) + (6.0 / 5.0) * QQ(2, 1, 1, 1)
    p60 = -2.0 * QQ(0, 1, 1, 1) - 2.0 * QQ(2, 1, 1, 1)
    return np.pi * k[None, :] * np.stack([p22, p21, p41, p40, p60])


def test_extended_columns_oracle(evolved):
    cfg, settings, model, ys = evolved
    g = trg.make_grids(cfg)
    k = np.asarray(g.k)
    nk = cfg.nk
    ncol = driver.n_columns(cfg, settings)
    # layout: k | 6 lin | 3 P | 14 A | 14 I | 5 PB + 9 PT + 8 PMR | 24 Q
    assert ncol == 1 + 6 + 3 + 14 + 14 + 22 + 24

    ec = engine_consts(cfg, "fft")
    for i_eta, z in enumerate(settings.z_out):
        y = ys[i_eta].reshape(trg.NU_STATE, nk)
        block = np.asarray(driver.build_output_block(
            cfg, settings, model, jnp.asarray(y), z,
            mode="fft", ec=ec))
        assert block.shape == (nk, ncol)
        a = 1.0 / (1.0 + z)
        r = a / settings.a_in
        c = 1 + 6

        # P columns: exp(y) x (a/a_in)^2 exactly
        np.testing.assert_allclose(
            block[:, c:c + 3], (np.exp(y[0:3]) * r ** 2).T, rtol=1e-14)
        c += 3

        # PRINTA: the raw A_u assembly at the output time, NO scale
        A_u, _, PTjm, PMR = (np.asarray(x) for x in
                             trg.compute_mode_coupling_full(
                                 cfg, jnp.asarray(y[0:3]),
                                 model.cosmo.n_s, True,
                                 jnp.asarray(k), "fft", ec))
        np.testing.assert_allclose(block[:, c:c + 14], A_u.T,
                                   rtol=1e-12, atol=1e-300)
        c += 14

        # PRINTI: raw state slots, bitwise
        np.testing.assert_array_equal(
            block[:, c:c + 14], y[trg.NUP:trg.NUP + trg.NUI].T)
        c += 14

        # PRINTBIAS P_B columns: independent Pbisj transcription x r^3
        pb_ref = _pbis_reference(k, y, nk)
        np.testing.assert_allclose(block[:, c:c + 5], (pb_ref * r ** 3).T,
                                   rtol=1e-12, atol=1e-300)
        c += 5

        # PT columns x r^4 in (j,m) order, then PMR x r^4
        np.testing.assert_allclose(block[:, c:c + 9], (PTjm * r ** 4).T,
                                   rtol=1e-12, atol=1e-300)
        c += 9
        np.testing.assert_allclose(block[:, c:c + 8], (PMR * r ** 4).T,
                                   rtol=1e-12, atol=1e-300)
        c += 8

        # PRINTQ: raw Q slots x r^3, bitwise-grade
        np.testing.assert_allclose(
            block[:, c:c + 24],
            (y[trg.NUP + trg.NUI:] * r ** 3).T, rtol=1e-15)
        c += 24
        assert c == ncol


def test_bias_split_consistent_with_collapsed(evolved):
    """print_bias=False must print P_B2=(2,2)+(2,1), P_B4=(4,1)+(4,0),
    P_B6=(6,0) and the m-collapsed PT2/4/6/8 (redTime.cc:1727-1734) —
    i.e. exact sums of the print_bias=True columns."""
    cfg, settings, model, ys = evolved
    cfg_nb = dataclasses.replace(cfg, print_bias=False)
    ec = engine_consts(cfg, "fft")
    z = settings.z_out[-1]
    y = jnp.asarray(ys[-1].reshape(trg.NU_STATE, cfg.nk))
    b_bias = np.asarray(driver.build_output_block(
        cfg, settings, model, y, z, mode="fft", ec=ec))
    b_nb = np.asarray(driver.build_output_block(
        cfg_nb, settings, model, y, z, mode="fft", ec=ec))
    c = 1 + 6 + 3 + 14 + 14
    pb5 = b_bias[:, c:c + 5]
    pt9 = b_bias[:, c + 5:c + 14]
    # collapsed blocks live at the same offset in the non-bias layout
    np.testing.assert_allclose(
        b_nb[:, c], pb5[:, 0] + pb5[:, 1], rtol=1e-13, atol=1e-300)
    np.testing.assert_allclose(
        b_nb[:, c + 1], pb5[:, 2] + pb5[:, 3], rtol=1e-13, atol=1e-300)
    np.testing.assert_allclose(b_nb[:, c + 2], pb5[:, 4],
                               rtol=1e-15, atol=1e-300)
    np.testing.assert_allclose(
        b_nb[:, c + 3], pt9[:, 0] + pt9[:, 1] + pt9[:, 2],
        rtol=1e-13, atol=1e-300)
    np.testing.assert_allclose(
        b_nb[:, c + 4], pt9[:, 3] + pt9[:, 4] + pt9[:, 5],
        rtol=1e-13, atol=1e-300)
    np.testing.assert_allclose(
        b_nb[:, c + 5], pt9[:, 6] + pt9[:, 7], rtol=1e-13, atol=1e-300)
    np.testing.assert_allclose(b_nb[:, c + 6], pt9[:, 8],
                               rtol=1e-15, atol=1e-300)
    # and the Q block follows immediately after in both layouts
    assert b_nb.shape[1] == c + 7 + 24


def test_full_trg_extended_blocks_zero(evolved):
    """In full-TRG mode (SWITCH_1LOOP=0) the output-time recomputation is
    gated off (redTime.cc:1646): the PRINTA block and the PT/PMR columns
    print ZERO while P_B (from evolved Q) stays populated — the
    documented reference caveat, now pinned for the extended layout."""
    cfg, _, model, ys = evolved
    settings = RunSettings(one_loop=False, z_out=(3.0, 0.0))
    ec = engine_consts(cfg, "fft")
    y = jnp.asarray(ys[-1].reshape(trg.NU_STATE, cfg.nk))
    b = np.asarray(driver.build_output_block(
        cfg, settings, model, y, 0.0, mode="fft", ec=ec))
    c = 1 + 6 + 3
    assert np.all(b[:, c:c + 14] == 0.0)            # A block
    c += 14 + 14
    assert np.any(b[:, c:c + 5] != 0.0)             # P_B from evolved Q
    assert np.all(b[:, c + 5:c + 22] == 0.0)        # PT + PMR blocks


def test_fill_pt_full_trg_flag(evolved):
    """cfg.fill_pt_full_trg=True populates the PT/PMR (and PRINTA)
    columns in full-TRG mode from the evolved spectra — identical to the
    1-loop-mode output-time recomputation at matched spectra (the
    reference wart at redTime.cc:1646, fixed behind the opt-in flag)."""
    cfg, _, model, ys = evolved
    cfg_fill = dataclasses.replace(cfg, fill_pt_full_trg=True)
    ec = engine_consts(cfg, "fft")
    y = jnp.asarray(ys[-1].reshape(trg.NU_STATE, cfg.nk))
    s_full = RunSettings(one_loop=False, z_out=(3.0, 0.0))
    s_1l = RunSettings(one_loop=True, z_out=(3.0, 0.0))
    b_fill = np.asarray(driver.build_output_block(
        cfg_fill, s_full, model, y, 0.0, mode="fft", ec=ec))
    b_1l = np.asarray(driver.build_output_block(
        cfg, s_1l, model, y, 0.0, mode="fft", ec=ec))
    # every column now matches the 1-loop-mode recomputation exactly
    np.testing.assert_array_equal(b_fill, b_1l)
    c = 1 + 6 + 3 + 14 + 14
    assert np.any(b_fill[:, c + 5:c + 22] != 0.0)   # PT/PMR populated
