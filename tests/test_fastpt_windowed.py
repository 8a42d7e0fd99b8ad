"""Windowed + radix-split engine path vs the exact fft-mode engine.

The production TPU hot path (`fastpt.compute_J_PZ_windowed`, matmul mode)
restricts the output transforms to the assembly's read set (reference
reads redTime.cc:813-1279 [nshift+i] and :1252 nloMR) and computes the
output-leg rfft as a radix-r split-DIT.  Both must be numerically
equivalent to slicing the full fft-mode engine outputs.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from redtime_tpu import fastpt
from redtime_tpu.config import SolverConfig
from redtime_tpu.grids import make_grids


def _smooth_spectrum(cfg):
    """BBKS-shaped P(k) on the solver grid -> extended-grid spectra."""
    k = np.logspace(np.log10(cfg.kmin), np.log10(cfg.kmax), cfg.nk)
    q = k / 0.2
    T = (np.log(1 + 2.34 * q) / (2.34 * q)
         * (1 + 3.89 * q + (16.1 * q) ** 2 + (5.46 * q) ** 3
            + (6.71 * q) ** 4) ** -0.25)
    P = 2e4 * k ** 0.96 * T ** 2
    lnP3 = jnp.asarray(np.log(np.stack([P, 0.9 * P, 0.81 * P])))
    return fastpt.extend_power(cfg, lnP3, 0.96)


@pytest.mark.parametrize("radix", [1, 2, 4, 8])
@pytest.mark.parametrize("with_rsd", [True, False])
def test_windowed_matches_fft_truth(radix, with_rsd):
    cfg = SolverConfig(nk=64, fft_mode="matmul", conv_radix=radix)
    g = fastpt.make_grids(cfg)
    P_ext = _smooth_spectrum(cfg)

    Jf, PZf = fastpt.compute_J_PZ(cfg, P_ext, with_rsd, "fft")
    sl = slice(g.nshift, g.nshift + cfg.nk)
    nlo = g.nshift - cfg.nk // 2

    ec = fastpt.engine_consts(cfg, "matmul")
    Jw, J_lo, PZw = fastpt.compute_J_PZ_windowed(cfg, P_ext, with_rsd,
                                                 "matmul", ec)
    assert Jw.shape == (fastpt.NFAM, 3, 3, cfg.nk)

    scale = float(jnp.max(jnp.abs(Jf[..., sl])))
    nfam = fastpt.NFAM if with_rsd else fastpt.NFAM_J
    np.testing.assert_allclose(np.asarray(Jw[:nfam]),
                               np.asarray(Jf[:nfam, :, :, sl]),
                               atol=2e-11 * scale, rtol=0)
    if not with_rsd:   # RSD families zero-filled
        assert float(jnp.max(jnp.abs(Jw[nfam:]))) == 0.0
    np.testing.assert_allclose(float(J_lo), float(Jf[0, 0, 0, nlo]),
                               atol=2e-11 * max(scale, 1.0))
    np.testing.assert_allclose(np.asarray(PZw), np.asarray(PZf[..., sl]),
                               rtol=1e-10)


def test_ozaki_tab_leg_matches_dot():
    """The diagonal-grouped int8 tab leg (convolution backward transform
    as exact-int32 slice dots) must agree with the f64 dot to ~1e-12."""
    cfg_d = SolverConfig(nk=64, fft_mode="matmul", out_leg="dot",
                         tab_leg="dot")
    cfg_t = SolverConfig(nk=64, fft_mode="matmul", out_leg="dot",
                         tab_leg="ozaki")
    P_ext = _smooth_spectrum(cfg_d)
    for with_rsd in (True, False):
        out_d = fastpt.compute_J_PZ_windowed(
            cfg_d, P_ext, with_rsd, "matmul",
            fastpt.engine_consts(cfg_d, "matmul"))
        out_t = fastpt.compute_J_PZ_windowed(
            cfg_t, P_ext, with_rsd, "matmul",
            fastpt.engine_consts(cfg_t, "matmul"))
        scale = float(jnp.max(jnp.abs(out_d[0])))
        assert float(jnp.max(jnp.abs(out_t[0] - out_d[0]))) < 1e-11 * scale
        assert abs(float(out_t[1] - out_d[1])) < 1e-11 * max(scale, 1.0)


def test_ozaki_out_leg_matches_dot():
    """The Ozaki composite output leg (production TPU path: integer bf16
    slice products with exact f32 accumulation, two-sided balancing) must
    agree with the f64 flat-dot path to ~1e-12 of scale (exact int32
    slice-product accumulation; the scales are exact powers of two built
    by bit-casting — jnp.exp2 is ~1e-8 off for integer args)."""
    cfg_d = SolverConfig(nk=64, fft_mode="matmul", out_leg="dot",
                         tab_leg="dot")
    cfg_o = SolverConfig(nk=64, fft_mode="matmul", out_leg="ozaki",
                         tab_leg="dot")
    P_ext = _smooth_spectrum(cfg_d)
    for with_rsd in (True, False):
        out_d = fastpt.compute_J_PZ_windowed(
            cfg_d, P_ext, with_rsd, "matmul",
            fastpt.engine_consts(cfg_d, "matmul"))
        out_o = fastpt.compute_J_PZ_windowed(
            cfg_o, P_ext, with_rsd, "matmul",
            fastpt.engine_consts(cfg_o, "matmul"))
        scale = float(jnp.max(jnp.abs(out_d[0])))
        assert float(jnp.max(jnp.abs(out_o[0] - out_d[0]))) < 1e-10 * scale
        assert abs(float(out_o[1] - out_d[1])) < 1e-10 * max(scale, 1.0)
        np.testing.assert_allclose(np.asarray(out_o[2]),
                                   np.asarray(out_d[2]), rtol=1e-12)


def test_ozaki_pz_leg_matches_dot():
    """The two-sided-balanced int8 PZ Toeplitz leg must agree with the
    f64 einsum to ~1e-14 of the PZ maximum: the contraction cancels ~1e8
    of operand scale per element, so this is exactly the case a
    column-only slice grid fails (1.5e-5 of max) and the per-row
    activation-folded balancing fixes (scripts/probe_pz_ozaki.py)."""
    cfg_d = SolverConfig(nk=64, fft_mode="matmul", pz_leg="dot")
    cfg_o = SolverConfig(nk=64, fft_mode="matmul", pz_leg="ozaki")
    P_ext = _smooth_spectrum(cfg_d)
    for with_rsd in (True, False):
        PZ_d = fastpt.compute_J_PZ_windowed(
            cfg_d, P_ext, with_rsd, "matmul",
            fastpt.engine_consts(cfg_d, "matmul"))[2]
        PZ_o = fastpt.compute_J_PZ_windowed(
            cfg_o, P_ext, with_rsd, "matmul",
            fastpt.engine_consts(cfg_o, "matmul"))[2]
        scale = float(jnp.max(jnp.abs(PZ_d)))
        assert float(jnp.max(jnp.abs(PZ_o - PZ_d))) < 1e-13 * scale
        # elementwise: the balanced scheme tracks small elements too
        np.testing.assert_allclose(np.asarray(PZ_o), np.asarray(PZ_d),
                                   rtol=1e-6, atol=1e-14 * scale)


def test_ozaki_fwd_leg_matches_dot():
    """The int8 forward stage (Pab extension dot + windowed forward
    transform) must agree with the f64 dots below their own rounding:
    the extension feeds exp(), so errors are relative on the spectrum."""
    cfg_d = SolverConfig(nk=64, fft_mode="matmul", fwd_leg="dot")
    cfg_o = SolverConfig(nk=64, fft_mode="matmul", fwd_leg="ozaki")
    k = np.logspace(np.log10(cfg_d.kmin), np.log10(cfg_d.kmax), cfg_d.nk)
    q = k / 0.2
    T = (np.log(1 + 2.34 * q) / (2.34 * q)
         * (1 + 3.89 * q + (16.1 * q) ** 2 + (5.46 * q) ** 3
            + (6.71 * q) ** 4) ** -0.25)
    P = 2e4 * k ** 0.96 * T ** 2
    lnP3 = jnp.asarray(np.log(np.stack([P, 0.9 * P, 0.81 * P])))
    ec_o = fastpt.engine_consts(cfg_o, "matmul")
    Pe_d = fastpt.extend_power(cfg_d, lnP3, 0.96,
                               fastpt.engine_consts(cfg_d, "matmul"))
    Pe_o = fastpt.extend_power(cfg_o, lnP3, 0.96, ec_o)
    # the extension's extrapolation weights reach ~1e2, so the dropped
    # slice pairs land ~7e-12 relative (vs ~1e-13 for the f64 dot's own
    # rounding) — far below the J legs' 1e-10 bar and the controller's
    # 1e-7 absolute tolerance
    np.testing.assert_allclose(np.asarray(Pe_o), np.asarray(Pe_d),
                               rtol=2e-11)
    for with_rsd in (True, False):
        out_d = fastpt.compute_J_PZ_windowed(
            cfg_d, Pe_d, with_rsd, "matmul",
            fastpt.engine_consts(cfg_d, "matmul"))
        out_o = fastpt.compute_J_PZ_windowed(
            cfg_o, Pe_d, with_rsd, "matmul", ec_o)
        scale = float(jnp.max(jnp.abs(out_d[0])))
        assert float(jnp.max(jnp.abs(out_o[0] - out_d[0]))) < 1e-10 * scale
        assert abs(float(out_o[1] - out_d[1])) < 1e-10 * max(scale, 1.0)


def test_ozaki_q6_wide_grid():
    """np = 8 nk pushes the output-leg contraction length to 2np = 2048,
    where the exact-accumulation bound forces q = 6-bit slices and more
    of them; the slice-count arithmetic must adapt."""
    cfg_d = SolverConfig(nk=128, np_factor=8, fft_mode="matmul",
                         out_leg="dot", tab_leg="dot")
    cfg_o = SolverConfig(nk=128, np_factor=8, fft_mode="matmul",
                         out_leg="ozaki", tab_leg="ozaki")
    assert fastpt._oz_q(2 * cfg_o.npts) == 6
    P_ext = _smooth_spectrum(cfg_d)
    out_d = fastpt.compute_J_PZ_windowed(
        cfg_d, P_ext, True, "matmul", fastpt.engine_consts(cfg_d, "matmul"))
    out_o = fastpt.compute_J_PZ_windowed(
        cfg_o, P_ext, True, "matmul", fastpt.engine_consts(cfg_o, "matmul"))
    scale = float(jnp.max(jnp.abs(out_d[0])))
    assert float(jnp.max(jnp.abs(out_o[0] - out_d[0]))) < 1e-10 * scale
    assert abs(float(out_o[1] - out_d[1])) < 1e-10 * max(scale, 1.0)


def test_oz_bits_truncation_band():
    """The oz_bits knob's contract (config.py oz_bits docstring): pack
    bytes shrink roughly linearly with the requested mantissa coverage
    while engine accuracy degrades GRACEFULLY — from the ~1e-12-of-scale
    full-coverage band into a ~1e-8-grade noise band at truncating
    settings, still ~100x below the HIGH_ACCURACY erel_P=1e-6 the knob
    targets.  At nk=64 (q=7 slices) bits=36 keeps the top slices intact
    (measured 2.5e-12) and bits=24 lands the truncation band (measured
    3.6e-8); cut arithmetic is monotone in bits."""
    cfg_d = SolverConfig(nk=64, fft_mode="matmul", out_leg="dot",
                         tab_leg="dot", pz_leg="dot", fwd_leg="dot")
    P_ext = _smooth_spectrum(cfg_d)
    out_d = fastpt.compute_J_PZ_windowed(
        cfg_d, P_ext, True, "matmul", fastpt.engine_consts(cfg_d, "matmul"))
    scale = float(jnp.max(jnp.abs(out_d[0])))

    devs, nbytes = {}, {}
    for bits in (0, 36, 24):
        cfg = SolverConfig(nk=64, fft_mode="matmul", out_leg="ozaki",
                           tab_leg="ozaki", pz_leg="ozaki", fwd_leg="ozaki",
                           oz_bits=bits)
        nbytes[bits] = sum(fastpt._oz_leg_bytes(cfg).values())
        out = fastpt.compute_J_PZ_windowed(
            cfg, P_ext, True, "matmul", fastpt.engine_consts(cfg, "matmul"))
        devs[bits] = float(jnp.max(jnp.abs(out[0] - out_d[0]))) / scale
        # the PZ leg's +27-bit cancellation guard keeps the Toeplitz
        # contraction exact-grade at every tested setting
        pz_dev = float(jnp.max(jnp.abs(out[2] - out_d[2]))) \
            / float(jnp.max(jnp.abs(out_d[2])))
        assert pz_dev < 1e-13, (bits, pz_dev)

    # pack bytes (the engine's HBM streaming cost) shrink monotonically
    assert nbytes[0] > nbytes[36] > nbytes[24]
    # full coverage: the round-2/3 exact-grade band
    assert devs[0] < 1e-10, devs
    # bits=36 at q=7: top slices intact, still exact-grade
    assert devs[36] < 1e-10, devs
    # bits=24: the documented truncation band — well above the full
    # band (the knob measurably bites) yet ~100x below erel_P=1e-6
    assert 1e-12 < devs[24] < 5e-7, devs


def test_oz_bits_leg_cut_arithmetic():
    """_leg_cut: 0 = full coverage; monotone non-increasing in the pack
    cut as bits shrink; never below one diagonal; the per-leg
    cancellation guards (OZ_EXTRA_OUT/PZ) add to the kept bits."""
    q = 7
    full = 15
    assert fastpt._leg_cut(full, q, 0, 0) == full
    cuts = [fastpt._leg_cut(full, q, b, 0) for b in (53, 42, 36, 24, 8, 1)]
    assert all(a >= b for a, b in zip(cuts, cuts[1:]))
    assert cuts[-1] >= 1
    assert fastpt._leg_cut(full, q, 24, fastpt.OZ_EXTRA_PZ) \
        >= fastpt._leg_cut(full, q, 24, 0)
    # never exceeds full coverage however large the request
    assert fastpt._leg_cut(full, q, 10_000, 0) == full


def test_windowed_fallback_slices_full_path():
    """fft mode has no fused constants: the windowed API must fall back to
    compute_J_PZ + slicing, bit-identically."""
    cfg = SolverConfig(nk=64, fft_mode="fft")
    g = fastpt.make_grids(cfg)
    P_ext = _smooth_spectrum(cfg)
    J, PZ = fastpt.compute_J_PZ(cfg, P_ext, True, "fft")
    Jw, J_lo, PZw = fastpt.compute_J_PZ_windowed(cfg, P_ext, True, "fft")
    sl = slice(g.nshift, g.nshift + cfg.nk)
    assert jnp.array_equal(Jw, J[..., sl])
    assert jnp.array_equal(PZw, PZ[..., sl])
    assert float(J_lo) == float(J[0, 0, 0, g.nshift - cfg.nk // 2])


def test_ozaki_out_leg_small_grid():
    """Regression: the out-leg pack must cap q at 7 like its consumer —
    at nk=32 (K=256, uncapped q=8) the top slice wrapped int8 and the
    diagonal scales mismatched, producing garbage J."""
    outs = {}
    for leg in ("dot", "ozaki"):
        cfg = SolverConfig(nk=32, fft_mode="matmul", out_leg=leg,
                           tab_leg="dot", pz_leg="dot", fwd_leg="dot")
        g = make_grids(cfg)
        k = np.asarray(g.k)
        qq = k / 0.15
        T = (np.log(1 + 2.34 * qq) / (2.34 * qq)
             / (1 + 3.89 * qq + (16.1 * qq) ** 2 + (5.46 * qq) ** 3
                + (6.71 * qq) ** 4) ** 0.25)
        P = 4.0e6 * k ** 0.96 * T * T
        lnP3 = jnp.broadcast_to(jnp.log(jnp.asarray(P)), (3, g.nk))
        ec = fastpt.engine_consts(cfg, "matmul")
        P_ext = fastpt.extend_power(cfg, lnP3, 0.96, ec)
        Jw, _, _ = fastpt.compute_J_PZ_windowed(cfg, P_ext, True,
                                                "matmul", ec)
        outs[leg] = np.asarray(Jw)
    dev = (np.abs(outs["dot"] - outs["ozaki"]).max()
           / np.abs(outs["dot"]).max())
    assert dev < 1e-11
