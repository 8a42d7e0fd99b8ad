"""The reference's 32-model emulator-comparison golden suite, in full-TRG
mode, from injected-linear inputs (no CAMB binary needed).

This is the reference's primary accuracy contract
(`tests/emulator_comparison/test_models.py`): fresh solver runs compared
against the 32 stored high-accuracy outputs in
`output_kmax50_klogint1000/`, with its exact criteria:

  * massless-nu models M001-M010 (`test_models.py:86-89`):
      max |P_dd/P_dd_target - 1| < 1e-3 for k < 0.1/Mpc (physical k)
  * massive-nu models (`test_models.py:156-159`, applied there to
    M012-M032; we include M011, which the reference's loop skips):
      max < 5e-3 AND 95th percentile < 1e-3, on the
      f^2 = (f_cb + beta_P)^2 total-matter-corrected P_dd
      (`test_models.py:29-40`).

The linear inputs are reconstructed from the stored outputs' own PRINTLIN
columns (redtime_tpu.inject); the stored params files supply cosmology and
switches ("1 0 1 1" = full TRG, the production configuration,
`scripts/runRedTime:100-101`).  Both groups run as one vmapped batch —
massless models get a dummy (all-ones) neutrino table so the batch shares
static shapes; f_nu = 0 zeroes beta_P identically either way.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from redtime_tpu import driver, inject, model as mdl
from redtime_tpu.config import SolverConfig
from redtime_tpu.fastpt import engine_consts
from redtime_tpu.io.camb import LinearData

EMU = "/root/reference/tests/emulator_comparison/output_kmax50_klogint1000"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(EMU), reason="reference stored outputs unavailable")

NAMES = [f"M{i:03d}" for i in range(1, 33)]
MASSLESS = NAMES[:10]


def _pad_massless(lin: LinearData, p) -> LinearData:
    """Give a massless model the massive models' beta-table shapes (dummy
    ones; f_nu = 0 makes beta_P identically zero) so one vmapped batch can
    hold all 32."""
    z = np.asarray(p.z_interp, dtype=np.float64)
    a = 1.0 / (1.0 + z)
    k = np.exp(lin.t_lnk)
    return lin._replace(beta_a=a, beta_k=k,
                        beta_raw=np.ones((len(a), len(k))))


@pytest.fixture(scope="module")
def suite_results():
    cfg = SolverConfig()
    loaded = [inject.load_injected(cfg, f"{EMU}/params_redTime_{n}.dat",
                                   f"{EMU}/redTime_{n}.dat") for n in NAMES]
    settings, _ = driver.settings_from_params(loaded[0][0])
    assert not settings.one_loop and settings.nonlinear  # full TRG
    cosmos = [driver.settings_from_params(p)[1] for (p, _, _) in loaded]
    lins = [lin if p.Omega_nu / p.Omega_m >= 1e-10 else _pad_massless(lin, p)
            for (p, lin, _) in loaded]

    stack = lambda xs: jax.tree_util.tree_map(
        lambda *ys: jnp.stack(ys), *xs)
    cs = stack(cosmos)
    ls = stack(lins)
    norms = jnp.asarray([norm for (_, _, norm) in loaded])

    prep = jax.jit(jax.vmap(
        lambda c, l, n: mdl.prepare_model(cfg, c, l, norm_override=n)))
    ms = prep(cs, ls, norms)
    res = driver._jitted_solve(cfg, settings, "fft", True)(
        ms, engine_consts(cfg, "fft"))
    tables = np.asarray(res.table)          # [32, 8, nk, 17]
    assert not len(driver.finite_report(res))

    refs = np.stack([inject.read_output_blocks(f"{EMU}/redTime_{n}.dat",
                                               cfg.nk) for n in NAMES])
    params = [p for (p, _, _) in loaded]
    return params, tables, refs


def _rel_err(p, ours, ref):
    """|P/P_target - 1| over k < 0.1/Mpc at z=0, with the reference test's
    neutrino f^2 correction when f_nu > 0."""
    k_phys = ref[-1, :, 0] * p.h
    mask = k_phys < 0.1
    f_nu = p.Omega_nu / p.Omega_m

    def corrected(tab):
        pdd = tab[-1, :, 7]
        if f_nu < 1e-10:
            return pdd
        beta_p = f_nu * np.sqrt(tab[-1, :, 6] / tab[-1, :, 3])
        f = 1.0 - f_nu + beta_p
        return pdd * f * f

    return np.abs(corrected(ours)[mask] / corrected(ref)[mask] - 1.0)


def test_kgrids_identical(suite_results):
    _, tables, refs = suite_results
    assert np.allclose(tables[:, -1, :, 0], refs[:, -1, :, 0],
                       rtol=1e-10, atol=0.0)


def test_massless_models(suite_results):
    params, tables, refs = suite_results
    worst = {}
    for i, name in enumerate(NAMES[:10]):
        rel = _rel_err(params[i], tables[i], refs[i])
        worst[name] = rel.max()
        assert rel.max() < 1e-3, (name, rel.max())
    print("massless worst:", max(worst.values()))


def test_massive_models(suite_results):
    params, tables, refs = suite_results
    for i, name in enumerate(NAMES):
        if name in MASSLESS:
            continue
        rel = _rel_err(params[i], tables[i], refs[i])
        assert rel.max() < 5e-3, (name, rel.max())
        assert np.quantile(rel, 0.95) < 1e-3, (name,
                                               np.quantile(rel, 0.95))


def test_linear_columns_roundtrip(suite_results):
    """P_lin_cb at every output z reproduces the stored linear columns —
    the injected transfer/growth reconstruction is self-consistent."""
    params, tables, refs = suite_results
    rel = np.abs(tables[:, :, :, 3] / refs[:, :, :, 3] - 1.0)
    assert rel[:, -1].max() < 1e-9          # z=0: exact by construction
    assert rel.max() < 5e-3                 # earlier z: growth-consistent

def test_emulator_cross_check(suite_results):
    """Mira-Titan emulator cross-check (test_models.py:53-89 — the half
    of the reference golden suite that compares against the bundled
    CosmicEmu arrays).  Our fresh full-TRG outputs must sit against the
    emulator no worse than the stored high-accuracy targets do (within a
    small slack for the solve-vs-target band, itself < 1e-3):
    self-calibrating, so an emulator-side systematic can't mask a
    solver regression."""
    from redtime_tpu.emulator_check import emulator_rel_err, load_cosmicemu

    emudir = os.path.join(os.path.dirname(EMU), "emulator")
    if not os.path.isdir(emudir):
        pytest.skip("reference emulator arrays unavailable")
    emu = load_cosmicemu(emudir)

    params, tables, refs = suite_results
    for i, name in enumerate(NAMES):
        p = params[i]
        f_nu = p.Omega_nu / p.Omega_m

        def corrected(tab):
            pdd = tab[-1, :, 7]
            if f_nu < 1e-10:
                return pdd
            beta_p = f_nu * np.sqrt(tab[-1, :, 6] / tab[-1, :, 3])
            return pdd * (1.0 - f_nu + beta_p) ** 2

        k_code = tables[i][-1, :, 0]
        ours = emulator_rel_err(k_code, corrected(tables[i]), p.h, emu, i)
        target = emulator_rel_err(refs[i][-1, :, 0], corrected(refs[i]),
                                  p.h, emu, i)
        assert ours.max() < target.max() + 1.1e-3, (
            name, ours.max(), target.max())
