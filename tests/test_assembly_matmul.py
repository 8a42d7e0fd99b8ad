"""The matmul-form assembly (assembly.asm_consts / assemble_matmul) must
reproduce the transcribed direct form (`assembly.assemble`, the verified
contract vs reference redTime.cc:813-1279) to f64 roundoff.

The matrix is DERIVED from the direct form by basis probing, so this test
exercises the probing + k-power fit exactness on random dense inputs, the
with_rsd gating, and the dispatch inside trg.compute_mode_coupling_full.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from redtime_tpu import assembly, fastpt, trg
from redtime_tpu.config import SolverConfig
from redtime_tpu.grids import make_grids


@pytest.fixture(scope="module")
def consts():
    g = make_grids(SolverConfig())
    return g, assembly.asm_consts(np.asarray(g.k))


def _rand_inputs(nk, seed=0):
    rng = np.random.default_rng(seed)
    scale = np.exp(rng.uniform(-4, 4, (7, 3, 3, nk)))
    Jf = rng.standard_normal((7, 3, 3, nk)) * scale
    PZf = rng.standard_normal((7, 3, 3, nk))
    Jn0f = rng.standard_normal((7, 3, 3, nk))
    return Jf, PZf, Jn0f, float(rng.standard_normal())


@pytest.mark.parametrize("with_rsd", [True, False])
def test_matmul_matches_direct(consts, with_rsd):
    g, full = consts
    # the with_rsd=False pack drops the R/PT rows (the direct form skips
    # them under the same flag) — exercise the reduced pack there
    Cc, kwr, S = (full if with_rsd else
                  assembly.asm_consts(np.asarray(g.k), with_rsd=False))
    Jf, PZf, Jn0f, J_lo = _rand_inputs(g.nk)
    k = jnp.asarray(g.k)
    Jn0 = jnp.asarray(Jn0f) if with_rsd else jnp.zeros((0, 3, 3, g.nk))
    ref = assembly.assemble(jnp.asarray(Jf), jnp.asarray(PZf), Jn0,
                            J_lo, k, with_rsd)
    got = assembly.assemble_matmul(jnp.asarray(Jf), jnp.asarray(PZf), Jn0,
                                   J_lo, k, with_rsd, jnp.asarray(Cc),
                                   jnp.asarray(kwr), jnp.asarray(S))
    for name, a, b in zip(("A", "R", "PT", "PMR"), ref, got):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-300
        assert np.abs(a - b).max() / scale < 1e-12, name


def test_power_span_exhaustive(consts):
    """Every derived (output, feature) coefficient profile reconstructs the
    probed map to 1e-9 of the per-output scale (asserted inside asm_consts;
    here we just confirm the cached derivation exists and is well-formed)."""
    g, (Cc, kwr, S) = consts
    nrows = Cc.shape[0]
    assert Cc.shape == (nrows, assembly.ASM_NFEAT)
    assert kwr.shape == (nrows, g.nk)
    assert S.shape == (assembly.ASM_NOUT, nrows)
    assert np.count_nonzero(Cc) > 500
    # each output row is fed by at least one compact row
    assert np.all(S.sum(axis=1) >= 1)


def test_dispatch_in_mode_coupling(consts):
    """compute_mode_coupling_full(asm_leg='matmul') == ('direct') on CPU."""
    g, _ = consts
    rng = np.random.default_rng(3)
    lnP = jnp.asarray(rng.uniform(-2.0, 6.0, (3, g.nk)))
    k = jnp.asarray(g.k)
    outs = {}
    for leg in ("direct", "matmul"):
        cfg = SolverConfig(asm_leg=leg)
        outs[leg] = trg.compute_mode_coupling_full(
            cfg, lnP, 0.97, True, k, mode="fft",
            ec=fastpt.engine_consts(cfg, "fft"))
    # On real engine inputs the R combos cancel ~1e6 of operand scale, so
    # BOTH forms carry ~1e-9 of max vs long-double truth (measured: direct
    # 9.2e-10, matmul 2.3e-10) — the tolerance reflects the conditioning,
    # not a defect of either form.
    tol = {"A": 1e-10, "R": 5e-9, "PT": 1e-10, "PMR": 1e-10}
    for name, a, b in zip(("A", "R", "PT", "PMR"),
                          outs["direct"], outs["matmul"]):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-300
        assert np.abs(a - b).max() / scale < tol[name], name


def test_engine_consts_carry_asm_fields():
    cfg = SolverConfig(asm_leg="matmul")
    ec = fastpt.engine_consts(cfg, "fft")
    assert ec.asm_C is not None and ec.asm_kw is not None
    cfg_d = SolverConfig(asm_leg="direct")
    assert fastpt.engine_consts(cfg_d, "fft").asm_C is None
