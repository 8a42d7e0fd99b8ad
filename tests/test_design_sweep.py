"""Robustness sweep over the Mira-Titan design ranges.

The round-2 batch-fault postmortem (docs/TPU_NOTES.md) showed failures
hide in PARAMETER RANGE, not batch size: the stiff early-dark-energy
corner (w0 + wa > 1/3) overflowed the growth-table scale.  This sweep
runs prepare_model over a Latin-hypercube of the full design box
(design.RANGES_*, `misc/convert_katrin_hypercube.py` ranges) plus the
box corners, asserting every derived table is finite and physical, and
solves the stiffest corner end-to-end in 1-loop mode.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _example_inputs

from redtime_tpu import design, driver, model as mdl
from redtime_tpu.config import CosmoParams, RunSettings, SolverConfig


def _cosmo_from_design_row(row):
    om_m, om_b, s8, h, ns, w0, wa, om_nu = (float(x) for x in row)
    return CosmoParams.make(
        n_s=ns, sigma_8=s8, h=h, Omega_m=om_m / h ** 2,
        Omega_b=om_b / h ** 2, Omega_nu=om_nu / h ** 2,
        T_cmb=2.726, w0=w0, wa=wa)


def _design_rows(n_lhs=12, seed=5):
    lhs = design.models_from_unit_cube(
        design.latin_hypercube(n_lhs, seed=seed))
    # all 2^3 corners of the most failure-prone axes (w0, wa-coord, om_nu)
    # with the other axes at their extremes alternating
    corners = []
    for bits in itertools.product((0.0, 1.0), repeat=3):
        u = np.full(8, 0.5)
        u[[5, 6, 7]] = bits
        u[[0, 3]] = bits[0], bits[2]
        corners.append(u)
    return np.concatenate(
        [lhs, design.models_from_unit_cube(np.stack(corners))])


def test_prepare_model_finite_across_design():
    cfg = SolverConfig(growth_n_lna=40, growth_n_lnk=16, quad_panels=64)
    lin = _example_inputs(cfg)
    rows = _design_rows()
    cs = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[_cosmo_from_design_row(r)
                                     for r in rows])
    lins = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *([lin] * len(rows)))
    ms = driver._jitted_prepare(cfg, True)(cs, lins)
    flat, _ = jax.tree_util.tree_flatten(ms)
    for leaf in flat:
        assert bool(jnp.isfinite(jnp.asarray(leaf)).all())
    # growth tables: D > 0 everywhere, normalized near z=0
    D0, _ = jax.vmap(lambda m: mdl.growth_D_f(m, 0.0))(ms)
    assert bool(jnp.all(D0 > 0.99)) and bool(jnp.all(D0 < 1.01))
    # linear power positive on the solver grid for every model
    _, Pcb, _ = jax.vmap(lambda m: mdl.plin_all(cfg, m, 0.0))(ms)
    assert bool(jnp.all(Pcb > 0.0))


def test_box_extreme_and_stiff_de_solve():
    """Two 1-loop solves: (a) the design box's thawing-most corner
    (w0 = -0.7, w0 + wa ~ -0.008 — inside the box w0 + wa = -c^4 is
    always NEGATIVE, so early-DE domination cannot occur there); (b) an
    OUT-OF-BOX stiff early-DE cosmology (w0 + wa = 0.5 > 1/3, the
    round-2 growth-table-overflow regression) — both finite."""
    cfg = SolverConfig(growth_n_lna=40, growth_n_lnk=16, quad_panels=64)
    lin = _example_inputs(cfg)
    settings = RunSettings(one_loop=True, z_out=(1.0, 0.0))

    u = np.full((1, 8), 0.5)
    u[0, 5], u[0, 6], u[0, 7] = 1.0, 0.0, 1.0   # w0 max, -(w0+wa)^1/4 min
    row = design.models_from_unit_cube(u)[0]
    assert -0.02 < row[5] + row[6] < 0.0        # box edge: barely thawing
    res = driver.run_pipeline(cfg, settings, _cosmo_from_design_row(row),
                              lin)
    assert bool(jnp.isfinite(res.table).all())

    stiff = CosmoParams.make(n_s=0.96, sigma_8=0.8, h=0.68, Omega_m=0.30,
                             Omega_b=0.048, Omega_nu=0.005, T_cmb=2.726,
                             w0=-0.5, wa=1.0)
    res = driver.run_pipeline(cfg, settings, stiff, lin)
    assert bool(jnp.isfinite(res.table).all())
