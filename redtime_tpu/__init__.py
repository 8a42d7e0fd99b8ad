"""redtime_tpu — a TPU-native Time-Renormalization-Group cosmology solver.

A from-scratch JAX/XLA framework with the capabilities of the redTime
reference code (Upadhye 2019, arXiv:1707.09354): Time-RG evolution of the
nonlinear P_dd/P_dt/P_tt power spectra for CDM+baryons with CPL dark energy
and massive neutrinos, the TNS A(k,mu)/B(k,mu) RSD corrections, and the
McDonald-Roy bias integrals.

Design: a functional core of pure, jittable array programs.  Per-cosmology
setup (growth tables, sigma_8 normalization, beta_P neutrino tables) returns
explicit pytrees; the solver is `vmap`-able over a cosmology batch axis and
shards that axis over a `jax.sharding.Mesh`.  The FFT-log mode-coupling
engine runs either through `jnp.fft` (CPU) or batched DFT matmuls (TPU MXU;
f64 FFT is not supported by XLA:TPU but f64 matmul is).

The solver requires float64 (the physics involves 1e-4-level golden-output
parity with an all-double reference), so importing this package enables
JAX x64 mode.
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)

from redtime_tpu.config import SolverConfig, CosmoParams, RunSettings  # noqa: E402,F401
from redtime_tpu.driver import (  # noqa: E402,F401
    prepare_model, run_batch, run_pipeline, settings_from_params, solve,
)

__version__ = "0.1.0"
