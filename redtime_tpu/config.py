"""Typed configuration for the solver.

The reference scatters configuration over three tiers: the positional
`params_redTime.dat` file (reference `AU_cosmological_parameters.h:231-353`),
compile-time constants/ifdefs (`src/redTime.cc:64-157`), and shell-level CLI
derivations (`scripts/runRedTime:98-119`).  Here everything is a typed,
hashable config:

  * `SolverConfig` — static (trace-time) numerical configuration: grid sizes,
    windows, tolerances, print switches.  Hashable so it can be a jit static
    argument.
  * `CosmoParams`  — the 9 cosmological parameters, a pytree of scalars so a
    batch of cosmologies is just a stacked pytree (vmap/pjit axis).
  * `RunSettings`  — per-run evolution settings (mode switches, z_in, output
    redshifts).  Mode switches are static; redshifts are arrays.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Sequence

import jax.numpy as jnp

# Physical constants (reference AU_cosmological_parameters.h:64-66)
C_RHO_GAM = 4.46911743913795e-07  # Omega_gamma * h^2 / T_cmb[K]^4
C_NU_HOT = 0.681321952980717      # 3*(7/8)*(4/11)^(4/3)
H0H = 0.00033356754857714242474   # H0 / (h/Mpc)   (reference redTime.cc:69)


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Static numerical configuration (trace-time constants).

    Defaults reproduce the reference's default (non-HIGH_ACCURACY) build:
    reference `src/redTime.cc:90-145`.
    """

    # --- k grid (reference redTime.cc:90-110) ---
    nk: int = 128
    np_factor: int = 4           # extended FFT grid: np = np_factor * nk
    kmin: float = 1e-3           # h/Mpc
    kmax: float = 1.0            # h/Mpc

    # window taper zones, in units of nk/16 (reference redTime.cc:102-103;
    # note the reference compiles the "np=8*nk" values even for np=4*nk,
    # which pushes the right taper off-grid — reproduced faithfully)
    s_padL: int = 23
    s_tapL: int = 9
    s_extL: int = 24
    s_extR: int = 24
    s_tapR: int = 9

    # --- FAST-PT (reference redTime.cc:71-72, 599-600) ---
    nu_bias: float = -2.0        # FFT-log bias exponent nu
    z_taylor_eps: float = 1e-2   # Z-kernel Taylor switch at r<eps or r>1/eps
    z_taylor_terms: int = 10

    # --- eta (time) integration tolerances (reference redTime.cc:140-145) ---
    eabs_P: float = 1e-7
    erel_P: float = 1e-2
    eta_tableau: str = "rkf45"   # embedded RK pair for the eta evolution:
    # 'rkf45' (the reference's gsl rkf45, redTime.cc:1593 — default for
    # step-for-step trajectory parity), 'dopri5', or 'dop853' (8th
    # order: at the HIGH_ACCURACY tolerances RKF45's 5th order needs
    # ~260 accepted steps over the eta range while DOP853 converges in
    # far fewer — an accuracy-preset option; at nk=512 it measured
    # SLOWER end-to-end, see docs/TPU_NOTES.md "Measured dead ends".
    # All three land on the same converged trajectory at tight erel:
    # tests/test_configs.py::test_eta_tableau_converges_to_rkf45
    # pins full-TRG table agreement at erel=1e-8 (spectra < 5e-7
    # relative, RSD columns < 2e-6 of column scale)

    # --- 1-loop mode evaluation redshift (reference redTime.cc:1285) ---
    z1l: float = 10.0

    # --- growth tables (reference AU_cosmological_parameters.h:644-697) ---
    growth_n_lna: int = 100
    growth_n_lnk: int = 50
    growth_a_min: float = 1e-3
    growth_a_max: float = 1.1
    growth_k_min: float = 1.5e-4
    growth_k_max: float = 9.0
    a_early: float = 1e-20
    growth_rtol: float = 1e-6    # reference uses rk8pd rel 1e-6 (:173);
    # measured: both integrators are globally ~1e-9 accurate here
    growth_h_reset: bool = False  # True: reset h0=1e-6*a per table segment
    # exactly like the reference's per-call gsl evolve (:179); False (default)
    # carries the adaptive step across segments (~4x fewer steps, same
    # trajectory to ~1e-9 at growth_rtol=1e-9)
    growth_dense: bool = False   # free-stepping integration over the table
    # range with 4th-order dense output at the lna nodes instead of one
    # node-stopped interval per segment.  Measured (probe_growth_dense.py):
    # SLOWER at matching accuracy on this host — the node stops are not the
    # dominant cost (the a_early ramp is), free stepping runs at-tolerance
    # (so rtol must tighten ~10x to match the stop-converged trajectory),
    # and the per-attempt dense fill adds work.  Kept as an option for
    # denser lna tables; ignored when growth_h_reset is set.
    growth_ramp_tableau: str = "dop853"  # integrator for the a_early ->
    # growth_a_min ramp (39 e-folds, node-free — it dominates growth
    # attempts): 'dop853' (8th order, the closer analog of the reference's
    # GSL rk8pd, AU_cosmological_parameters.h:172; measured ~3x fewer
    # controller attempts at equal rtol and a ~1e-9-level trajectory
    # match) or 'dopri5' (round-2 behavior).  The node-stopped table
    # region stays DOPRI5 (its step count is node-bounded; order buys
    # nothing there — TODO.md closed lines).

    # --- beta_P clamping (reference AU_cosmological_parameters.h:536-537) ---
    beta_k_min: float = 1e-3
    beta_k_max: float = 1.0

    # --- sigma_8 / sigma_v^2 quadrature over lnk in [-15, 15]
    #     (reference AU_cosmological_parameters.h:849-874) ---
    quad_lnk_lo: float = -15.0
    quad_lnk_hi: float = 15.0
    quad_panels: int = 256       # Gauss-Legendre panels
    quad_order: int = 16         # points per panel
    quad_impl: str = "qag"       # 'qag' (default): replicate
    # gsl_integration_qag(key=6) — adaptive GK61 bisection with QUADPACK's
    # error estimate and GSL's slot-order summation (quadrature.qag_gk61),
    # reproducing the reference's normalization discretization exactly
    # (cost-neutral: ~1.3% of prepare).  'gl': fixed GL panels (differ
    # ~6e-7; error far below the reference's requested 1e-4)
    qag_limit: int = 1000        # max subintervals (= reference ws_size;
    # the sigma_8 / sigma_v^2 integrands converge in < 30, but a matching
    # workspace keeps pathological inputs converging wherever GSL would)

    # --- output print switches (reference redTime.cc:64-65) ---
    print_a: bool = False        # PRINTA
    print_i: bool = False        # PRINTI
    print_q: bool = False        # PRINTQ
    print_bias: bool = False     # PRINTBIAS
    fill_pt_full_trg: bool = False  # reference wart fix (opt-in): in
    # full-TRG mode the output-time mode-coupling recomputation is gated
    # on SWITCH_1LOOP (redTime.cc:1646), so the TNS B-term and
    # McDonald-Roy columns print ZERO in the production configuration —
    # SURVEY section 2 documents the caveat and invites fixing it behind
    # a flag.  True computes PT/PMR (and the PRINTA block) at each
    # output time from the EVOLVED spectra, populating columns 14-17
    # that emulator users otherwise lose; False (default) reproduces the
    # reference bit-for-bit.

    # --- backend ---
    fft_mode: str = "auto"       # 'auto' | 'fft' | 'matmul'
    conv_impl: str = "fft"       # spectral-convolution implementation in
    # matmul mode: 'fft' (three length-2np DFT matmuls — fastest on the
    # current TPU runtime, where XLA's f64 gather AND grouped-conv paths
    # are pathologically slow), 'gather' or 'conv' (direct O(half^2)
    # contraction, ~50x fewer MACs; numerically identical to 1e-13 — the
    # right choice on runtimes with healthy gather/conv lowering).
    out_leg: str = "auto"        # windowed output-leg implementation:
    # 'dot' (two flat emulated-f64 matmuls), 'ozaki' (per-family composite
    # matrix G_f = F diag(fh_f) B_out with prek folded in, contracted as
    # Ozaki-split integer bf16 slices on the MXU with exact f32
    # accumulation — ~3x faster than the f64 dots on the current runtime
    # at ~4e-12 relative accuracy), or 'auto' (ozaki on TPU, dot
    # elsewhere).  Ozaki requires engine_transform_dtype == 'float64'.
    tab_leg: str = "auto"        # convolution backward-leg implementation:
    # 'dot' (one flat emulated-f64 matmul) or 'ozaki' (diagonal-grouped
    # int8 slice dots with exact int32 accumulation on the MXU, ~2x
    # faster at ~3e-13 relative accuracy); 'auto' = ozaki on TPU.
    fwd_leg: str = "auto"        # forward-stage implementation: 'dot'
    # (emulated-f64 dots for the Pab extension and the windowed forward
    # transform) or 'ozaki' (generic diagonal-grouped int8 packs — the
    # dropped slice pairs weigh ~2^-77 of operand scale, below the f64
    # dots' own rounding).  'auto' = ozaki on TPU.
    asm_leg: str = "auto"        # A/R/PT/PMR assembly implementation:
    # 'direct' (the transcribed per-slot elementwise combos — the
    # verified contract) or 'matmul' (two static dots over the 190
    # transform features with k-power row weights; derived numerically
    # FROM the direct form by basis probing, equivalent to ~8e-15
    # relative — assembly.asm_consts).  Measured on the TPU runtime the
    # matmul form is ~15% SLOWER per solve (XLA fuses the direct form's
    # elementwise chains into a handful of kernels, while the dots pay
    # irreducible element traffic), so 'auto' = direct everywhere; the
    # matmul form is kept as a verified alternative for runtimes where
    # elementwise fusion is weaker.
    pz_leg: str = "auto"         # PZ Toeplitz-contraction implementation:
    # 'dot' (emulated-f64 einsum) or 'ozaki' (diagonal-grouped int8 slice
    # dots on the MXU).  The contraction cancels ~1e8 of operand scale
    # PER ELEMENT, which defeats a column-only slice grid — but with
    # TWO-SIDED balancing (a per-row power-of-two scale on the
    # contraction dim folded into the activation, exact f64 multiplies)
    # the int8 scheme reproduces the f64 einsum to ~1e-16 of the result
    # maximum (scripts/probe_pz_ozaki.py).  'auto' = ozaki on TPU.
    oz_bits: int = 0             # Ozaki pack coverage in mantissa bits:
    # 0 = full f64 coverage (the round-2/3 behavior, ~1e-11..1e-16 of
    # scale per leg).  > 0 truncates each leg's diagonal pack to
    # ~oz_bits of the BALANCED matrix mantissa (plus a per-leg guard
    # for its measured cancellation: out +13 bits for the RSD-family
    # J cancellation, pz +27 for the Toeplitz contraction's ~1e8
    # element cancellation), shrinking pack bytes — the engine's HBM
    # streaming cost — roughly linearly.  At large grids the packs ARE
    # the per-eval cost (nk=512: 2.6 GB full vs ~1.5 GB at 42 bits),
    # so tight-tolerance presets trade ~1e-12 -> ~1e-9-grade engine
    # noise (still 100x below erel_P=1e-6) for memory.  Accuracy/bytes
    # contract pinned by tests/test_fastpt_windowed.py::
    # test_oz_bits_truncation_band; measured on TPU at nk=512/bits=36:
    # ozaki-vs-dot 1.3e-8, but ~2.8x MORE controller attempts at
    # erel=1e-6 (the truncation jitter lands in the embedded error
    # estimate), so it is NOT a speed knob — docs/TPU_NOTES.md
    # "Measured dead ends".
    oz_budget_bytes: int = 0     # HBM budget for the Ozaki int8 diagonal
    # packs; 0 = auto (fastpt.OZ_AUTO_BUDGET, 6 GB — admits the full
    # nk=512 pack set, ~2.6 GB).  'auto' legs are enabled greedily in
    # measured-benefit order (out > tab > pz > fwd) while they fit; legs
    # explicitly set to 'ozaki' are always built.  When an 'auto' leg is
    # dropped on the TPU, a one-time stderr note announces the fallback
    # (fastpt.resolved_legs shows the live resolution).
    conv_radix: int = 4          # radix of the split-DIT forward DFT on
    # the windowed output leg (matmul mode): the length-2np rfft of the
    # convolution product is computed as `conv_radix` interleaved
    # subsequence rffts of length 2np/radix plus elementwise twiddle
    # combines — exact f64 with 1/radix the matmul MACs (the emulated-f64
    # dot is the full-TRG hot spot).  1 disables the split.
    engine_transform_dtype: str = "float64"  # 'float64' | 'float32':
    # dtype of the FAST-PT DFT/Toeplitz matmuls.  'float32' runs the
    # engine's big matmuls in true-f32 (6-pass bf16 on the MXU) under f64
    # state/stepping — ~the TPU throughput knob for full-TRG mode, where
    # the engine dominates the RHS.  Outputs are cast back to the state
    # dtype before assembly.
    dtype: str = "float64"       # solver dtype: 'float64' (reference
    # parity) or 'float32' (TPU throughput mode: native MXU speed instead
    # of emulated f64; accuracy ~1e-3, the reference CI's own bar).
    # Per-cosmology setup (growth/beta/norm tables) always runs in f64.

    @classmethod
    def high_accuracy(cls, **overrides) -> "SolverConfig":
        """The reference's HIGH_ACCURACY ifdef build (redTime.cc:90-94,
        141-142): nk=512, tight eta tolerances."""
        kw = dict(nk=512, eabs_P=1e-15, erel_P=1e-6)
        kw.update(overrides)
        return cls(**kw)

    @classmethod
    def v01_compat(cls, **overrides) -> "SolverConfig":
        """redTime v0.1-compatible settings (reference README.md:123-155):
        nk=256, np=8nk, wide beta_P k-range, dense growth k-table,
        a_early=1e-50, tight tolerances.  z1l stays configurable (v0.1
        evaluated the 1-loop terms at z_in)."""
        kw = dict(nk=256, np_factor=8, eabs_P=1e-15, erel_P=1e-6,
                  beta_k_min=1e-5, beta_k_max=20.0,
                  growth_n_lnk=1000, a_early=1e-50,
                  growth_h_reset=True)
        kw.update(overrides)
        return cls(**kw)

    @property
    def jdtype(self):
        import jax.numpy as jnp
        return jnp.float64 if self.dtype == "float64" else jnp.float32

    @property
    def npts(self) -> int:
        return self.np_factor * self.nk

    @property
    def nshift(self) -> int:
        return (self.npts - self.nk) // 2


class CosmoParams(NamedTuple):
    """The 9 cosmological input parameters (reference params_redTime.dat
    schema, `AU_cosmological_parameters.h:325-333`).  A pytree of scalars."""

    n_s: jnp.ndarray
    sigma_8: jnp.ndarray
    h: jnp.ndarray
    Omega_m: jnp.ndarray
    Omega_b: jnp.ndarray
    Omega_nu: jnp.ndarray
    T_cmb: jnp.ndarray
    w0: jnp.ndarray
    wa: jnp.ndarray

    @classmethod
    def make(cls, n_s, sigma_8, h, Omega_m, Omega_b, Omega_nu,
             T_cmb=2.726, w0=-1.0, wa=0.0) -> "CosmoParams":
        return cls(*[jnp.asarray(v, dtype=jnp.float64)
                     for v in (n_s, sigma_8, h, Omega_m, Omega_b, Omega_nu,
                               T_cmb, w0, wa)])


@dataclasses.dataclass(frozen=True)
class RunSettings:
    """Per-run evolution settings.

    Mode switches mirror the four integer switches of params_redTime.dat
    (reference `AU_cosmological_parameters.h:336-339`); z values mirror the
    z_initial / output-redshift entries.
    """

    nonlinear: bool = True       # SWITCH_NONLINEAR
    one_loop: bool = True        # SWITCH_1LOOP
    print_lin: bool = True       # PRINTLIN
    print_rsd: bool = True       # PRINTRSD
    z_in: float = 200.0
    z_out: Sequence[float] = (5.0, 4.0, 3.0, 2.0, 1.0, 0.5, 0.0)

    @property
    def a_in(self) -> float:
        return 1.0 / (1.0 + self.z_in)

    def etasteps(self):
        """eta = ln(a/a_in) of each output redshift."""
        import numpy as np
        a = 1.0 / (1.0 + np.asarray(self.z_out, dtype=np.float64))
        return np.log(a / self.a_in)
