"""FAST-PT engine property tests.

The end-to-end golden test anchors absolute correctness; these tests pin
internal invariants: backend equivalence (the TPU DFT-matmul path vs
jnp.fft), the spectral convolution against a brute-force O(n^2) evaluation,
Toeplitz PZ against the reference's literal brute-force circular
convolution, and engine symmetries.
"""

import numpy as np
import jax.numpy as jnp

from redtime_tpu import fastpt, fourier
from redtime_tpu.config import SolverConfig
from redtime_tpu.grids import make_grids

CFG = SolverConfig(nk=64)


def _toy_lnP():
    g = make_grids(CFG)
    return jnp.asarray(np.log(
        1e4 * np.exp(-0.5 * ((g.lnk + 3.0) / 1.5) ** 2) + 1e-3))


def test_backend_equivalence():
    """mode='matmul' (the TPU path) must reproduce mode='fft' to f64
    roundoff."""
    lnP3 = jnp.stack([_toy_lnP()] * 3)
    P_ext = fastpt.extend_power(CFG, lnP3, 0.96)
    J1, PZ1 = fastpt.compute_J_PZ(CFG, P_ext, True, "fft")
    J2, PZ2 = fastpt.compute_J_PZ(CFG, P_ext, True, "matmul")
    scale = np.max(np.abs(np.asarray(J1)), axis=-1, keepdims=True) + 1e-300
    assert np.max(np.abs(np.asarray(J1 - J2)) / scale) < 1e-11
    assert np.allclose(np.asarray(PZ1), np.asarray(PZ2), rtol=1e-12,
                       atol=1e-30)


def test_rfft_matches_numpy():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(5, 128))
    re, im = fourier.rfft(jnp.asarray(x), "matmul")
    z = np.fft.rfft(x)
    assert np.allclose(np.asarray(re), z.real, atol=1e-12)
    assert np.allclose(np.asarray(im), z.imag, atol=1e-12)
    # halfcomplex structure: exact zeros at DC/Nyquist imag
    assert np.all(np.asarray(im)[:, 0] == 0)
    assert np.all(np.asarray(im)[:, -1] == 0)


def test_hc_backward_matches_definition():
    rng = np.random.default_rng(4)
    n = 64
    re = rng.normal(size=n // 2 + 1)
    im = rng.normal(size=n // 2 + 1)
    im[0] = im[-1] = 0.0
    t = np.asarray(fourier.hc_backward(jnp.asarray(re), jnp.asarray(im), n,
                                       "matmul"))
    # direct definition: sum over Hermitian-extended spectrum
    S = np.zeros(n, dtype=complex)
    S[:n // 2 + 1] = re + 1j * im
    S[n // 2 + 1:] = np.conj((re + 1j * im)[1:n // 2][::-1])
    expect = np.real(np.fft.ifft(S) * n)
    assert np.allclose(t, expect, atol=1e-11)


def test_spectral_convolve_bruteforce():
    """C_h = sum_{m+n=h} A_m B_n over signed frequencies (supports
    |m| < n/4 so no aliasing)."""
    rng = np.random.default_rng(5)
    n = 64
    half = n // 2 + 1
    A = np.zeros(half, complex)
    B = np.zeros(half, complex)
    A[:n // 4] = rng.normal(size=n // 4) + 1j * rng.normal(size=n // 4)
    B[:n // 4] = rng.normal(size=n // 4) + 1j * rng.normal(size=n // 4)
    A[0] = A[0].real
    B[0] = B[0].real

    re, im = fourier.spectral_convolve(
        jnp.asarray(A.real), jnp.asarray(A.imag),
        jnp.asarray(B.real), jnp.asarray(B.imag), n, "fft")

    def full(X):
        S = np.zeros(n, complex)
        S[:half] = X
        S[half:] = np.conj(X[1:n // 2][::-1])
        return S

    Af, Bf = full(A), full(B)
    C = np.zeros(n, complex)
    for h in range(n):
        for m in range(n):
            C[h] += Af[m] * Bf[(h - m) % n]
    assert np.allclose(np.asarray(re), C[:half].real, atol=1e-10)
    assert np.allclose(np.asarray(im), C[:half].imag, atol=1e-10)


def test_pz_matches_bruteforce_reference_convolution():
    """The Toeplitz contraction equals the reference's circular
    convolve_bruteforce restricted to the outputs read (redTime.cc:396-408,
    689-727)."""
    g = make_grids(CFG)
    co = fastpt.fastpt_coeffs(CFG)
    npts, dlnk = g.npts, g.dlnk
    rng = np.random.default_rng(6)
    Pq = np.exp(rng.normal(size=npts))

    # literal reference construction for one kernel family (n = +3)
    fam = 3  # Z_N[3] == 3
    Fs = np.zeros(4 * npts)
    Fs[:npts] = Pq
    Gs = np.zeros(4 * npts)
    for i in range(2 * npts):
        r = np.exp(-dlnk * (i - npts)) if i != npts else 1.0
        Gs[i] = fastpt._z_reg(3, r, CFG.z_taylor_eps,
                              CFG.z_taylor_terms) * r ** 3
    conv = np.zeros(4 * npts)
    for nn in range(npts, 2 * npts):   # only outputs [np, 2np) are read
        acc = 0.0
        for m in range(4 * npts):
            acc += Fs[m] * Gs[(nn - m) % (4 * npts)]
        conv[nn] = acc

    mine = co.toeplitz[fam] @ Pq
    assert np.allclose(mine, conv[npts:2 * npts], rtol=1e-12)


def test_j_symmetry_in_spectra():
    """J_{alpha,-alpha,ell}(P_a, P_b) with identical input spectra must be
    symmetric in (iab, icd) for alpha=0 families (a<->b symmetric kernel)."""
    lnP3 = jnp.stack([_toy_lnP()] * 3)
    P_ext = fastpt.extend_power(CFG, lnP3, 0.96)
    J, _ = fastpt.compute_J_PZ(CFG, P_ext, False, "fft")
    Jn = np.asarray(J)
    # identical spectra: all (iab, icd) combos equal within a family
    for fam in range(7):
        assert np.allclose(Jn[fam, 0, 0], Jn[fam, 1, 1], rtol=1e-12)
        assert np.allclose(Jn[fam, 0, 1], Jn[fam, 1, 0], rtol=1e-12)
