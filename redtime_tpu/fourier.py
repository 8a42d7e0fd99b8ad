"""Real-FFT primitives with a split re/im representation.

XLA:TPU supports neither f64 FFT nor the C128 element type, so the FFT-log
engine cannot use complex arrays.  Everything is expressed through two
primitives on split (re, im) half-spectra of real sequences:

  * rfft(x)               : real [..., n] -> (re, im) [..., n//2+1]
  * hc_backward(re, im, n): Hermitian half-spectrum -> real [..., n],
                            UNNORMALIZED backward transform (the analog of
                            gsl_fft_halfcomplex_radix2_backward used by the
                            reference, redTime.cc:368-370)

Backends:
  * 'fft'    — jnp.fft.rfft/irfft (CPU; exact c128 path)
  * 'matmul' — static DFT matrices contracted on the MXU (TPU; f64 matmul is
               supported on TPU via emulation, FFT is not).  Sizes here are
               tiny (512/1024/2048), so the O(n^2) matmul is effectively free
               and batches beautifully over the 126-transform axis.
  * 'auto'   — matmul on TPU, fft elsewhere (resolved at trace time).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def _dft_matrices(n: int):
    """Static DFT matrices for length n (numpy f64, constants under jit)."""
    j = np.arange(n)
    m = np.arange(n // 2 + 1)
    ang = 2.0 * np.pi * np.outer(j, m) / n          # [n, n//2+1]
    fc = np.cos(ang)                                # rfft: re = x @ fc
    fs = np.sin(ang)                                #        im = -x @ fs
    # backward (unnormalized): t_j = sum_h S_h e^{+2 pi i j h / n} with
    # Hermitian S -> t = re @ bc + im @ bs
    c = np.full(n // 2 + 1, 2.0)
    c[0] = 1.0
    if n % 2 == 0:
        c[-1] = 1.0
    bc = (c[:, None] * np.cos(ang.T))               # [n//2+1, n]
    bs = (-c[:, None] * np.sin(ang.T))
    return fc, fs, bc, bs


def _resolve(mode: str) -> str:
    if mode == "auto":
        return "matmul" if jax.default_backend() == "tpu" else "fft"
    return mode


from typing import NamedTuple, Optional  # noqa: E402


class DFTConsts(NamedTuple):
    """DFT matrices for one transform length, as a pytree so callers can
    pass them as jit *arguments* — baking ~MB-scale f64 constants into the
    HLO multiplies TPU remote-compile time by ~7x."""

    fc: jnp.ndarray
    fs: jnp.ndarray
    bc: jnp.ndarray
    bs: jnp.ndarray


def dft_consts(n: int, dtype=None) -> DFTConsts:
    return DFTConsts(*[jnp.asarray(m, dtype=dtype)
                       for m in _dft_matrices(n)])


def rfft(x: jnp.ndarray, mode: str = "auto",
         dft: Optional[DFTConsts] = None):
    """Forward real FFT: [..., n] -> ((re, im), each [..., n//2+1]).

    Sign convention e^{-2 pi i j m / n}, matching both numpy and GSL's
    forward transforms.  im[..., 0] and im[..., n/2] are exactly zero
    (halfcomplex structure of the reference)."""
    n = x.shape[-1]
    if _resolve(mode) == "fft":
        z = jnp.fft.rfft(x)
        re, im = jnp.real(z), jnp.imag(z)
    else:
        if dft is None:
            fc, fs, _, _ = _dft_matrices(n)
            fc, fs = jnp.asarray(fc), jnp.asarray(fs)
        else:
            fc, fs = dft.fc, dft.fs
        re = x @ fc
        im = -(x @ fs)
    # enforce the halfcomplex structure exactly (no imag slots at DC/Nyquist)
    im = im.at[..., 0].set(0.0)
    if n % 2 == 0:
        im = im.at[..., -1].set(0.0)
    return re, im


def hc_backward(re: jnp.ndarray, im: jnp.ndarray, n: int,
                mode: str = "auto",
                dft: Optional[DFTConsts] = None) -> jnp.ndarray:
    """Unnormalized backward transform of a Hermitian half-spectrum:
    t_j = sum_{h=0}^{n-1} S_h e^{+2 pi i j h / n}, S Hermitian-extended.
    Returns the real sequence [..., n]."""
    if _resolve(mode) == "fft":
        z = re + 1j * im
        return jnp.fft.irfft(z, n) * n
    if dft is None:
        _, _, bc, bs = _dft_matrices(n)
        bc, bs = jnp.asarray(bc), jnp.asarray(bs)
    else:
        bc, bs = dft.bc, dft.bs
    return re @ bc + im @ bs


def spectral_convolve(re_a, im_a, re_b, im_b, n: int, mode: str = "auto",
                      dft: Optional[DFTConsts] = None):
    """Linear convolution of two Hermitian spectra: C_h = sum_m A_m B_{h-m}.

    A, B given as half-spectra of length n//2+1 (supports must be < n/2 so
    the circular convolution is alias-free; the caller zero-pads).  This is
    the reference's `iconvolve`/`cconvolve` step (redTime.cc:373-394):
    C = fft(ifft(A) * ifft(B)) * n.  Returns (re_c, im_c) [..., n//2+1].
    """
    ta = hc_backward(re_a, im_a, n, mode, dft)
    tb = hc_backward(re_b, im_b, n, mode, dft)
    prod = ta * tb / n          # ta*tb = n^2 * ifft(A)*ifft(B)
    return rfft(prod, mode, dft)
