#!/usr/bin/env python
"""Feasibility probe: deep-Ozaki PZ Toeplitz contraction.

The PZ leg conv[n,a,i] = sum_m T[n,i,m] P[a,m] cancels ~1e8 of its
operand-product scale, so the standard operand-scale slicing (53-bit
coverage) lands ~1e-5 of the result.  The fix tested here: cover
53 + log2(cancellation) ~ 80+ bits with more int8 slices on BOTH
operands (exact int32 accumulation absorbs the cancellation inside each
diagonal dot), with the out-leg's two-sided balancing (per-row
power-of-two scale folded into the activation).

Run on CPU f64 (ground truth is the f64 einsum).
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from redtime_tpu import fastpt, model  # noqa: E402
from redtime_tpu.config import SolverConfig, RunSettings  # noqa: E402
from redtime_tpu.grids import make_grids  # noqa: E402
from __graft_entry__ import _cosmo, _example_inputs  # noqa: E402


def pack_matrix(M, q, sb):
    """Slice M [K, O] on a per-column power-of-two grid into sb int8
    slices after per-row balancing.  Returns (slices list, col scale e
    [1, O], row scale rh [K, 1])."""
    rmx = np.abs(M).max(axis=1, keepdims=True)
    rh = 2.0 ** np.round(np.log2(np.where(rmx > 0, rmx, 1.0)))
    Mb = M / rh
    mx = np.abs(Mb).max(axis=0, keepdims=True)
    e = 2.0 ** (np.floor(np.log2(np.maximum(mx, 1e-300))) + 2)
    r = Mb / e
    sl = []
    for j in range(sb):
        t = np.round(r * 2.0 ** (q * (j + 1)))
        assert np.abs(t).max() < 128, (j, np.abs(t).max())
        sl.append(t.astype(np.int8))
        r = r - t / 2.0 ** (q * (j + 1))
    return sl, e, rh


def split_activation(x, q, sa):
    """x [R, K] f64 -> sa f32-integer slices + per-row scale (numpy twin
    of fastpt._oz_split_rows)."""
    ah = x.astype(np.float32).astype(np.float64)
    al = x - ah
    mx = np.abs(ah).max(axis=-1, keepdims=True)
    ex = np.floor(np.log2(np.maximum(mx, 1e-300))) + 2
    sc = 2.0 ** ex
    r = ah / sc
    yl = al / sc
    sls = []
    for i in range(sa):
        f = 2.0 ** (q * (i + 1))
        t = np.round(r * f)
        assert np.abs(t).max() < 128
        sls.append(t.astype(np.int8))
        r = r - t / f
        if i == 2:
            r = r + yl
    return sls, sc


def main():
    cfg = SolverConfig()
    g = make_grids(cfg)
    co = fastpt.fastpt_coeffs(cfg)
    npts, nk = g.npts, g.nk

    # a realistic activation: the windowed extended spectrum from the
    # example cosmology at z_in
    lin = _example_inputs(cfg)
    cos = _cosmo(0)
    prep = model.prepare_model(cfg, cos, lin)
    _, Pcb, _ = model.plin_all(cfg, prep, 200.0)
    lnP3 = np.log(np.stack([np.asarray(Pcb)] * 3))
    P_ext = np.asarray(fastpt.extend_power(cfg, jnp.asarray(lnP3),
                                           cos.n_s))           # [3, np]

    T_sl = np.asarray(co.toeplitz[:, g.nshift:g.nshift + nk, :])  # [7,nk,np]
    truth = np.einsum("nim,am->nai", T_sl, P_ext)

    # flatten contraction: M [np, 7*nk]
    M = T_sl.transpose(2, 0, 1).reshape(npts, 7 * nk)
    q = 7
    for (sa, sb, cut) in [(8, 8, 7), (12, 12, 10), (12, 12, 12),
                          (14, 14, 14), (16, 16, 16)]:
        sl, e, rh = pack_matrix(M, q, sb)
        A = P_ext * rh.T                     # fold row scale into activation
        asl, asc = split_activation(A, q, sa)
        # exact int32 check: products < 2^(2q)=2^14, K=512 sums < 2^23 OK
        acc = np.zeros((3, 7 * nk))
        for i in range(sa):
            for j in range(sb):
                d = i + j
                if d > cut:
                    continue
                o = asl[i].astype(np.int64) @ sl[j].astype(np.int64)
                assert np.abs(o).max() < 2 ** 31, "int32 overflow"
                acc += o * 2.0 ** (-q * (d + 2))
        approx = (acc * asc * e).reshape(3, 7, nk).transpose(1, 0, 2)
        err = np.abs(approx - truth)
        scale = np.abs(truth).max()
        # also the PZ-relative metric the notes quote: error vs PZ max
        print(f"sa={sa} sb={sb} cut={cut}: max rel-to-max "
              f"{err.max() / scale:.3e}, max rel-to-elem "
              f"{(err / np.maximum(np.abs(truth), scale * 1e-12)).max():.3e}")
    # cancellation magnitude for the record
    prods = np.abs(P_ext)[:, :, None] * np.abs(M)[None]
    canc = prods.sum(1).max() / np.abs(truth).max()
    print(f"operand-product / result scale: {canc:.3e}")


if __name__ == "__main__":
    main()
