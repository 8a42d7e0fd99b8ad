"""Table interpolation with the reference's exact rules.

Reproduces the semantics of the reference's `tabulated_function`
(`src/AU_tabfun.h:250-328`) and the `AU_interp.h` primitives:

  * bracketing: n = first index with nodes[n+1] >= x, capped to [0, size-2]
    (linear scan in the reference; searchsorted here);
  * interior (0 < n < size-2): 4-point Lagrange cubic on nodes [n-1 .. n+2];
  * edges (n == 0 or n == size-2): linear on nodes [n, n+1], which linearly
    extrapolates beyond either end;
  * 2D tables interpolate each axis with the same rule; the composite is a
    separable bilinear form in the node values, so axis order is immaterial.

Two flavors:
  * jnp functions for dynamic (traced) evaluation points;
  * numpy weight-matrix builders for static evaluation points (fixed k-grids,
    quadrature nodes), which turn interpolation into a static matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _lagrange4(xs, x):
    """Weights of 4-point Lagrange interpolation at x given nodes xs[4]."""
    w = []
    for j in range(4):
        num = 1.0
        for l in range(4):
            if l != j:
                num = num * (x - xs[l]) / (xs[j] - xs[l])
        w.append(num)
    return jnp.stack(w)


def axis_weights(nodes: jnp.ndarray, x):
    """Bracketing + branch weights for one axis (jnp, dynamic x: scalar).

    Returns (i0, w[4]) such that f(x) = sum_j w[j] * f_nodes[i0 + j].
    Requires len(nodes) >= 4.
    """
    nodes = jnp.asarray(nodes)
    nn = nodes.shape[0]
    n = jnp.clip(jnp.searchsorted(nodes, x, side="left") - 1, 0, nn - 2)
    cubic = (n > 0) & (n < nn - 2)
    i0 = jnp.clip(n - 1, 0, nn - 4)
    xs = jax.lax.dynamic_slice(nodes, (i0,), (4,))

    # cubic Lagrange weights on xs
    wc = _lagrange4(xs, x)

    # linear on [n, n+1] placed at offset (n - i0) within the 4-window
    t = (x - nodes[n]) / (nodes[n + 1] - nodes[n])
    off = n - i0
    eye = jnp.eye(4, dtype=nodes.dtype)
    wl = (1.0 - t) * eye[off] + t * eye[off + 1]

    return i0, jnp.where(cubic, wc, wl)


def axis_weights_full(nodes: jnp.ndarray, x):
    """axis_weights spread over the FULL node axis: w_full [len(nodes)]
    with w_full[i0:i0+4] = w and zeros elsewhere.

    Turns a traced-point table lookup into `w_full @ values` — a tiny
    matmul instead of a dynamic_slice/gather.  XLA:TPU lowers f64
    gathers (what a vmapped dynamic_slice becomes) pathologically
    (docs/TPU_NOTES.md); the one-hot contraction is element-traffic
    bound and ~30x cheaper in the RHS hot loop.  Exact: the extra terms
    are +0.0 against finite table values."""
    nodes = jnp.asarray(nodes)
    i0, w = axis_weights(nodes, x)
    idx = i0 + jnp.arange(4)
    oh = (jnp.arange(nodes.shape[0])[None, :]
          == idx[:, None]).astype(nodes.dtype)          # [4, nn]
    return w @ oh


def interp1(nodes: jnp.ndarray, values: jnp.ndarray, x):
    """tabulated_function::f(x) for scalar traced x."""
    i0, w = axis_weights(nodes, x)
    f4 = jax.lax.dynamic_slice(jnp.asarray(values), (i0,), (4,))
    return jnp.dot(w, f4)


def interp1_vec(nodes, values, xs):
    """Vectorized interp1 over a 1-D array of query points."""
    return jax.vmap(lambda x: interp1(nodes, values, x))(xs)


def interp2(x_nodes, y_nodes, table, x, y):
    """tabulated_function::f(x, y) for scalar traced (x, y).

    `table` has shape [len(x_nodes), len(y_nodes)] (C layout of the
    reference's fTable, AU_tabfun.h:435).
    """
    ix, wx = axis_weights(x_nodes, x)
    iy, wy = axis_weights(y_nodes, y)
    block = jax.lax.dynamic_slice(jnp.asarray(table), (ix, iy), (4, 4))
    return wx @ block @ wy


def axis_weights_np(nodes: np.ndarray, x: float):
    """numpy twin of axis_weights for static points: (i0, w[4])."""
    nodes = np.asarray(nodes)
    nn = nodes.shape[0]
    n = int(np.clip(np.searchsorted(nodes, x, side="left") - 1, 0, nn - 2))
    i0 = int(np.clip(n - 1, 0, nn - 4))
    w = np.zeros(4)
    if 0 < n < nn - 2:
        xs = nodes[i0:i0 + 4]
        for j in range(4):
            num = 1.0
            for l in range(4):
                if l != j:
                    num *= (x - xs[l]) / (xs[j] - xs[l])
            w[j] = num
    else:
        t = (x - nodes[n]) / (nodes[n + 1] - nodes[n])
        w[n - i0] = 1.0 - t
        w[n - i0 + 1] = t
    return i0, w


def weight_matrix_np(nodes: np.ndarray, xs: np.ndarray) -> np.ndarray:
    """Dense weight matrix W [len(xs), len(nodes)]: f(xs) = W @ f_nodes.

    For static evaluation points; turns table interpolation into a matmul.
    """
    nodes = np.asarray(nodes)
    W = np.zeros((len(xs), len(nodes)))
    for r, x in enumerate(np.asarray(xs)):
        i0, w = axis_weights_np(nodes, x)
        W[r, i0:i0 + 4] = w
    return W
