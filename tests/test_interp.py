"""Interpolation semantics tests: the tabulated_function rules."""

import numpy as np
import jax.numpy as jnp

from redtime_tpu import interp
from redtime_tpu.config import SolverConfig
from redtime_tpu.grids import make_grids, pab_extension_matrix


def _ref_tabfun_1d(xT, fT, x):
    """Literal re-statement of tabulated_function::f(x)
    (AU_tabfun.h:250-260) for testing."""
    n = 0
    size = len(xT)
    while xT[n + 1] < x and n < size - 2:
        n += 1
    if n <= 0:
        return _lin(xT[0:2], fT[0:2], x)
    if n >= size - 2:
        return _lin(xT[size - 2:], fT[size - 2:], x)
    return _cubic(xT[n - 1:n + 3], fT[n - 1:n + 3], x)


def _lin(xT, fT, x):
    return fT[0] + (fT[1] - fT[0]) / (xT[1] - xT[0]) * (x - xT[0])


def _cubic(xT, fT, x):
    F = 0.0
    for j in range(4):
        w = 1.0
        for l in range(4):
            if l != j:
                w *= (x - xT[l]) / (xT[j] - xT[l])
        F += w * fT[j]
    return F


def test_interp1_matches_reference_rules():
    rng = np.random.default_rng(0)
    xT = np.sort(rng.uniform(-3, 3, 17))
    fT = rng.normal(size=17)
    # interior points, node hits, edge intervals, both-side extrapolation
    queries = np.concatenate([
        rng.uniform(-3, 3, 50), xT, [-4.0, -3.5, 3.2, 5.0],
        0.5 * (xT[:-1] + xT[1:])])
    for x in queries:
        got = float(interp.interp1(jnp.asarray(xT), jnp.asarray(fT), x))
        want = _ref_tabfun_1d(xT, fT, x)
        assert np.isclose(got, want, rtol=1e-12, atol=1e-12), x


def test_weight_matrix_matches_interp1():
    rng = np.random.default_rng(1)
    xT = np.sort(rng.uniform(0, 1, 9))
    fT = rng.normal(size=9)
    xs = np.concatenate([rng.uniform(-0.2, 1.2, 40), xT])
    W = interp.weight_matrix_np(xT, xs)
    got = W @ fT
    want = [float(interp.interp1(jnp.asarray(xT), jnp.asarray(fT), x))
            for x in xs]
    assert np.allclose(got, want, rtol=1e-12)


def test_interp2_separable_and_exact_at_nodes():
    rng = np.random.default_rng(2)
    xT = np.sort(rng.uniform(0, 1, 7))
    yT = np.sort(rng.uniform(0, 1, 9))
    F = rng.normal(size=(7, 9))
    # exact at interior nodes
    for i in range(7):
        for j in range(9):
            got = float(interp.interp2(xT, yT, F, xT[i], yT[j]))
            assert np.isclose(got, F[i, j], rtol=1e-12, atol=1e-12)
    # separable: matches axis-by-axis reduction
    x, y = 0.3456, 0.6789
    iy, wy = interp.axis_weights_np(yT, y)
    col = F[:, iy:iy + 4] @ wy
    want = float(interp.interp1(jnp.asarray(xT), jnp.asarray(col), x))
    got = float(interp.interp2(xT, yT, F, x, y))
    assert np.isclose(got, want, rtol=1e-12)


def test_pab_extension_matrix():
    """The Pab extension reproduces cubic interior / linear edge /
    slope-(ns-3) right extrapolation on the padded grid."""
    cfg = SolverConfig()
    g = make_grids(cfg)
    M, v = pab_extension_matrix(g)
    ns = 0.96
    # a smooth fake ln P
    lnP = -1.3 * (g.lnk + 2.0) ** 2 / 10 + 0.2 * g.lnk
    ext = M @ lnP + (ns - 3.0) * v
    # real region reproduces lnP exactly
    sl = slice(g.nshift, g.nshift + g.nk)
    assert np.allclose(ext[sl], lnP, rtol=0, atol=1e-11)
    # right of the grid: slope ns-3
    right = ext[g.nshift + g.nk:]
    dl = np.diff(right) / g.dlnk
    assert np.allclose(dl, ns - 3.0, atol=1e-9)
    # left of grid: linear with the first-interval slope
    left = ext[:g.nshift]
    slope0 = (lnP[1] - lnP[0]) / g.dlnk
    dl_left = np.diff(left) / g.dlnk
    assert np.allclose(dl_left, slope0, atol=1e-9)


def test_windows():
    cfg = SolverConfig()
    g = make_grids(cfg)
    nk = cfg.nk
    # WP: zero through index nk*23//16, unity from index 2*nk through end
    # (right taper off-grid with the reference's compiled constants)
    assert np.all(g.wp[:nk * 23 // 16 + 1] == 0)
    assert np.all(g.wp[2 * nk:] == 1.0)
    assert np.all((g.wp >= 0) & (g.wp <= 1))
    assert np.all(np.diff(g.wp[:2 * nk]) >= 0)
    # WC: one through npts//8, zero at Nyquist
    assert np.all(g.wc[:g.npts // 8 + 1] == 1.0)
    assert g.wc[-1] == 0.0
    assert np.all(np.diff(g.wc) <= 1e-15)
