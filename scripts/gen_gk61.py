#!/usr/bin/env python
"""Generate the 61-point Gauss-Kronrod rule (QUADPACK dqk61 / GSL key=6)
from first principles at high precision.

The reference normalizes P_lin and sigma_v^2 with gsl_integration_qag
(key=6 = GK61, AU_cosmological_parameters.h:849-874).  GSL's node/weight
tables are transcriptions of QUADPACK's; rather than copying those
constants, this script DERIVES the rule with mpmath (50 digits):

  * the 30 Gauss-Legendre nodes/weights from mpmath's polyroots of P_30;
  * the 31 Kronrod nodes as roots of the Stieltjes polynomial E_31,
    determined by the orthogonality conditions
        integral_{-1}^{1} P_30(x) E_31(x) x^k dx = 0,  k = 0..30
    solved in the Legendre basis (E_31 = P_31 + sum_j e_j P_j; only
    parity-matching j contribute);
  * all 61 weights from exactness on the Legendre basis P_0..P_60
    (a 61x61 linear solve at 50 digits).

Writes redtime_tpu/_gk61.py with the f64-rounded arrays plus the
embedded-Gauss index map.  Checks: interlacing, weight positivity,
symmetry, exact integration of monomials up to degree 90 (Kronrod part)
and 59 (embedded Gauss part).
"""

import os
import sys

import mpmath as mp

mp.mp.dps = 50
N = 30  # embedded Gauss order; Kronrod adds N+1 points


def legendre_coeffs(n):
    """Monomial coefficients of P_n (mpmath, exact rationals -> mpf)."""
    # recurrence: (m+1) P_{m+1} = (2m+1) x P_m - m P_{m-1}
    P = [[mp.mpf(1)], [mp.mpf(0), mp.mpf(1)]]
    for m in range(1, n):
        a = [mp.mpf(0)] + [c * (2 * m + 1) / (m + 1) for c in P[m]]
        b = [c * m / (m + 1) for c in P[m - 1]] + [mp.mpf(0), mp.mpf(0)]
        P.append([x - y for x, y in zip(a, b)])
    return P


def poly_int(coeffs):
    """integral_{-1}^{1} of a monomial-coefficient polynomial."""
    return sum(c * (mp.mpf(2) / (i + 1)) for i, c in enumerate(coeffs)
               if i % 2 == 0)


def poly_mul(a, b):
    out = [mp.mpf(0)] * (len(a) + len(b) - 1)
    for i, x in enumerate(a):
        for j, y in enumerate(b):
            out[i + j] += x * y
    return out


def poly_eval(coeffs, x):
    v = mp.mpf(0)
    for c in reversed(coeffs):
        v = v * x + c
    return v


def main():
    P = legendre_coeffs(2 * N + 1)

    # --- Gauss-30 nodes/weights ---
    g_nodes = mp.polyroots([c for c in reversed(P[N])], maxsteps=200,
                           extraprec=200)
    g_nodes = sorted(mp.mpf(r.real) for r in g_nodes)
    dP = [P[N][i] * i for i in range(1, N + 1)]
    g_w = [2 / ((1 - x ** 2) * poly_eval(dP, x) ** 2) for x in g_nodes]

    # --- Stieltjes polynomial E_31 in the Legendre basis ---
    # E = P_31 + sum_{j in {29,27,...,1}} e_j P_j  (odd parity, like P_31);
    # conditions: <P_30 E x^k> = 0 for k odd, k = 1..29 (even k vanish by
    # parity) -> 15 equations for 15 unknowns.
    js = list(range(N + 1 - 2, 0, -2))             # 29, 27, ..., 1
    ks = list(range(1, N, 2))                      # 1, 3, ..., 29
    A = mp.matrix(len(ks), len(js))
    rhs = mp.matrix(len(ks), 1)
    for r, k in enumerate(ks):
        xk = [mp.mpf(0)] * k + [mp.mpf(1)]
        base = poly_mul(P[N], xk)
        rhs[r] = -poly_int(poly_mul(base, P[N + 1]))
        for c, j in enumerate(js):
            A[r, c] = poly_int(poly_mul(base, P[j]))
    e = mp.lu_solve(A, rhs)
    E = list(P[N + 1])
    for c, j in enumerate(js):
        for i, v in enumerate(P[j]):
            E[i] += e[c] * v

    k_nodes = mp.polyroots([c for c in reversed(E)], maxsteps=400,
                           extraprec=300)
    k_nodes = sorted(mp.mpf(r.real) for r in k_nodes)

    # interlacing check: k0 < g0 < k1 < g1 < ... < g29 < k30
    merged = []
    for i in range(N):
        merged += [k_nodes[i], g_nodes[i]]
    merged.append(k_nodes[N])
    assert all(merged[i] < merged[i + 1] for i in range(len(merged) - 1)), \
        "Kronrod/Gauss nodes do not interlace"

    # --- 61 Kronrod weights: exactness on P_0..P_60 ---
    all_nodes = sorted(g_nodes + k_nodes)
    M = mp.matrix(2 * N + 1, 2 * N + 1)
    rhs2 = mp.matrix(2 * N + 1, 1)
    for r in range(2 * N + 1):
        for c, x in enumerate(all_nodes):
            M[r, c] = poly_eval(P[r], x)
        rhs2[r] = mp.mpf(2) if r == 0 else mp.mpf(0)
    w = mp.lu_solve(M, rhs2)
    assert all(w[i] > 0 for i in range(2 * N + 1)), "negative GK weight"
    # symmetry
    for i in range(2 * N + 1):
        assert mp.almosteq(w[i], w[2 * N - i], rel_eps=mp.mpf(10) ** -40)

    # exactness checks: degree 90 for GK61 (3N+1 = 91 coefficients ->
    # exact through x^90), degree 59 for the embedded Gauss part
    for deg in (60, 88, 90):
        exact = mp.mpf(2) / (deg + 1) if deg % 2 == 0 else mp.mpf(0)
        got = sum(w[i] * all_nodes[i] ** deg for i in range(2 * N + 1))
        assert mp.almosteq(got, exact, abs_eps=mp.mpf(10) ** -35), deg
    for deg in (58, 59):
        exact = mp.mpf(2) / (deg + 1) if deg % 2 == 0 else mp.mpf(0)
        got = sum(g_w[i] * g_nodes[i] ** deg for i in range(N))
        assert mp.almosteq(got, exact, abs_eps=mp.mpf(10) ** -35), deg

    # Gauss nodes sit at the odd positions of the sorted 61-node array
    gauss_idx = [all_nodes.index(x) for x in g_nodes]
    assert gauss_idx == list(range(1, 2 * N + 1, 2))

    def fmt(vals):
        return ",\n    ".join(mp.nstr(v, 17) for v in vals)

    out = f'''"""61-point Gauss-Kronrod rule (QUADPACK dqk61 / GSL qag key=6).

GENERATED by scripts/gen_gk61.py — derived from first principles with
mpmath (Stieltjes-polynomial orthogonality + Legendre-basis exactness
solve at 50 digits), NOT transcribed from QUADPACK/GSL tables.  Do not
edit by hand; regenerate instead.
"""

import numpy as np

# 61 nodes on [-1, 1], ascending; the embedded 30-point Gauss rule sits
# at the odd indices 1, 3, ..., 59.
XGK61 = np.array([
    {fmt(all_nodes)},
])

# Kronrod weights for all 61 nodes.
WGK61 = np.array([
    {fmt(w)},
])

# Gauss-30 weights, aligned with XGK61[1::2].
WG30 = np.array([
    {fmt(g_w)},
])
'''
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        os.pardir, "redtime_tpu", "_gk61.py")
    with open(path, "w") as f:
        f.write(out)
    print(f"wrote {path}")


if __name__ == "__main__":
    sys.exit(main())
