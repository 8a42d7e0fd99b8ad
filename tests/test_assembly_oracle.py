"""Independent transcription check of the assembly coefficients.

The golden end-to-end test validates A/R/PT numerically through the output
columns, but the P_{MR,n} bias integrals are only printed under PRINTBIAS
and have no golden coverage.  This test builds an ORACLE by evaluating the
reference source's expressions directly: after stripping the `[nshift + i]`
read suffix, the C++ arithmetic (`J[9 * 3 + 4] / 6 + 0.55 * ...`) is valid
Python over index-mapping array proxies, so the exact rational coefficients
— including nested parenthesized groups — are exercised without
re-transcription.  Test-only scaffolding, not ported code.
"""

import ast
import os
import re

import numpy as np
import pytest

import jax.numpy as jnp

from redtime_tpu import assembly

REF = "/root/reference/src/redTime.cc"


class _Arr:
    """Proxy: X[9*n + idx] -> data[n, idx//3, idx%3] (the reference's flat
    transform indexing)."""

    def __init__(self, data):
        self.data = data

    def __getitem__(self, flat):
        n, idx = flat // 9, flat % 9
        return self.data[n, idx // 3, idx % 3]


def _pyize(expr: str) -> str:
    """C++ expression -> evaluable Python: drop the second [..] read index
    (always the same k row), map the nloMR low-k read to a scalar name."""
    expr = expr.replace("\n", " ")
    expr = expr.replace("J[9 * 0][nloMR]", "J_lo")
    expr = expr.replace("[nshift + i]", "")
    return expr


# The extracted text comes from UNTRUSTED reference source; eval only after
# whitelisting the AST down to pure arithmetic (names/constants/indexing).
_ALLOWED_NODES = (ast.Expression, ast.BinOp, ast.UnaryOp, ast.Constant,
                  ast.Name, ast.Subscript, ast.Load,
                  ast.Add, ast.Sub, ast.Mult, ast.Div, ast.USub, ast.UAdd)
_ALLOWED_NAMES = {"J", "PZ", "Jn0", "J_lo", "k2", "a", "b", "c", "nk", "i"}


def _safe_eval(expr: str, env: dict):
    tree = ast.parse(expr.strip(), mode="eval")
    for node in ast.walk(tree):
        if not isinstance(node, _ALLOWED_NODES):
            raise ValueError(
                f"disallowed syntax {type(node).__name__!r} in oracle "
                f"expression: {expr[:80]!r}")
        if isinstance(node, ast.Name) and node.id not in _ALLOWED_NAMES:
            raise ValueError(f"disallowed name {node.id!r} in oracle "
                             f"expression: {expr[:80]!r}")
        if isinstance(node, ast.Constant) and \
                not isinstance(node.value, (int, float)):
            raise ValueError(f"disallowed constant {node.value!r}")
    return eval(compile(tree, "<oracle>", "eval"), env)


def _extract_block(src: str, start_pat: str, end_pat: str) -> str:
    i = src.index(start_pat)
    j = src.index(end_pat, i)
    return src[i:j]


@pytest.fixture(scope="module")
def random_inputs():
    rng = np.random.default_rng(7)
    nk = 16
    Jf = rng.normal(size=(7, 3, 3, nk))
    PZf = rng.normal(size=(7, 3, 3, nk))
    Jn0f = rng.normal(size=(7, 3, 3, nk))
    J_lo = float(rng.normal())
    k = np.exp(np.linspace(np.log(1e-3), 0.0, nk))
    return Jf, PZf, Jn0f, J_lo, k


def _env(Jf, PZf, Jn0f, J_lo, k):
    return {"J": _Arr(Jf), "PZ": _Arr(PZf), "Jn0": _Arr(Jn0f),
            "J_lo": J_lo, "k2": k * k, "__builtins__": {}}


@pytest.mark.skipif(not os.path.exists(REF), reason="reference unavailable")
def test_pmr_against_reference_expressions(random_inputs):
    Jf, PZf, Jn0f, J_lo, k = random_inputs
    src = open(REF).read()
    block = _extract_block(src, "const int nloMR", "  }\n\n  return 0;")
    exprs = re.findall(r"PMRn\[(\d)\]\[i\] =([^;]+);", block)
    assert len(exprs) == 8

    env = _env(Jf, PZf, Jn0f, J_lo, k)
    oracle = np.zeros((8, len(k)))
    for ns, expr in exprs:
        oracle[int(ns)] = _safe_eval(_pyize(expr), env)

    _, _, _, PMR = assembly.assemble(
        jnp.asarray(Jf), jnp.asarray(PZf), jnp.asarray(Jn0f),
        jnp.asarray(J_lo), jnp.asarray(k), with_rsd=True)
    got = np.asarray(PMR)
    for n in range(8):
        assert np.allclose(got[n], oracle[n], rtol=1e-12, atol=1e-13), n


@pytest.mark.skipif(not os.path.exists(REF), reason="reference unavailable")
def test_a_slots_against_reference_expressions(random_inputs):
    """Same oracle for the 14 unique A slots (golden-covered numerically;
    this checks the transcription symbol by symbol)."""
    Jf, PZf, Jn0f, J_lo, k = random_inputs
    src = open(REF).read()
    block = _extract_block(src, "// A_{acd,bef}", "// symmetries")

    pat = re.compile(
        r"Jterms =([^;]+);\s*PZterms =([^;]+);\s*"
        r"Aacdbef\[(\d+) \* nk \+ i\] = pre_A \* \(Jterms \+ PZterms\);")
    env = _env(Jf, PZf, Jn0f, J_lo, k)
    pre_A = k / (4.0 * np.pi)
    slots = {}
    for m in pat.finditer(block):
        jt = _safe_eval(_pyize(m.group(1)), env)
        pz = _safe_eval(_pyize(m.group(2)), env)
        slots[int(m.group(3))] = pre_A * (jt + pz)
    assert len(slots) == 14, sorted(slots)

    A_u, _, _, _ = assembly.assemble(
        jnp.asarray(Jf), jnp.asarray(PZf), jnp.asarray(Jn0f),
        jnp.asarray(J_lo), jnp.asarray(k), with_rsd=False)
    got = np.asarray(A_u)
    for j, slot in enumerate(assembly.JU):
        assert np.allclose(got[j], slots[slot], rtol=1e-12), slot


@pytest.mark.skipif(not os.path.exists(REF), reason="reference unavailable")
def test_pt_against_reference_expressions(random_inputs):
    """Oracle for the 9 P_{T,jm} components (B-term columns)."""
    Jf, PZf, Jn0f, J_lo, k = random_inputs
    src = open(REF).read()
    block = _extract_block(src, "// P_{T,jm}[index][wavenumber]",
                           "// P_{MR,n}(k)")
    exprs = re.findall(r"PTjm\[(\d)\]\[i\] =([^;]+);", block)
    assert len(exprs) == 9

    env = _env(Jf, PZf, Jn0f, J_lo, k)
    env["k2"] = k * k
    oracle = np.zeros((9, len(k)))
    for ns, expr in exprs:
        e = _pyize(expr).replace("(k2 * k2)", "(k2*k2)")
        oracle[int(ns)] = _safe_eval(e, env)

    _, _, PT, _ = assembly.assemble(
        jnp.asarray(Jf), jnp.asarray(PZf), jnp.asarray(Jn0f),
        jnp.asarray(J_lo), jnp.asarray(k), with_rsd=True)
    got = np.asarray(PT)
    for n in range(9):
        assert np.allclose(got[n], oracle[n], rtol=1e-12), n


@pytest.mark.skipif(not os.path.exists(REF), reason="reference unavailable")
def test_r_against_reference_expressions(random_inputs):
    """Oracle for the 24 R^ell_{abc} components.  The reference assigns,
    per ell, six expression bodies in a fixed order (a==0/else Jterms,
    b==0/else PZterms, c==0/else PZterms); reconstruct the branch logic
    and evaluate with (a, b, c) bound in the eval environment."""
    Jf, PZf, Jn0f, J_lo, k = random_inputs
    src = open(REF).read()
    block = _extract_block(src, "// R^{ell}_{abc}",
                           "// P_{T,jm}[index][wavenumber]")

    jterms = re.findall(r"Jterms =([^;]+);", block)
    pzterms = re.findall(r"PZterms =([^;]+);", block)
    assert len(jterms) == 6      # (a==0, a==1) x 3 ells
    assert len(pzterms) == 12    # (b==0, b==1, c==0, c==1) x 3 ells

    pre_R = 1.0 / (2.0 * np.pi * k)
    oracle = np.zeros((3, 8, len(k)))
    for ell in range(3):
        for a in range(2):
            for b in range(2):
                for c in range(2):
                    env = _env(Jf, PZf, Jn0f, J_lo, k)
                    env.update(a=a, b=b, c=c)
                    jt = _safe_eval(
                        _pyize(jterms[2 * ell + (0 if a == 0 else 1)]), env)
                    pzb = _safe_eval(_pyize(
                        pzterms[4 * ell + (0 if b == 0 else 1)]), env)
                    pzc = _safe_eval(_pyize(
                        pzterms[4 * ell + (2 if c == 0 else 3)]), env)
                    oracle[ell, 4 * a + 2 * b + c] = pre_R * (jt + pzb + pzc)

    _, R, _, _ = assembly.assemble(
        jnp.asarray(Jf), jnp.asarray(PZf), jnp.asarray(Jn0f),
        jnp.asarray(J_lo), jnp.asarray(k), with_rsd=True)
    got = np.asarray(R)
    for ell in range(3):
        for j in range(8):
            assert np.allclose(got[ell, j], oracle[ell, j], rtol=1e-12), \
                (ell, j)


def test_omega_bilinear_equals_stacked_onehot():
    """The collapsed bilinear matrices (one dot against the Of x I outer
    product) must reproduce the stacked one-hot product-sum formulation
    of the RHS Omega contractions exactly (both restate reference
    redTime.cc:1500-1539)."""
    from redtime_tpu import assembly

    rng = np.random.default_rng(7)
    nk = 16
    Of = rng.standard_normal((4, nk))
    I14 = rng.standard_normal((14, nk))
    Q24 = rng.standard_normal((24, nk))
    PI, QI, TR14, PQ, QQ = assembly.OMEGA_MATS
    CI, CQ = assembly.OMEGA_BILINEAR

    t_ref = ((QI @ Of) * (PI @ I14)).reshape(6, 14, nk).sum(axis=0)
    t_new = CI @ (Of[:, None, :] * I14[None, :, :]).reshape(4 * 14, nk)
    np.testing.assert_allclose(t_new, t_ref, rtol=1e-13, atol=1e-13)

    q_ref = ((QQ @ Of) * (PQ @ Q24)).reshape(6, 24, nk).sum(axis=0)
    q_new = CQ @ (Of[:, None, :] * Q24[None, :, :]).reshape(4 * 24, nk)
    np.testing.assert_allclose(q_new, q_ref, rtol=1e-13, atol=1e-13)
