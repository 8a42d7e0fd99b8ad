"""Writer format parity and convertPt equivalence tests."""

import io

import numpy as np

from redtime_tpu.convert import (STEP_TO_ZBLOCK, convert_pt_one,
                                 read_redtime_table)
from redtime_tpu.io.writer import _g, _w, write_result


def test_g_formatting_matches_cpp_default_float():
    # C++ setprecision(12) default-float == %.12g
    cases = {
        0.001: "0.001",
        254.596438721: "254.596438721",
        2.40137974801e-06: "2.40137974801e-06",
        -9.46172766184e-09: "-9.46172766184e-09",
        0.166666666666667: "0.166666666667",
        5.0: "5",
        0.5: "0.5",
        0.0: "0",
    }
    for x, s in cases.items():
        assert _g(x) == s, (x, _g(x), s)


def test_w_width():
    assert len(_w(0.001)) == 20
    assert _w(0.001).endswith("0.001")


class _FakeResult:
    def __init__(self):
        self.table = np.arange(2 * 3 * 4, dtype=float).reshape(2, 3, 4)
        self.eta = np.array([1.0, 2.0])
        self.a = np.array([0.5, 1.0])
        self.z = np.array([1.0, 0.0])
        self.H = np.array([4e-4, 3e-4])
        self.sigma_v2 = np.array([10.0, 37.9])
        self.sigmaV2_z0 = 37.9
        self.eta_fin = 5.3033


def test_write_result_structure():
    buf = io.StringIO()
    write_result(buf, _FakeResult(), "params_redTime.dat")
    text = buf.getvalue()
    lines = text.split("\n")
    assert lines[0].startswith("#cosmological_parameters: opening")
    assert lines[1].startswith("###main: eta_fin = 5.3033,")
    assert lines[2].startswith("### main: output at eta=1, a=0.5, z=1,")
    # 3 data rows, then two blank lines, then next block header
    assert lines[6] == "" and lines[7] == ""
    assert lines[8].startswith("### main: output at eta=2")
    # round-trips through the reference's numpy.loadtxt-style parsing
    data = [[float(x) for x in ln.split()] for ln in lines
            if ln.strip() and not ln.startswith("#")]
    assert np.allclose(np.array(data).reshape(2, 3, 4),
                       _FakeResult().table)


def test_convert_pt_one(tmp_path):
    # synthetic 33-z redTime table
    nz, nk = 33, 8
    table = np.zeros((nz, nk, 17))
    k = np.logspace(-3, 0, nk)
    for iz in range(nz):
        table[iz, :, 0] = k
        table[iz, :, 7] = 100.0 * (iz + 1) / k
    h, f_cb = 0.7, 0.98
    kk, pk = convert_pt_one(table, h, f_cb, 300)
    iz = STEP_TO_ZBLOCK[300]
    assert np.allclose(kk, k * h)
    assert np.allclose(pk, table[iz, :, 7] / h ** 3 * f_cb ** 2)

    # file round trip through the writer format
    path = tmp_path / "redTime_M001.dat"
    with open(path, "w") as f:
        f.write("# header\n")
        for iz in range(nz):
            f.write(f"### block {iz}\n")
            for row in table[iz]:
                f.write(" ".join(repr(float(v)) for v in row) + "\n")
            f.write("\n\n")
    rt = read_redtime_table(str(path), nk)
    assert rt.shape == (nz, nk, 17)
    assert np.allclose(rt, table)


def test_run_redtime_derivations():
    import sys
    sys.path.insert(0, "scripts")
    from run_redtime import derive

    # reference example: M032-like little omegas
    d = derive(0.1543, 0.02323, 0.003107, 0.73418)
    assert np.isclose(d["Omega_m"], 0.1543 / 0.73418 ** 2)
    assert np.isclose(d["Omega_nu"], 0.003107 / 0.73418 ** 2)
    assert d["massless_nu"] == 0.0 and d["massive_nu"] == 3.046
    d2 = derive(0.1543, 0.02323, 0.0, 0.73418)
    assert d2["massless_nu"] == 3.046 and d2["massive_nu"] == 0.0


def test_params_roundtrip_through_orchestration(tmp_path):
    """scripts/run_redtime.write_params emits files our reader (and the
    reference's parser schema) consumes."""
    import sys
    sys.path.insert(0, "scripts")
    from run_redtime import write_params
    from redtime_tpu.io import read_params_file

    path = tmp_path / "params_redTime_M001.dat"
    write_params(str(path), "M001", om_m=0.1433, om_b=0.02238, s8=0.80,
                 h=0.71, ns=0.963, w0=-1.0, wa=0.0, om_nu=0.001,
                 z_out=["2", "1", "0"])
    p = read_params_file(str(path))
    assert np.isclose(p.Omega_m, 0.1433 / 0.71 ** 2)
    assert np.isclose(p.Omega_nu, 0.001 / 0.71 ** 2)
    assert p.z_out == [2.0, 1.0, 0.0]
    assert p.z_in == 200
    assert (p.switch_nonlinear, p.switch_1loop) == (1, 0)
    assert len(p.z_interp_str) == 33
    assert p.nu_transfer_root == "camb_transfer_z"


def test_camb_ini_generation(tmp_path):
    import sys
    sys.path.insert(0, "scripts")
    from run_redtime import make_camb_ini

    tpl = ("root=CAMB_TEMPLATE_OUTROOT ob=CAMB_TEMPLATE_OMBH2 "
           "oc=CAMB_TEMPLATE_OMCH2 on=CAMB_TEMPLATE_OMNUH2 "
           "h0=CAMB_TEMPLATE_H0 w=CAMB_TEMPLATE_W0 wa=CAMB_TEMPLATE_WA "
           "t=CAMB_TEMPLATE_TCMB tau=CAMB_TEMPLATE_TAU "
           "ns=CAMB_TEMPLATE_NS ml=CAMB_TEMPLATE_MASSLESS_NU "
           "mv=CAMB_TEMPLATE_MASSIVE_NU amp=CAMB_SCALAR_AMP")
    tf = tmp_path / "t.ini"
    tf.write_text(tpl)
    out = make_camb_ini(str(tf), "/out/camb", om_b=0.0224, om_c=0.118,
                        om_nu=0.001, h=0.7, w0=-0.9, wa=0.1, ns=0.96,
                        scalar_amp="2.15903458773893")
    assert "root=/out/camb" in out
    assert "h0=7.000000e+01" in out
    assert "ml=0 mv=3.046" in out          # massive-nu split
    assert "amp=2.15903458773893e-9" in out
    out2 = make_camb_ini(str(tf), "/out/camb", om_b=0.0224, om_c=0.118,
                         om_nu=0.0, h=0.7, w0=-1.0, wa=0.0, ns=0.96,
                         scalar_amp="2.0")
    assert "ml=3.046 mv=0" in out2         # massless


def test_convert_pk_full(tmp_path):
    """convertPkFull merger math (reference src/convert_pk.c): f_cb^2 on
    PT, natural-cubic D(k)^2 growth correction on PM/HACC, h rescalings,
    err = P/sqrt(counts)."""
    import numpy as np
    from redtime_tpu.convert import convert_pk_full, STEP_TO_ZBLOCK

    nk, nz = 16, 33
    h, om, omnu = 0.7, 0.14, 0.0014
    f_cb = (om - omnu) / om
    design = tmp_path / "design.dat"
    design.write_text("#\n#\n#\n#\n#\n"
                      f"M001 {om} 0.022 0.8 {h} 0.96 -1.0 0.0 {omnu}\n")

    # synthetic redTime output: 33 z-blocks x nk rows x 17 cols
    k = np.logspace(-3, 0, nk)
    rng = np.random.default_rng(3)
    table = np.zeros((nz, nk, 17))
    table[:, :, 0] = k
    table[:, :, 1] = 0.5 + 0.4 * rng.random((nz, nk))        # D
    table[:, :, 6] = 10.0 * (1 + rng.random((nz, nk)))       # P_nu
    table[:, :, 7] = 100.0 * (1 + rng.random((nz, nk)))      # P_dd
    pt = tmp_path / "redTime_M001.dat"
    np.savetxt(pt, table.reshape(-1, 17))

    # synthetic PM (2 runs) and HACC pk files: k, P, counts
    def pk_file(path, n, seed):
        r = np.random.default_rng(seed)
        kk = np.linspace(2e-3, 1.4, n)
        P = 50.0 * (1 + r.random(n))
        counts = 10.0 + 100.0 * r.random(n)
        np.savetxt(path, np.column_stack([kk, P, counts]),
                   header="k P counts")
        return kk, P, counts

    for pm in range(2):
        pk_file(tmp_path / f"pm{pm}.dat", 12, 10 + pm)
    kh, Ph, ch = pk_file(tmp_path / "hacc.dat", 20, 99)

    step = 300
    convert_pk_full(str(design), step, str(tmp_path / "out"),
                    str(tmp_path / "redTime_M{model:03d}.dat"),
                    str(tmp_path / "pm{pm}.dat"),
                    str(tmp_path / "hacc.dat"),
                    models=[1], nk_pt=nk, n_pm=2)

    pk = np.loadtxt(tmp_path / "out" / "pk_M001_no_interp_test.dat")
    kf = np.loadtxt(tmp_path / "out" / "k_M001_no_interp_test.dat")
    err = np.loadtxt(tmp_path / "out" / "err_M001_no_interp_test.dat")
    assert pk.shape == (20, 4) and kf.shape == (20, 4)
    assert err.shape == (20, 3)

    iz = STEP_TO_ZBLOCK[step]
    # PT column: k*h, P_dd/h^3 * f_cb^2
    # files are written '%f' (6 decimals, the reference's '%lf' too)
    tol = dict(rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(kf[:nk, 0], k * h, **tol)
    np.testing.assert_allclose(pk[:nk, 0],
                               table[iz, :, 7] / h ** 3 * f_cb * f_cb,
                               **tol)
    # HACC column: growth-corrected with the PT D(k) spline
    from scipy.interpolate import CubicSpline
    spl = CubicSpline(k * h, table[iz, :, 1], bc_type="natural")
    g = np.where(kh * h < (k * h)[-1], spl(np.minimum(kh * h, (k*h)[-1])),
                 1.0) ** 2
    np.testing.assert_allclose(pk[:, 3], Ph / h ** 3 * g, **tol)
    np.testing.assert_allclose(err[:, 2],
                               Ph / h ** 3 / np.sqrt(ch) * g, **tol)


def test_convert_pk_full_interp_grid(tmp_path):
    """interp_grid mode: every spectrum splined onto one shared emulator
    k grid (reference's commented emulator-grid path, convert_pk.c:258-271:
    cspline in linear k, zero outside each source's range)."""
    import numpy as np
    from redtime_tpu.convert import (STEP_TO_ZBLOCK, convert_pk_full,
                                     mt_emulator_kgrid)
    from scipy.interpolate import CubicSpline

    nk, nz = 16, 33
    h, om, omnu = 0.7, 0.14, 0.0014
    f_cb = (om - omnu) / om
    design = tmp_path / "design.dat"
    design.write_text("#\n#\n#\n#\n#\n"
                      f"M001 {om} 0.022 0.8 {h} 0.96 -1.0 0.0 {omnu}\n")
    k = np.logspace(-3, 0, nk)
    rng = np.random.default_rng(3)
    table = np.zeros((nz, nk, 17))
    table[:, :, 0] = k
    table[:, :, 1] = 0.5 + 0.4 * rng.random((nz, nk))
    table[:, :, 6] = 10.0 * (1 + rng.random((nz, nk)))
    table[:, :, 7] = 100.0 * (1 + rng.random((nz, nk)))
    np.savetxt(tmp_path / "redTime_M001.dat", table.reshape(-1, 17))

    def pk_file(path, n, seed):
        r = np.random.default_rng(seed)
        kk = np.linspace(2e-3, 1.4, n)
        P = 50.0 * (1 + r.random(n))
        counts = 10.0 + 100.0 * r.random(n)
        np.savetxt(path, np.column_stack([kk, P, counts]),
                   header="k P counts")
        return kk, P, counts

    for pm in range(2):
        pk_file(tmp_path / f"pm{pm}.dat", 12, 10 + pm)
    kh, Ph, ch = pk_file(tmp_path / "hacc.dat", 20, 99)

    step = 300
    kq = mt_emulator_kgrid(351, kmin=2e-3, kmax=1.3)
    convert_pk_full(str(design), step, str(tmp_path / "out"),
                    str(tmp_path / "redTime_M{model:03d}.dat"),
                    str(tmp_path / "pm{pm}.dat"),
                    str(tmp_path / "hacc.dat"),
                    models=[1], nk_pt=nk, n_pm=2, suffix="interp",
                    interp_grid=kq)

    kf = np.loadtxt(tmp_path / "out" / "k_M001_interp.dat")
    pk = np.loadtxt(tmp_path / "out" / "pk_M001_interp.dat")
    err = np.loadtxt(tmp_path / "out" / "err_M001_interp.dat")
    # one shared k column; 4 pk columns (PT, 2 PM, HACC); 3 err columns
    assert kf.shape == (351,) and pk.shape == (351, 4)
    assert err.shape == (351, 3)
    np.testing.assert_allclose(kf, kq, rtol=1e-5, atol=1e-6)

    # PT column: cspline of (k*h, P_dd/h^3 fcb^2) inside range, 0 outside
    iz = STEP_TO_ZBLOCK[step]
    spl = CubicSpline(k * h, table[iz, :, 7] / h ** 3 * f_cb * f_cb,
                      bc_type="natural")
    inside = (kq > (k * h)[0]) & (kq < (k * h)[-1])
    exp = np.where(inside, spl(np.clip(kq, (k*h)[0], (k*h)[-1])), 0.0)
    np.testing.assert_allclose(pk[:, 0], exp, rtol=1e-4, atol=1e-5)
    assert np.all(pk[~inside, 0] == 0.0)
    # HACC column zero outside the HACC k range
    outside_h = (kq <= kh[0] * h) | (kq >= kh[-1] * h)
    assert np.all(pk[outside_h, 3] == 0.0)


def test_tns_ab_combination():
    """tns_ab combines the mu-power columns per README.md:104-113."""
    from redtime_tpu.convert import tns_ab
    rng = np.random.default_rng(7)
    block = rng.standard_normal((16, 17))
    mu = np.array([0.0, 0.5, 1.0])
    A, B = tns_ab(block, mu)
    assert A.shape == (3, 16) and B.shape == (3, 16)
    assert np.allclose(A[0], 0.0) and np.allclose(B[0], 0.0)
    m2 = 0.25
    np.testing.assert_allclose(
        A[1], m2 * block[:, 10] + m2**2 * block[:, 11] + m2**3 * block[:, 12],
        rtol=1e-15)
    np.testing.assert_allclose(
        B[2], block[:, 13] + block[:, 14] + block[:, 15] + block[:, 16],
        rtol=1e-14)
    A1, B1 = tns_ab(block, 0.5)
    np.testing.assert_allclose(A1, A[1], rtol=0)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        tns_ab(block[:, :16], 0.5)


def test_mt_emulator_kgrid_structure():
    """The Mira-Titan k grid (convert_pk.c:27-43): 50 log points on
    [1e-3, 0.04), 150 linear on [0.04, 0.2], log to kmax beyond."""
    from redtime_tpu.convert import mt_emulator_kgrid
    k = mt_emulator_kgrid(3000)
    assert len(k) == 3000 and np.all(np.diff(k) > 0)
    assert k[0] == 1e-3
    assert k[49] < 0.04 <= k[50] + 1e-12
    np.testing.assert_allclose(k[199], 0.2, rtol=1e-12)
    # linear region: constant spacing
    assert np.allclose(np.diff(k[50:200]), k[51] - k[50], rtol=1e-9)
    np.testing.assert_allclose(k[-1], 5.0, rtol=1e-12)
