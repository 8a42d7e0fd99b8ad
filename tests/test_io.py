"""IO readers: params file and CAMB transfer files against the bundled
reference example inputs."""

import numpy as np

from redtime_tpu.io import read_params_file
from redtime_tpu.io.camb import load_from_params


def test_read_example_params(example_dir):
    p = read_params_file(f"{example_dir}/params_redTime.dat")
    assert p.n_s == 0.87969
    assert p.sigma_8 == 0.80560
    assert p.h == 0.73418
    assert np.isclose(p.Omega_m, 0.286233679143621)
    assert np.isclose(p.Omega_b, 0.0430930827493416)
    assert np.isclose(p.Omega_nu, 0.00576437405571056)
    assert p.T_cmb == 2.726
    assert p.w0 == -1.2147
    assert p.wa == -1.1120
    assert (p.switch_nonlinear, p.switch_1loop, p.print_lin, p.print_rsd) \
        == (1, 1, 1, 1)
    assert p.z_in == 200
    assert p.z_out == [5, 4, 3, 2, 1, 0.5, 0]
    assert p.transfer_file == "camb_transfer_z0.dat"
    assert p.nu_transfer_root == "camb_transfer_z"
    assert p.z_interp_str == ["200", "100", "50", "20", "10", "5", "4", "3",
                              "2", "1", ".5", "0"]
    # the literal-string redshifts name the files (e.g. ".5")
    files = p.nu_transfer_files(example_dir)
    assert files[10].endswith("camb_transfer_z.5.dat")


def test_load_linear_data(example_dir):
    p = read_params_file(f"{example_dir}/params_redTime.dat")
    lin = load_from_params(p, example_dir)
    assert lin.t_lnk.shape == (15447,)
    assert lin.beta_raw.shape == (12, 15447)
    assert np.all(np.diff(lin.t_lnk) > 0)
    # a ascending (z descending in the file)
    assert np.all(np.diff(lin.beta_a) > 0)
    assert np.isclose(lin.beta_a[-1], 1.0)
    assert np.isclose(lin.beta_a[0], 1.0 / 201.0)
    # delta_nu/delta_c < 1 on small scales at late times
    assert lin.beta_raw[-1, -1] < lin.beta_raw[-1, 0]


def test_massless_skips_stack(example_dir, tmp_path):
    p = read_params_file(f"{example_dir}/params_redTime.dat")
    p.Omega_nu = 0.0
    lin = load_from_params(p, example_dir)
    assert lin.beta_raw.shape[0] == 0
    assert lin.t_lnk.shape == (15447,)


def test_native_format_rows_byte_identical():
    # the native formatter (csrc format_rows) must produce byte-identical
    # output to the Python f-string path for the %.12g setw(20) contract,
    # including subnormals, extremes, signed zero, and non-finite values
    import numpy as np

    from redtime_tpu.io import native
    from redtime_tpu.io.writer import WIDTH, _w

    if not native.available():
        import pytest
        pytest.skip("native IO library unavailable (no toolchain)")

    rng = np.random.default_rng(7)
    vals = np.concatenate([
        rng.standard_normal(5000) * 10.0 ** rng.integers(-320, 300, 5000),
        10.0 ** rng.uniform(-310, 308, 5000) * rng.choice([-1, 1], 5000),
        np.array([0.0, -0.0, np.inf, -np.inf, np.nan, 1e-5, 1e15, 1e16,
                  0.1, 1.0, -1.0, 5e-324, 1.7976931348623157e308,
                  2.2250738585072014e-308, 123456789012.0,
                  1234567890123.0, 0.000123456789012345, 1e100, -1e-100]),
    ])
    vals = np.concatenate([vals, np.zeros((-len(vals)) % 17)])
    block = vals.reshape(-1, 17)
    nat = native.format_rows(block, WIDTH, 12)
    assert nat is not None
    py = "".join("".join(_w(x) for x in row) + "\n" for row in block)
    assert nat == py


def test_write_result_uses_block_formatting(tmp_path):
    # write_result through the (native or fallback) block formatter must
    # round-trip: loadtxt of the output equals the table to %.12g
    import io as _io

    import numpy as np

    from redtime_tpu.io import writer

    class R:
        pass

    r = R()
    rng = np.random.default_rng(3)
    r.table = np.abs(rng.standard_normal((2, 16, 17))) + 1e-3
    r.eta = np.array([0.0, 1.0])
    r.a = np.array([0.5, 1.0])
    r.z = 1.0 / r.a - 1.0
    r.H = np.ones(2)
    r.sigma_v2 = np.ones(2)
    r.eta_fin = 1.0
    r.sigmaV2_z0 = 37.9

    buf = _io.StringIO()
    writer.write_result(buf, r)
    out = np.loadtxt(_io.StringIO(buf.getvalue()))
    assert out.shape == (32, 17)
    assert np.allclose(out, r.table.reshape(32, 17), rtol=1e-11)
