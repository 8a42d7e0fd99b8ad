"""IO readers: params file and CAMB transfer files against the bundled
reference example inputs."""

import numpy as np

from redtime_tpu.io import read_params_file, load_linear_data
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
