"""Golden comparison of the linear-theory layer against the reference's
bundled example output (examples/1_redTime/example_redTime_result.dat).

Columns (PRINTLIN on): 1=D(k,z), 2=f=dlnD/dlna, 3=P_lin_cb, 4=B/B1,
5=dlnB/dlna, 6=P_lin_nu (reference redTime.cc:1672-1677).
"""

import numpy as np
import pytest

from redtime_tpu.config import CosmoParams, SolverConfig
from redtime_tpu.io import read_params_file
from redtime_tpu.io.camb import load_from_params
from redtime_tpu import model as M

Z_OUT = [5, 4, 3, 2, 1, 0.5, 0]


@pytest.fixture(scope="module")
def setup(example_dir):
    p = read_params_file(f"{example_dir}/params_redTime.dat")
    lin = load_from_params(p, example_dir)
    cfg = SolverConfig()
    c = CosmoParams.make(p.n_s, p.sigma_8, p.h, p.Omega_m, p.Omega_b,
                         p.Omega_nu, p.T_cmb, p.w0, p.wa)
    m = M.prepare_model(cfg, c, lin)
    rows = []
    for line in open(f"{example_dir}/example_redTime_result.dat"):
        if line.startswith("#") or not line.strip():
            continue
        rows.append([float(x) for x in line.split()])
    golden = np.array(rows).reshape(7, 128, 17)
    return cfg, m, golden


def _relmax(a, b):
    return float(np.max(np.abs(np.asarray(a) - b) / (np.abs(b) + 1e-30)))


@pytest.mark.parametrize("z", [5, 1, 0])
def test_linear_columns(setup, z):
    cfg, m, golden = setup
    blk = golden[Z_OUT.index(z)]
    a = 1.0 / (1.0 + z)
    D, dD = M.growth_D_f(m, float(z))
    f = a * dD / D
    _, Pcb, Pnu = M.plin_all(cfg, m, float(z))
    beta = M.beta_P_solver(m, a)
    b1 = M.beta_P_solver(m, 1.0)
    aL, aR = a * 0.999, min(1.0, a * 1.001)
    dlnB = (a / beta) * (M.beta_P_solver(m, aR) - M.beta_P_solver(m, aL)) \
        / (aR - aL)

    assert _relmax(D, blk[:, 1]) < 1e-6
    assert _relmax(f, blk[:, 2]) < 1e-6
    assert _relmax(Pcb, blk[:, 3]) < 1e-5
    assert _relmax(beta / (b1 + 1e-100), blk[:, 4]) < 1e-8
    assert _relmax(dlnB, blk[:, 5]) < 1e-8
    assert _relmax(Pnu, blk[:, 6]) < 1e-5


def test_sigma_v2(setup):
    cfg, m, golden = setup
    # headers record sigma_v^2 per z; z=0 value printed in the banner too
    assert np.isclose(float(m.sigmaV2_z0), 37.9210668076, rtol=1e-5)
    assert np.isclose(float(M.sigma_v2(m, 5.0)), 1.49867805918, rtol=1e-5)


def test_growth_normalized(setup):
    cfg, m, golden = setup
    D, _ = M.growth_D_f(m, 0.0)
    assert np.allclose(np.asarray(D), 1.0, atol=1e-13)
