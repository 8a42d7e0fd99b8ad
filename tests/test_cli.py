"""End-to-end tests of the command-line interface (cli.py) — the
replacement for the reference's `redTime` binary invocation and the
`runRedTimeBatch` shell loop (scripts/runRedTimeBatch:91-99).

Inputs are synthesized CAMB-format stacks (tests/mock_camb.py style);
the solver runs at a small nk through the new --nk tier flag so the
full-TRG engine compiles in seconds on the CPU backend.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, "scripts"))

from redtime_tpu import cli  # noqa: E402

Z_OUT = ["2.0", "1.0", "0.0"]


def _synth_stack(workdir, z_list, seed):
    rng = np.random.default_rng(seed)
    k = np.logspace(-5, 1.3, 400)
    keq = 0.014 + 0.004 * rng.random()
    T = 1.0 / (1.0 + (k / keq) ** 2 * np.log(1.0 + k / keq))
    for z in z_list:
        a = 1.0 / (1.0 + float(z))
        supp = 1.0 / (1.0 + (k / 0.12) ** 2) * (0.3 + 0.7 * a) + 1e-4
        cols = np.column_stack([k, T, T, T, T, T * supp, T])
        np.savetxt(os.path.join(workdir, f"camb_transfer_z{z}.dat"),
                   cols, fmt="%.8e")


def _write_params(tmp_path, name, seed, sigma_8=0.8):
    from run_redtime import write_params

    mdir = tmp_path / name
    mdir.mkdir(exist_ok=True)
    # the beta stack needs >= 4 redshift nodes for the cubic a-stencil;
    # write_params hardcodes the 33-z CAMB list as the interp stack
    from run_redtime import CAMB_Z_LIST
    _synth_stack(str(mdir), CAMB_Z_LIST.split(), seed)
    path = tmp_path / f"params_redTime_{name}.dat"
    write_params(str(path), name, 0.1335, 0.02258, sigma_8, 0.71, 0.963,
                 -1.0, 0.0, 0.0004, Z_OUT,
                 transfer_root=f"{name}/camb_transfer_z")
    return str(path)


@pytest.fixture(scope="module")
def batch_inputs(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("cli")
    return tmp_path, [_write_params(tmp_path, f"M{i:03d}", 100 + i,
                                    sigma_8=0.78 + 0.02 * i)
                      for i in range(3)]


def test_cli_batch_end_to_end(batch_inputs):
    tmp_path, params = batch_inputs
    out = tmp_path / "out"
    rc = cli.main(["batch", "--output-dir", str(out), "--platform", "cpu",
                   "--nk", "32", "--mode", "fft"] + params)
    assert rc == 0
    tables = []
    for i in range(3):
        f = out / f"redTime_M{i:03d}.dat"
        assert f.exists()
        t = np.loadtxt(f)
        assert t.shape == (3 * 32, 17)
        assert np.all(np.isfinite(t))
        tables.append(t)
    # distinct cosmologies (different sigma_8) give distinct spectra
    assert not np.allclose(tables[0][:, 7], tables[1][:, 7])

    # batch output must match the single-model `run` path within the
    # controller band (vmapped vs unvmapped XLA programs reorder float
    # arithmetic, which the adaptive controller can amplify to ~1e-8;
    # bitwise equality is only guaranteed chunk-vs-chunk,
    # tests/test_batch_faults.py)
    single = tmp_path / "single.dat"
    rc = cli.main(["run", "--params", params[0], "--platform", "cpu",
                   "--nk", "32", "--mode", "fft", "-o", str(single)])
    assert rc == 0
    s = np.loadtxt(single)
    scale = np.max(np.abs(s), axis=0) + 1e-300
    assert np.max(np.abs(s - tables[0]) / scale) < 1e-6


def test_cli_batch_skip_existing(batch_inputs, capsys):
    tmp_path, params = batch_inputs
    out = tmp_path / "out"  # produced by the previous test
    rc = cli.main(["batch", "--output-dir", str(out), "--platform", "cpu",
                   "--nk", "32", "--mode", "fft", "--skip-existing"]
                  + params)
    assert rc == 0
    assert "skipping 3" in capsys.readouterr().err


def test_cli_batch_rejects_mixed_shapes(batch_inputs, tmp_path):
    _, params = batch_inputs
    # a massless model has an EMPTY beta stack: different pytree shapes
    from run_redtime import write_params

    path = tmp_path / "params_redTime_ML.dat"
    _synth_stack(str(tmp_path), ["0"], 7)
    write_params(str(path), "ML", 0.1335, 0.02258, 0.8, 0.71, 0.963,
                 -1.0, 0.0, 0.0, Z_OUT, transfer_root="camb_transfer_z")
    with pytest.raises(SystemExit, match="shapes differ"):
        cli.main(["batch", "--output-dir", str(tmp_path), "--platform",
                  "cpu", "--nk", "32", "--mode", "fft",
                  params[0], str(path)])


def test_cli_preset_flags():
    # tier flags resolve to the documented presets (SURVEY section 5.6)
    import argparse

    ns = argparse.Namespace(preset="high-accuracy", nk=None, mode="fft",
                            dtype="float64")
    cfg = cli._config(ns)
    assert cfg.nk == 512 and cfg.eabs_P == 1e-15
    ns = argparse.Namespace(preset="v01-compat", nk=64, mode="fft",
                            dtype="float64")
    cfg = cli._config(ns)
    assert cfg.nk == 64 and cfg.np_factor == 8 and cfg.a_early == 1e-50


def test_cli_set_overrides():
    """--set key=value reaches every SolverConfig field with the right
    type (the remaining compile-time tier knobs, VERDICT r3 item 9)."""
    import argparse

    def ns(*kv):
        return argparse.Namespace(preset="default", nk=None, mode="fft",
                                  dtype="float64", set_kv=list(kv))

    cfg = cli._config(ns("eabs_P=1e-9", "np_factor=8", "out_leg=dot",
                         "growth_h_reset=true", "quad_order=20"))
    assert cfg.eabs_P == 1e-9 and cfg.np_factor == 8
    assert cfg.out_leg == "dot" and cfg.growth_h_reset is True
    assert cfg.quad_order == 20
    # overrides apply AFTER the preset
    import dataclasses
    base = cli._config(argparse.Namespace(
        preset="high-accuracy", nk=None, mode="fft", dtype="float64",
        set_kv=["erel_P=1e-4"]))
    assert base.nk == 512 and base.erel_P == 1e-4
    assert dataclasses.replace(base, erel_P=1e-6) == \
        cli._config(argparse.Namespace(preset="high-accuracy", nk=None,
                                       mode="fft", dtype="float64",
                                       set_kv=[]))
    with pytest.raises(SystemExit, match="unknown SolverConfig field"):
        cli._config(ns("not_a_knob=1"))
    with pytest.raises(SystemExit, match="expected int"):
        cli._config(ns("nk=abc"))
    with pytest.raises(SystemExit, match="expected a boolean"):
        cli._config(ns("print_a=maybe"))
    with pytest.raises(SystemExit, match="key=value"):
        cli._config(ns("nk"))


def test_cli_batch_packed_scheduler(batch_inputs):
    """--scheduler packed --lanes 2 drives the work-queue scheduler from
    the CLI and matches the chunked output within the controller band."""
    tmp_path, params = batch_inputs
    out = tmp_path / "out_packed"
    rc = cli.main(["batch", "--output-dir", str(out), "--platform", "cpu",
                   "--nk", "32", "--mode", "fft",
                   "--scheduler", "packed", "--lanes", "2"] + params)
    assert rc == 0
    ref = tmp_path / "out"  # chunked outputs from the first test
    for i in range(3):
        a = np.loadtxt(out / f"redTime_M{i:03d}.dat")
        b = np.loadtxt(ref / f"redTime_M{i:03d}.dat")
        scale = np.max(np.abs(b), axis=0) + 1e-300
        assert np.max(np.abs(a - b) / scale) < 1e-5
