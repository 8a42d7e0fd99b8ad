"""Batch-design example (examples/2_scripts): the worked counterpart of
the reference's `examples/2_scripts/runModels` (which drives
`scripts/runRedTimeBatch target_redshifts.txt models.dat`,
reference runRedTimeBatch:91-99).

Consumes the bundled `models.dat` / `target_redshifts.txt` artifacts in
their reference formats through the full mock-CAMB orchestration
(scripts/run_redtime.py --models-file) into ONE vmapped solver batch,
and pins the per-model transfer-root isolation: the reference's serial
loop can share one `camb_transfer_z*` root because it solves before the
next CAMB run overwrites it; the batched pipeline must not.
"""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
EXAMPLE = os.path.join(REPO, "examples", "2_scripts")
MOCK_CAMB = os.path.join(HERE, "mock_camb.py")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import run_redtime  # noqa: E402


def _parse_models(path):
    models = []
    for line in open(path):
        if line.strip().startswith("#") or not line.strip():
            continue
        p = line.split()
        models.append((p[0],) + tuple(float(x) for x in p[1:9]))
    return models


def test_bundled_design_formats():
    """The bundled artifacts parse in the reference schemas."""
    models = _parse_models(os.path.join(EXAMPLE, "models.dat"))
    assert len(models) == 3
    for name, om_m, om_b, s8, h, ns, w0, wa, om_nu in models:
        assert name.startswith("X")
        assert 0.1 < om_m < 0.2 and 0.01 < om_b < 0.03
        assert 0.5 < h < 0.9 and om_nu > 0.0
    zs = [float(x) for x in
          open(os.path.join(EXAMPLE, "target_redshifts.txt")).read().split()]
    assert zs == sorted(zs, reverse=True) and zs[-1] == 0.0


def test_run_models_batch_end_to_end(tmp_path):
    """The full design through run_redtime.py --models-file with the mock
    CAMB: per-model transfer stacks, per-model params files, one batched
    solve, one finite 17-column output table per model."""
    outdir = str(tmp_path / "output")
    rc = run_redtime.main([
        "--redshift-file", os.path.join(EXAMPLE, "target_redshifts.txt"),
        "--models-file", os.path.join(EXAMPLE, "models.dat"),
        "--output-dir", outdir, "--camb-exec", MOCK_CAMB, "--mode", "fft",
    ])
    assert rc == 0

    models = _parse_models(os.path.join(EXAMPLE, "models.dat"))
    n_z = len(open(os.path.join(EXAMPLE,
                                "target_redshifts.txt")).read().split())

    # two CAMB passes per model (sigma_8 rescale, runRedTime:161-186)
    amps = [float(x) for x in
            open(os.path.join(outdir, "mock_camb_amps.log")).read().split()]
    assert len(amps) == 2 * len(models)

    from redtime_tpu.io import read_params_file

    tables = {}
    for name, *_ in models:
        # per-model transfer roots: the batched pipeline must NOT share
        # one camb_transfer_z* root across models (overwrite hazard)
        p = read_params_file(
            os.path.join(outdir, f"params_redTime_{name}.dat"))
        assert p.transfer_file == f"camb_{name}_transfer_z0.dat"
        assert os.path.exists(os.path.join(outdir, p.transfer_file))
        out = os.path.join(outdir, f"redTime_{name}.dat")
        assert os.path.exists(out), os.listdir(outdir)
        t = np.loadtxt(out)
        assert t.shape == (n_z * 128, 17)
        assert np.all(np.isfinite(t))
        # production switches "1 0 1 1": full-TRG — B-term columns zero,
        # A-term columns populated (the documented reference caveat)
        assert np.all(t[:, 13:17] == 0.0)
        assert np.any(t[:, 10:13] != 0.0)
        tables[name] = t

    # distinct cosmologies produced distinct spectra (a shared transfer
    # root would collapse them onto the last model's inputs)
    assert not np.allclose(tables["X001"][:, 7], tables["X002"][:, 7])
    assert not np.allclose(tables["X002"][:, 7], tables["X003"][:, 7])
