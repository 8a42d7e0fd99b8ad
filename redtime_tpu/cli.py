"""Command-line interface.

`run`   — the redTime-binary equivalent: consume a params_redTime.dat (plus
          its CAMB transfer files) and write the 17-column output table
          (reference `src/redTime.cc` main()).
`batch` — evolve many params files in one vmapped (optionally
          mesh-sharded) computation: the TPU-native replacement for the
          serial `runRedTimeBatch` shell loop
          (reference scripts/runRedTimeBatch:91-99).

CAMB itself remains an external input generator, exactly as in the
reference; see scripts/run_redtime.py for the two-pass sigma_8
orchestration.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def _setup_jax(platform: str | None):
    if platform == "cpu":
        # must happen before jax initializes a backend; some accelerator
        # plugins (axon tunnel) otherwise win regardless
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_enable_x64", True)
    if platform == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        try:
            jax.config.update("jax_default_device", jax.devices("cpu")[0])
        except RuntimeError:
            pass
    return jax


def _load(params_path: str, modern: bool):
    from redtime_tpu.driver import settings_from_params
    from redtime_tpu.io import read_params_file
    from redtime_tpu.io.camb import load_from_params

    p = read_params_file(params_path)
    base = os.path.dirname(os.path.abspath(params_path))
    lin = load_from_params(p, base, modern)
    settings, cosmo = settings_from_params(p)
    return p, lin, settings, cosmo


def cmd_run(args) -> int:
    _setup_jax(args.platform)
    from redtime_tpu.config import SolverConfig
    from redtime_tpu.driver import run_pipeline
    from redtime_tpu.io.writer import write_result

    p, lin, settings, cosmo = _load(args.params, args.modern)
    cfg = SolverConfig(fft_mode=args.mode, dtype=args.dtype)

    t0 = time.time()
    res = run_pipeline(cfg, settings, cosmo, lin, mode=args.mode)
    res.table.block_until_ready()
    dt = time.time() - t0

    out = open(args.output, "w") if args.output else sys.stdout
    write_result(out, res, os.path.basename(args.params))
    if args.output:
        out.close()
        print(f"# wrote {args.output} in {dt:.1f}s", file=sys.stderr)
    return 0


def cmd_batch(args) -> int:
    jax = _setup_jax(args.platform)
    import numpy as np

    from redtime_tpu.config import SolverConfig
    from redtime_tpu.driver import run_batch
    from redtime_tpu.io.writer import write_result_to_path
    from redtime_tpu.profiling import StageTimer, device_trace

    cfg = SolverConfig(fft_mode=args.mode, dtype=args.dtype)
    timer = StageTimer(enabled=args.timing)

    def outname(path):
        name = os.path.splitext(os.path.basename(path))[0]
        return os.path.join(args.output_dir,
                            name.replace("params_", "") + ".dat")

    params_files = list(args.params_files)
    if args.skip_existing:
        skipped = [p for p in params_files if os.path.exists(outname(p))]
        params_files = [p for p in params_files
                        if not os.path.exists(outname(p))]
        if skipped:
            print(f"# skipping {len(skipped)} already-produced outputs",
                  file=sys.stderr)
        if not params_files:
            return 0
    args = argparse.Namespace(**{**vars(args),
                                 "params_files": params_files})

    with timer.stage("load-inputs"):
        loaded = [_load(path, args.modern) for path in args.params_files]
    settings = loaded[0][2]
    for path, (_, _, s, _) in zip(args.params_files, loaded):
        if s != settings:
            raise SystemExit(
                f"{path}: run settings differ from {args.params_files[0]}; "
                "a batch must share switches/redshifts (the reference's "
                "batch loop shares them too)")

    import jax.numpy as jnp
    cosmos = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[c for (_, _, _, c) in loaded])
    lins = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[l for (_, l, _, _) in loaded])

    mesh = None
    if args.shard:
        from jax.sharding import Mesh
        devs = np.array(jax.devices())
        n = len(loaded)
        nd = max(d for d in range(1, len(devs) + 1) if n % d == 0)
        mesh = Mesh(devs[:nd], ("batch",))
        print(f"# sharding batch of {n} over {nd} devices", file=sys.stderr)

    t0 = time.time()
    with device_trace(args.trace_dir):
        with timer.stage("solve-batch"):
            res = run_batch(cfg, settings, cosmos, lins, mode=args.mode,
                            mesh=mesh)
            res.table.block_until_ready()
    dt = time.time() - t0

    # per-model failure detection: a diverged/NaN cosmology poisons only
    # its own lane (the reference batch loop dies on first failure,
    # runRedTimeBatch:2; here the rest of the design survives)
    table = np.asarray(res.table)
    bad = [args.params_files[i] for i in range(table.shape[0])
           if not np.all(np.isfinite(table[i]))]

    os.makedirs(args.output_dir, exist_ok=True)
    with timer.stage("write-outputs"):
        for i, path in enumerate(args.params_files):
            if args.params_files[i] in bad:
                continue
            one = jax.tree_util.tree_map(lambda x: x[i], res)
            write_result_to_path(outname(path), one,
                                 os.path.basename(path))
    n = len(args.params_files)
    print(f"# {n} cosmologies in {dt:.1f}s "
          f"({n / dt * 60:.1f} cosmologies/min)", file=sys.stderr)
    if args.timing:
        print(timer.report(), file=sys.stderr)
    if bad:
        print(f"# WARNING: {len(bad)} model(s) produced non-finite "
              f"output and were not written: {bad}", file=sys.stderr)
        return 1
    return 0


def cmd_convert(args) -> int:
    from redtime_tpu.convert import convert_pt

    convert_pt(args.n_models, args.step, args.nk, args.models_file,
               args.red_dir)
    return 0


def cmd_convert_full(args) -> int:
    from redtime_tpu.convert import convert_pk_full

    convert_pk_full(args.design, args.step, args.output_dir,
                    args.pt_template, args.pm_template, args.hacc_template,
                    models=args.models, nk_pt=args.nk, n_pm=args.n_pm)
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="redtime-tpu",
        description="TPU-native Time-RG nonlinear power spectrum solver")
    sub = ap.add_subparsers(dest="cmd", required=True)

    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--mode", default="auto",
                        choices=["auto", "fft", "matmul"],
                        help="FFT backend (matmul = DFT on the MXU)")
    common.add_argument("--platform", default=None, choices=[None, "cpu"],
                        help="force the CPU backend")
    common.add_argument("--modern", action="store_true",
                        help="13-column (pip CAMB) transfer files")
    common.add_argument("--dtype", default="float64",
                        choices=["float64", "float32"],
                        help="solver stepping dtype (float32 = TPU "
                        "throughput mode, ~1e-4 accuracy)")

    r = sub.add_parser("run", parents=[common],
                       help="solve one params_redTime.dat")
    r.add_argument("--params", required=True)
    r.add_argument("--output", "-o", default=None,
                   help="output file (default stdout)")
    r.set_defaults(fn=cmd_run)

    b = sub.add_parser("batch", parents=[common],
                       help="solve many params files in one vmapped run")
    b.add_argument("params_files", nargs="+")
    b.add_argument("--output-dir", "-o", default=".")
    b.add_argument("--shard", action="store_true",
                   help="shard the batch over all visible devices")
    b.add_argument("--skip-existing", action="store_true",
                   help="skip models whose output file already exists")
    b.add_argument("--timing", action="store_true",
                   help="print per-stage wall-clock")
    b.add_argument("--trace-dir", default=None,
                   help="write a jax.profiler trace here")
    b.set_defaults(fn=cmd_batch)

    cv = sub.add_parser("convert",
                        help="emulator post-processing (convertPt)")
    cv.add_argument("--n-models", type=int, required=True)
    cv.add_argument("--step", type=int, required=True,
                    help="HACC analysis step (163..499)")
    cv.add_argument("--nk", type=int, default=128)
    cv.add_argument("--models-file", required=True)
    cv.add_argument("--red-dir", required=True)
    cv.set_defaults(fn=cmd_convert)

    cf = sub.add_parser(
        "convert-full",
        help="merge PT + PM + HACC spectra (convertPkFull equivalent; "
             "path templates take {model}/{step}/{pm})")
    cf.add_argument("--design", required=True, help="design/models file")
    cf.add_argument("--step", type=int, required=True)
    cf.add_argument("--output-dir", "-o", required=True)
    cf.add_argument("--pt-template", required=True,
                    help="e.g. runs/redTime_M{model:03d}.dat")
    cf.add_argument("--pm-template", required=True,
                    help="e.g. runs/M{model:03d}/PM{pm:03d}/m.pk.{step}")
    cf.add_argument("--hacc-template", required=True)
    cf.add_argument("--models", type=int, nargs="*", default=None)
    cf.add_argument("--nk", type=int, default=128)
    cf.add_argument("--n-pm", type=int, default=16)
    cf.set_defaults(fn=cmd_convert_full)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
