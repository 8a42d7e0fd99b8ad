"""Command-line interface.

`run`   — the redTime-binary equivalent: consume a params_redTime.dat (plus
          its CAMB transfer files) and write the 17-column output table
          (reference `src/redTime.cc` main()).
`batch` — evolve many params files in one vmapped (optionally
          mesh-sharded) computation: the TPU-native replacement for the
          serial `runRedTimeBatch` shell loop
          (reference scripts/runRedTimeBatch:91-99).

CAMB itself remains an external input generator, exactly as in the
reference; see scripts/run_camb_pipeline.py for the two-pass sigma_8
orchestration.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def _setup_jax(platform: str | None):
    import jax

    jax.config.update("jax_enable_x64", True)
    if platform == "cpu":
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
    cfg = SolverConfig(fft_mode=args.mode)

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

    cfg = SolverConfig(fft_mode=args.mode)

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
    res = run_batch(cfg, settings, cosmos, lins, mode=args.mode, mesh=mesh)
    res.table.block_until_ready()
    dt = time.time() - t0

    os.makedirs(args.output_dir, exist_ok=True)
    for i, path in enumerate(args.params_files):
        name = os.path.splitext(os.path.basename(path))[0]
        name = name.replace("params_", "")
        one = jax.tree_util.tree_map(lambda x: x[i], res)
        write_result_to_path(os.path.join(args.output_dir, f"{name}.dat"),
                             one, os.path.basename(path))
    n = len(args.params_files)
    print(f"# {n} cosmologies in {dt:.1f}s "
          f"({n / dt * 60:.1f} cosmologies/min)", file=sys.stderr)
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
    b.set_defaults(fn=cmd_batch)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
