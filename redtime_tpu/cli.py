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
    # persistent compilation cache: accelerator compiles of the full
    # pipeline are minutes-scale; without this EVERY cli invocation pays
    # them again (measured: a warm-cache 16-model batch solve is ~1 s vs
    # ~150 s compiling).  Shapes key the cache: re-runs with the same
    # grid/transfer-stack shapes hit it.
    cache = os.environ.get("JAX_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "redtime_tpu", "jax")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
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


def _coerce(field, text: str):
    """Parse a --set VALUE string into the type of the SolverConfig
    field's default (every field has a scalar default)."""
    proto = field.default
    if isinstance(proto, bool):
        low = text.lower()
        if low in ("1", "true", "yes", "on"):
            return True
        if low in ("0", "false", "no", "off"):
            return False
        raise SystemExit(f"--set {field.name}: expected a boolean, "
                         f"got {text!r}")
    for typ in (int, float) if isinstance(proto, int) else (float,):
        if isinstance(proto, typ):
            try:
                return typ(text)
            except ValueError:
                raise SystemExit(f"--set {field.name}: expected "
                                 f"{typ.__name__}, got {text!r}")
    return text


def _config(args):
    """SolverConfig from the CLI tier flags — the runtime equivalent of
    the reference's compile-time configuration tiers (SURVEY section 5.6:
    nk/np ifdefs, HIGH_ACCURACY, v0.1 README settings).  Any remaining
    field is reachable via --set key=value (e.g. --set eabs_P=1e-9
    --set np_factor=8 --set out_leg=dot), applied after the preset."""
    import dataclasses

    from redtime_tpu.config import SolverConfig

    make = {"default": SolverConfig,
            "high-accuracy": SolverConfig.high_accuracy,
            "v01-compat": SolverConfig.v01_compat}[args.preset]
    cfg = make(fft_mode=args.mode, dtype=args.dtype)
    if args.nk is not None:
        cfg = dataclasses.replace(cfg, nk=args.nk)
    fields = {f.name: f for f in dataclasses.fields(SolverConfig)}
    for kv in getattr(args, "set_kv", None) or []:
        key, sep, val = kv.partition("=")
        if not sep:
            raise SystemExit(f"--set expects key=value, got {kv!r}")
        if key not in fields:
            raise SystemExit(
                f"--set: unknown SolverConfig field {key!r}; valid: "
                + ", ".join(sorted(fields)))
        cfg = dataclasses.replace(cfg, **{key: _coerce(fields[key], val)})
    return cfg


def _maybe_show_legs(args, cfg) -> None:
    if getattr(args, "show_legs", False):
        from redtime_tpu.fastpt import resolved_legs

        print(f"# resolved engine legs: {resolved_legs(cfg, args.mode)}",
              file=sys.stderr)


def cmd_run(args) -> int:
    _setup_jax(args.platform)
    from redtime_tpu.driver import run_pipeline
    from redtime_tpu.io.writer import write_result

    p, lin, settings, cosmo = _load(args.params, args.modern)
    cfg = _config(args)
    _maybe_show_legs(args, cfg)

    t0 = time.time()
    res = run_pipeline(cfg, settings, cosmo, lin, mode=args.mode)
    res.table.block_until_ready()
    dt = time.time() - t0

    from redtime_tpu.driver import finite_report
    if len(finite_report(res)):
        print(f"# {args.params}: solver produced non-finite output "
              "(diverged/poisoned state) — refusing to write",
              file=sys.stderr)
        return 1

    out = open(args.output, "w") if args.output else sys.stdout
    write_result(out, res, os.path.basename(args.params))
    if args.output:
        out.close()
        print(f"# wrote {args.output} in {dt:.1f}s", file=sys.stderr)
    return 0


def cmd_batch(args) -> int:
    jax = _setup_jax(args.platform)
    import numpy as np

    from redtime_tpu.driver import run_batch
    from redtime_tpu.io.writer import write_result_to_path
    from redtime_tpu.profiling import StageTimer, device_trace

    cfg = _config(args)
    _maybe_show_legs(args, cfg)
    timer = StageTimer(enabled=args.timing)

    def outname(path):
        name = os.path.splitext(os.path.basename(path))[0]
        # strip only the PREFIX: replace() would mangle interior matches
        # and collide distinct inputs onto one output path
        if name.startswith("params_"):
            name = name[len("params_"):]
        return os.path.join(args.output_dir, name + ".dat")

    params_files = list(args.params_files)
    if args.skip_existing:
        exists = {p: os.path.exists(outname(p)) for p in params_files}
        skipped = [p for p in params_files if exists[p]]
        params_files = [p for p in params_files if not exists[p]]
        if skipped:
            print(f"# skipping {len(skipped)} already-produced outputs",
                  file=sys.stderr)
        if not params_files:
            return 0

    with timer.stage("load-inputs"):
        loaded = [_load(path, args.modern) for path in params_files]
    settings = loaded[0][2]
    for path, (_, _, s, _) in zip(params_files, loaded):
        if s != settings:
            raise SystemExit(
                f"{path}: run settings differ from {params_files[0]}; "
                "a batch must share switches/redshifts (the reference's "
                "batch loop shares them too)")

    # a vmapped batch needs identical pytree leaf shapes; mixed designs
    # (massless + massive nu, or different transfer row counts) would
    # otherwise die in the stack with no file named
    ref_shapes = jax.tree_util.tree_map(lambda x: np.shape(x),
                                        loaded[0][1])
    for path, (_, l, _, _) in zip(params_files[1:], loaded[1:]):
        shapes = jax.tree_util.tree_map(lambda x: np.shape(x), l)
        if shapes != ref_shapes:
            raise SystemExit(
                f"{path}: linear-input shapes differ from "
                f"{params_files[0]} (e.g. massless vs massive-neutrino "
                "models, or transfer files of different lengths); run "
                "such designs as separate batches")
    # stack on the HOST (numpy): inputs are file data and run_batch slices
    # its chunks host-side anyway; jnp.stack on an accelerator default
    # backend would pay a remote compile (~0.4 s each on the tunnel, below
    # the persistent-cache threshold) plus a transfer per leaf, then an
    # immediate pull back
    tonp = lambda x: np.asarray(x)
    cosmos = jax.tree_util.tree_map(
        lambda *xs: np.stack([tonp(x) for x in xs]),
        *[c for (_, _, _, c) in loaded])
    lins = jax.tree_util.tree_map(
        lambda *xs: np.stack([tonp(x) for x in xs]),
        *[l for (_, l, _, _) in loaded])

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
            seg_breaks = (tuple(float(b) for b in
                                args.seg_breaks.split(",") if b)
                          if args.seg_breaks else None)
            res = run_batch(cfg, settings, cosmos, lins, mode=args.mode,
                            mesh=mesh, scheduler=args.scheduler,
                            max_chunk=args.chunk, n_lanes=args.lanes,
                            seg_breaks=seg_breaks)
            res.table.block_until_ready()
    dt = time.time() - t0

    # per-model failure detection: a diverged/NaN cosmology poisons only
    # its own lane (the reference batch loop dies on first failure,
    # runRedTimeBatch:2; here the rest of the design survives)
    from redtime_tpu.driver import finite_report
    bad_idx = set(int(i) for i in finite_report(res))
    bad = [params_files[i] for i in sorted(bad_idx)]

    os.makedirs(args.output_dir, exist_ok=True)
    with timer.stage("write-outputs"):
        # fetch the whole batch to host once (one transfer per leaf);
        # per-model device indexing would pay a tunnel round-trip per
        # leaf per model
        res = jax.tree_util.tree_map(lambda x: np.asarray(x), res)
        for i, path in enumerate(params_files):
            if i in bad_idx:
                continue
            one = jax.tree_util.tree_map(lambda x: x[i], res)
            write_result_to_path(outname(path), one,
                                 os.path.basename(path))
    n = len(params_files)
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
    common.add_argument("--show-legs", action="store_true",
                        help="print the resolved engine legs (which "
                        "'auto' knobs engaged their MXU fast path)")
    common.add_argument("--preset", default="default",
                        choices=["default", "high-accuracy", "v01-compat"],
                        help="solver configuration tier: the reference's "
                        "default build, the HIGH_ACCURACY ifdef "
                        "(nk=512, tol 1e-15/1e-6), or the v0.1 README "
                        "settings")
    common.add_argument("--nk", type=int, default=None,
                        help="override the solver k-grid size "
                        "(reference compile-time nk, redTime.cc:90-94)")
    common.add_argument("--set", action="append", dest="set_kv",
                        metavar="KEY=VALUE", default=[],
                        help="override any SolverConfig field by name "
                        "(repeatable), e.g. --set eabs_P=1e-9 "
                        "--set np_factor=8 --set out_leg=dot; the full "
                        "reference compile-time tier (SURVEY 5.6) is "
                        "reachable this way")

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
    b.add_argument("--scheduler", default="auto",
                   choices=["auto", "chunked", "packed", "segmented"],
                   help="batch scheduler: 'chunked' overlaps host "
                   "prepare with device solves (default), 'packed' is "
                   "the work-queue scheduler for stiffness-heterogeneous "
                   "designs (lanes pull models as they finish), "
                   "'segmented' issues one device program per output "
                   "interval so big-grid chunks can grow past the "
                   "tunnel's single-dispatch wall (nk=512)")
    b.add_argument("--chunk", type=int, default=None,
                   help="chunked/segmented-scheduler sub-batch size "
                   "(default: 16 full-TRG / 32 one-loop on accelerators; "
                   "segmented default 64)")
    b.add_argument("--lanes", type=int, default=None,
                   help="packed-scheduler lane count (default 8)")
    b.add_argument("--seg-breaks", default=None,
                   help="segmented-scheduler extra eta breakpoints "
                   "(comma list) subdividing long intervals")
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
