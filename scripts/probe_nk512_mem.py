#!/usr/bin/env python
"""Compile-only HBM residency of the nk=512 chunked solve executable.

Round-5: the batch sweep's 64:64 point faulted the TPU worker
(UNAVAILABLE).  Before blaming flakiness, read XLA's own memory
analysis of the chunk-n executable — if temp+argument residency
crosses the v5e-lite 16 GB HBM at chunk 64, the fault is a plain OOM
and the chunked-knee is a MEMORY wall at 32, not a bandwidth knee.

Lower+compile only; no execution, so it is safe on a wedged-recovered
tunnel and needs no 100 s solves.

Usage: probe_nk512_mem.py [--chunks 16,32,64] [--preset high-accuracy]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from redtime_tpu import driver, fastpt, model as mdl  # noqa: E402
from redtime_tpu.config import CosmoParams, RunSettings, SolverConfig  # noqa: E402
from __graft_entry__ import _example_inputs  # noqa: E402

Z_OUT_PROD = (2.02, 1.61, 1.01, 0.66, 0.43, 0.24, 0.10, 0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", default="16,32,64")
    ap.add_argument("--preset", default="high-accuracy",
                    choices=("high-accuracy", "v01-compat", "default"))
    args = ap.parse_args()

    backend = jax.default_backend()
    mode = "matmul" if backend == "tpu" else "fft"
    mk = {"high-accuracy": SolverConfig.high_accuracy,
          "v01-compat": SolverConfig.v01_compat,
          "default": SolverConfig}[args.preset]
    cfg = mk(fft_mode=mode)
    settings = RunSettings(one_loop=False, z_out=Z_OUT_PROD)
    print(f"backend {backend}, preset {args.preset}, nk={cfg.nk}")

    lin = _example_inputs(cfg)
    c0 = CosmoParams.make(n_s=0.96, sigma_8=0.8, h=0.7, Omega_m=0.3,
                          Omega_b=0.046, Omega_nu=0.0, T_cmb=2.726,
                          w0=-1.0, wa=0.0)
    m_shape = jax.eval_shape(lambda c, l: mdl.prepare_model(cfg, c, l),
                             c0, lin)
    ec = fastpt.engine_consts(cfg, mode)
    ec_shape = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        ec)

    for chunk in (int(c) for c in args.chunks.split(",")):
        ms_shape = jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct((chunk,) + s.shape, s.dtype),
            m_shape)
        fn = driver._jitted_solve(cfg, settings, mode, True)
        compiled = fn.lower(ms_shape, ec_shape).compile()
        ma = compiled.memory_analysis()
        gb = 1024 ** 3
        try:
            print(f"chunk {chunk:3d}: temp {ma.temp_size_in_bytes / gb:.2f} "
                  f"GiB, args {ma.argument_size_in_bytes / gb:.2f} GiB, "
                  f"out {ma.output_size_in_bytes / gb:.2f} GiB, "
                  f"gen {ma.generated_code_size_in_bytes / 1e6:.0f} MB, "
                  f"TOTAL {(ma.temp_size_in_bytes + ma.argument_size_in_bytes + ma.output_size_in_bytes) / gb:.2f} GiB")
        except AttributeError:
            print(f"chunk {chunk:3d}: memory_analysis -> {ma}")


if __name__ == "__main__":
    main()
