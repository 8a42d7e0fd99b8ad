"""Output formatting reproducing the reference's stdout contract.

The reference prints `setprecision(12)` `setw(20)` default-float columns
with `###` header lines and two blank lines between redshift blocks
(`src/redTime.cc:1602-1741`).  Downstream tools (convert_pt.c, the pytest
suite's numpy.loadtxt) parse exactly that, so the format is part of the API.

C++ default-float with precision 12 == printf %.12g.
"""

from __future__ import annotations

from typing import IO

import numpy as np

WIDTH = 20  # reference redTime.cc:64


def _g(x: float) -> str:
    return f"{float(x):.12g}"


def _w(x: float) -> str:
    return f"{_g(x):>{WIDTH}}"


def _format_block(block: np.ndarray) -> str:
    """One redshift block of data rows.  The native formatter
    (csrc/redtime_io.cpp format_rows) is byte-identical to the Python
    f-string path and ~10x faster — at batch 64 the Python formatting
    (~1.1M values, ~0.9 s) rivals the device solve itself; tests pin the
    byte equality (test_io.py)."""
    from redtime_tpu.io import native
    s = native.format_rows(block, WIDTH, 12)
    if s is None:
        s = "".join("".join(_w(x) for x in row) + "\n" for row in block)
    return s


def write_result(f: IO[str], res, params_file_name: str | None = None
                 ) -> None:
    """Write a RunResult as the reference's redTime_<model>.dat format."""
    if params_file_name is not None:
        f.write("#cosmological_parameters: opening parameter file: "
                f"{params_file_name}\n")
    f.write(f"###main: eta_fin = {_g(res.eta_fin)}, "
            f"sigmaV2(z=0) = {_g(res.sigmaV2_z0)}\n")
    table = np.asarray(res.table)
    n_eta = table.shape[0]
    for i in range(n_eta):
        f.write(f"### main: output at eta={_g(res.eta[i])}, "
                f"a={_g(res.a[i])}, z={_g(res.z[i])}, H={_g(res.H[i])}, "
                f"sigma_v^2={_g(res.sigma_v2[i])}\n")
        f.write(_format_block(table[i]))
        f.write("\n\n")


def write_result_to_path(path: str, res,
                         params_file_name: str | None = None) -> None:
    with open(path, "w") as f:
        write_result(f, res, params_file_name)
