"""ctypes bindings for the native C++ IO runtime (csrc/redtime_io.cpp).

Builds the shared library on first use if a toolchain is available;
falls back to numpy when it isn't.  The native path parallelizes the
per-cosmology transfer-stack load (33 files) over OpenMP threads.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     os.pardir, os.pardir, "csrc")
_LIB_PATH = os.path.join(_CSRC, "libredtime_io.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    # run make unconditionally: its dependency check is a no-op when the
    # library is fresh, and it rebuilds when csrc/redtime_io.cpp changed
    # (the .so is a build artifact, not committed to git)
    try:
        subprocess.run(["make", "-C", _CSRC], check=True,
                       capture_output=True, timeout=120)
    except Exception:
        pass
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.parse_table.restype = ctypes.c_long
    lib.parse_table.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_long]
    lib.parse_stack.restype = None
    lib.parse_stack.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_long, ctypes.c_long,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_long,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")]
    try:
        lib.format_rows.restype = ctypes.c_long
        lib.format_rows.argtypes = [
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.c_char_p, ctypes.c_long]
    except AttributeError:    # stale .so without the formatter
        pass
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _rows_upper_bound(path: str) -> int:
    """Upper bound on row count from the byte size (>= 8 bytes per value is
    a safe floor for numeric text); keeps scratch buffers right-sized —
    first-touch of oversized buffers is expensive on small hosts."""
    return os.path.getsize(path) // 8 + 16


def parse_table(path: str, ncols: int,
                max_rows: Optional[int] = None) -> np.ndarray:
    """Parse a '#'-commented numeric table -> [rows, ncols].  Numpy
    fallback when the native library is unavailable."""
    lib = _load()
    if lib is None:
        data = np.loadtxt(path)
        if data.ndim == 1:
            # an empty/comment-only file gives shape (0,): promote to
            # (0, ncols) so callers' "no parseable rows" checks fire
            # instead of an opaque IndexError downstream
            data = data[None, :] if data.size else data.reshape(0, ncols)
        return np.ascontiguousarray(data[:, :ncols])
    if max_rows is None:
        max_rows = _rows_upper_bound(path) // ncols
    max_rows = max(max_rows, 1)
    while True:
        out = np.empty((max_rows, ncols), dtype=np.float64)
        rows = lib.parse_table(path.encode(), ncols, out, max_rows)
        if rows == -2:      # buffer filled with data left over: retry bigger
            max_rows *= 2
            continue
        if rows == -3:
            raise ValueError(
                f"{path}: a numeric row has fewer than {ncols} columns "
                "(wrong-format or corrupt table — e.g. a classic 7-column "
                "transfer file read with modern=True)")
        if rows < 0:
            raise IOError(f"native parse failed for {path}")
        return out[:rows].copy()


def parse_stack(paths: Sequence[str], ncols: int,
                max_rows: Optional[int] = None) -> List[np.ndarray]:
    """Parse many identically-formatted tables (OpenMP-parallel in the
    native path)."""
    lib = _load()
    if lib is None:
        return [parse_table(p, ncols, max_rows) for p in paths]
    if max_rows is None:
        max_rows = max(_rows_upper_bound(p) for p in paths) // ncols
    n = len(paths)
    out = np.empty((n, max_rows, ncols), dtype=np.float64)
    rows = np.empty(n, dtype=np.int64)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.parse_stack(arr, n, ncols, out, max_rows, rows)
    result = []
    for i, p in enumerate(paths):
        if rows[i] == -2:   # truncated: re-parse this file with a grown buffer
            result.append(parse_table(p, ncols, max_rows * 2))
        elif rows[i] < 0:
            raise (ValueError(
                f"{p}: a numeric row has fewer than {ncols} columns "
                "(wrong-format or corrupt table)") if rows[i] == -3 else
                IOError(f"native parse failed for {p}"))
        else:
            result.append(out[i, :rows[i]].copy())
    return result


def format_rows(block: np.ndarray, width: int, prec: int) -> Optional[str]:
    """Format a [nr, nc] f64 block as the reference's output rows — every
    value %.{prec}g right-justified to `width`, one line per row
    (redTime.cc:64 setprecision/setw contract).  Byte-identical to the
    Python fallback in io/writer.py (both printf %g and Python :g are
    correctly-rounded).  Returns None when the native library (or the
    symbol, for a stale build) is unavailable.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "format_rows"):
        return None
    a = np.ascontiguousarray(block, dtype=np.float64)
    if a.ndim != 2:
        raise ValueError(f"format_rows expects a 2-D block, got {a.shape}")
    nr, nc = a.shape
    # %.12g is at most 19 chars; width+8 is a comfortable per-value bound
    cap = nr * (nc * (width + 8) + 2) + 64
    buf = ctypes.create_string_buffer(cap)
    n = lib.format_rows(a, nr, nc, width, prec, buf, cap)
    if n < 0:
        return None
    return buf.raw[:n].decode("ascii")
