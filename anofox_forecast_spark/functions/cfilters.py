"""Compile-on-demand ctypes loader for the C optimizer loops.

``_cfilters.c`` holds C twins of the Python objective recursions in
``models.py`` (see the bit-identity contract in its header).  This module
compiles it once per machine into a content-addressed cache
(``~/.cache/anofox_cfilters/<sha256>/``) with strict-IEEE flags and loads
it via ctypes.  Everything degrades gracefully: no gcc, a failed compile,
or ``ANOFOX_NO_CFILTERS=1`` simply returns ``None`` and the callers keep
their pure-Python closures — worst case is the status quo.

Concurrency: many Spark Python workers may import this at once on a fresh
machine.  Each compiles to a private temp file and atomically
``os.replace``s it into place — idempotent, no locks, last writer wins
with identical bytes.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile

_C_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "_cfilters.c")
# no -march=native: baseline x86-64 SSE2 has no FMA, and together with
# -ffp-contract=off -fno-fast-math the codegen cannot reassociate or
# contract a single FP operation (the bit-identity contract)
_CFLAGS = ["-O2", "-fPIC", "-shared", "-fno-fast-math", "-ffp-contract=off"]

_lib = None
_tried = False

_SIGS = {
    "ses_filter": ([ctypes.POINTER(ctypes.c_double), ctypes.c_long,
                    ctypes.c_double, ctypes.c_double,
                    ctypes.POINTER(ctypes.c_double)], ctypes.c_double),
    "ses_sse": ([ctypes.POINTER(ctypes.c_double), ctypes.c_long,
                 ctypes.c_double], ctypes.c_double),
    "holt_sse": ([ctypes.POINTER(ctypes.c_double), ctypes.c_long,
                  ctypes.c_double, ctypes.c_double, ctypes.c_double],
                 ctypes.c_double),
    "hw_sse": ([ctypes.POINTER(ctypes.c_double), ctypes.c_long,
                ctypes.c_long, ctypes.c_int, ctypes.c_double,
                ctypes.c_double, ctypes.c_double, ctypes.c_double,
                ctypes.c_double, ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double)], ctypes.c_double),
    "ets_mult_neg2ll": ([ctypes.POINTER(ctypes.c_double), ctypes.c_long,
                         ctypes.c_long, ctypes.c_int, ctypes.c_int,
                         ctypes.c_double, ctypes.c_double, ctypes.c_double,
                         ctypes.c_double, ctypes.c_double, ctypes.c_double,
                         ctypes.POINTER(ctypes.c_double),
                         ctypes.POINTER(ctypes.c_double)], ctypes.c_double),
    "theta_sse": ([ctypes.POINTER(ctypes.c_double), ctypes.c_long,
                   ctypes.c_double, ctypes.c_double, ctypes.c_double,
                   ctypes.c_double], ctypes.c_double),
    "seasonal_es_sse": ([ctypes.POINTER(ctypes.c_double), ctypes.c_long,
                         ctypes.c_long, ctypes.c_double,
                         ctypes.POINTER(ctypes.c_double)], ctypes.c_double),
    "arima_css_sse": ([ctypes.POINTER(ctypes.c_double), ctypes.c_long,
                       ctypes.c_long, ctypes.c_long,
                       ctypes.POINTER(ctypes.c_double),
                       ctypes.POINTER(ctypes.c_double),
                       ctypes.POINTER(ctypes.c_double)], ctypes.c_double),
    # whole-optimizer drivers (Nelder-Mead / golden-section run in C)
    "nm_holt": ([ctypes.POINTER(ctypes.c_double), ctypes.c_long,
                 ctypes.c_double, ctypes.POINTER(ctypes.c_double)], None),
    "nm_hw": ([ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_long,
               ctypes.c_int, ctypes.c_double, ctypes.c_double,
               ctypes.POINTER(ctypes.c_double),
               ctypes.POINTER(ctypes.c_double),
               ctypes.POINTER(ctypes.c_double)], None),
    "nm_ets": ([ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_long,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double,
                ctypes.c_double, ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double)], ctypes.c_long),
    "nm_arima": ([ctypes.POINTER(ctypes.c_double), ctypes.c_long,
                  ctypes.c_long, ctypes.c_long,
                  ctypes.POINTER(ctypes.c_double),
                  ctypes.POINTER(ctypes.c_double), ctypes.c_long,
                  ctypes.POINTER(ctypes.c_double)], None),
    "nm_theta": ([ctypes.POINTER(ctypes.c_double), ctypes.c_long,
                  ctypes.c_double, ctypes.c_double,
                  ctypes.POINTER(ctypes.c_double)], None),
    "golden_ses": ([ctypes.POINTER(ctypes.c_double), ctypes.c_long],
                   ctypes.c_double),
    "golden_seasonal_es": ([ctypes.POINTER(ctypes.c_double), ctypes.c_long,
                            ctypes.c_long, ctypes.POINTER(ctypes.c_double)],
                           ctypes.c_double),
    "golden_theta": ([ctypes.POINTER(ctypes.c_double), ctypes.c_long,
                      ctypes.c_double, ctypes.c_double, ctypes.c_double],
                     ctypes.c_double),
    "golden_croston": ([ctypes.POINTER(ctypes.c_double), ctypes.c_long,
                        ctypes.POINTER(ctypes.c_double), ctypes.c_long],
                       ctypes.c_double),
    # final (post-optimization) filter passes
    "log_abs_sum": ([ctypes.POINTER(ctypes.c_double), ctypes.c_long],
                    ctypes.c_double),
    "holt_filt": ([ctypes.POINTER(ctypes.c_double), ctypes.c_long,
                   ctypes.c_double, ctypes.c_double, ctypes.c_double,
                   ctypes.POINTER(ctypes.c_double),
                   ctypes.POINTER(ctypes.c_double)], None),
    "hw_filt": ([ctypes.POINTER(ctypes.c_double), ctypes.c_long,
                 ctypes.c_long, ctypes.c_int, ctypes.c_double,
                 ctypes.c_double, ctypes.c_double, ctypes.c_double,
                 ctypes.c_double, ctypes.POINTER(ctypes.c_double),
                 ctypes.POINTER(ctypes.c_double),
                 ctypes.POINTER(ctypes.c_double),
                 ctypes.POINTER(ctypes.c_double)], None),
    "ets_mult_filt": ([ctypes.POINTER(ctypes.c_double), ctypes.c_long,
                       ctypes.c_long, ctypes.c_int, ctypes.c_int,
                       ctypes.c_double, ctypes.c_double, ctypes.c_double,
                       ctypes.c_double, ctypes.c_double, ctypes.c_double,
                       ctypes.POINTER(ctypes.c_double),
                       ctypes.POINTER(ctypes.c_double),
                       ctypes.POINTER(ctypes.c_double),
                       ctypes.POINTER(ctypes.c_double),
                       ctypes.POINTER(ctypes.c_double)], ctypes.c_long),
    "seasonal_es_filt": ([ctypes.POINTER(ctypes.c_double), ctypes.c_long,
                          ctypes.c_long, ctypes.c_double,
                          ctypes.POINTER(ctypes.c_double),
                          ctypes.POINTER(ctypes.c_double)], None),
}


def _build_path(src_bytes: bytes) -> str:
    sha = hashlib.sha256(
        src_bytes + b"\x00" + " ".join(_CFLAGS).encode()).hexdigest()[:24]
    root = os.environ.get("XDG_CACHE_HOME",
                          os.path.join(os.path.expanduser("~"), ".cache"))
    return os.path.join(root, "anofox_cfilters", sha, "libcfilters.so")


def _compile(src_bytes: bytes, out_path: str) -> bool:
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(suffix=".so",
                               dir=os.path.dirname(out_path))
    os.close(fd)
    try:
        res = subprocess.run(
            ["gcc", *_CFLAGS, "-o", tmp, _C_SRC, "-lm"],
            capture_output=True, timeout=120)
        if res.returncode != 0:
            return False
        os.replace(tmp, out_path)  # atomic; idempotent across workers
        return True
    except Exception:  # noqa: BLE001 — any failure means "no C path"
        return False
    finally:
        if os.path.exists(tmp):
            try:
                os.unlink(tmp)
            except OSError:
                pass


def get_lib():
    """The loaded ctypes library, or ``None`` when unavailable."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("ANOFOX_NO_CFILTERS"):
        return None
    try:
        with open(_C_SRC, "rb") as fh:
            src = fh.read()
        path = _build_path(src)
        if not os.path.exists(path) and not _compile(src, path):
            return None
        lib = ctypes.CDLL(path)
        for name, (argtypes, restype) in _SIGS.items():
            fn = getattr(lib, name)
            fn.argtypes = argtypes
            fn.restype = restype
        _lib = lib
    except Exception:  # noqa: BLE001
        _lib = None
        print("anofox cfilters unavailable; using pure-Python loops",
              file=sys.stderr)
    return _lib
