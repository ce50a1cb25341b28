"""ctypes binding for the native fast-path library (native/).

Lazily builds ``librasr_native.so`` with the repo Makefile on first use
if a toolchain is available; all callers fall back to pure python when
the library can't be built or loaded.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, List, Optional, Tuple

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "librasr_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def load_native() -> Optional[ctypes.CDLL]:
    """The native library, building it on demand; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.rasr_arpa_to_lmbin.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
            lib.rasr_arpa_to_lmbin.restype = ctypes.c_int
            lib.rasr_last_error.restype = ctypes.c_char_p
            lib.rasr_rtar_scan.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_long,
            ]
            lib.rasr_rtar_scan.restype = ctypes.c_long
            lib.rasr_rtar_read.argtypes = [
                ctypes.c_char_p, ctypes.c_uint64, ctypes.c_int,
                ctypes.c_uint64, ctypes.c_uint64, ctypes.c_char_p,
            ]
            lib.rasr_rtar_read.restype = ctypes.c_int
            lib.rasr_rtar_last_error.restype = ctypes.c_char_p
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def arpa_to_lmbin(arpa_path: str, out_path: str) -> bool:
    """Parse ARPA -> .lmbin with the native parser. False if unavailable."""
    lib = load_native()
    if lib is None:
        return False
    rc = lib.rasr_arpa_to_lmbin(arpa_path.encode(), out_path.encode())
    if rc != 0:
        raise IOError(
            f"native ARPA parse failed ({rc}): {lib.rasr_last_error().decode()}"
        )
    return True


def rtar_scan(path: str) -> Optional[Dict[str, Tuple[int, int, int, int]]]:
    """Native archive index scan -> {name: (offset, flags, raw, comp)}.
    None if the native library is unavailable."""
    lib = load_native()
    if lib is None:
        return None
    need = lib.rasr_rtar_scan(path.encode(), None, 0)
    if need < 0:
        raise IOError(lib.rasr_rtar_last_error().decode())
    buf = ctypes.create_string_buffer(int(need))
    lib.rasr_rtar_scan(path.encode(), buf, need)
    index: Dict[str, Tuple[int, int, int, int]] = {}
    for line in buf.raw[:need].decode().splitlines():
        name, offset, flags, raw, comp = line.split("\t")
        index[name] = (int(offset), int(flags), int(raw), int(comp))
    return index


def rtar_read(path: str, offset: int, flags: int, raw_len: int, comp_len: int) -> Optional[bytes]:
    lib = load_native()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(raw_len)
    rc = lib.rasr_rtar_read(
        path.encode(), offset, flags, raw_len, comp_len, out
    )
    if rc != 0:
        raise IOError(lib.rasr_rtar_last_error().decode())
    return out.raw
