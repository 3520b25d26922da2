"""ctypes bindings for the native C++ packer (native/packer.cpp).

Builds the shared library on demand (make -C native); falls back to the numpy
path in ops.packing when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from ..utils import dna

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libpacker.so")
_lock = threading.Lock()
_lib = None


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.isfile(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.pack_ascii.restype = ctypes.c_int64
        lib.pack_ascii.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_uint8, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ]
        lib.pack_da.restype = ctypes.c_int64
        lib.pack_da.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        _lib = lib
        return lib


def pack_bytes(data: np.ndarray, term: int = dna.DEFAULT_TERM,
               n_threads: int = 0, check_cap: bool = True):
    """Pack raw ASCII bytes; returns a PackedBwt. Raises ValueError with the
    reference's message on forbidden characters (dna_string.hpp:90-96).
    check_cap=False skips the single-run coordinate-space cap (range
    packing of a larger sharded input)."""
    from . import packing

    lib = _load()
    if data.dtype != np.uint8 or not data.flags.c_contiguous:
        data = np.ascontiguousarray(data, dtype=np.uint8)
    n = int(data.shape[0])
    if check_cap and n >= packing.CAP:
        raise ValueError(packing.CAP_MESSAGE)
    n_blocks = n // 128 + 1
    blocks = np.zeros((n_blocks, 16), dtype=np.uint32)
    block_counts = np.zeros((n_blocks, 4), dtype=np.int32)
    totals = np.zeros(5, dtype=np.int64)
    if n_threads <= 0:
        n_threads = min(os.cpu_count() or 1, 8)
    rc = lib.pack_ascii(
        data.ctypes.data, n, term, blocks.ctypes.data,
        block_counts.ctypes.data, totals.ctypes.data, n_threads,
    )
    if rc != 0:
        ch = int(data[rc - 1])
        raise ValueError(
            f"Error while reading file: read forbidden character "
            f"'{chr(ch)}' (ASCII code {ch}). Only A,C,G,T, and {chr(term)} "
            f"are admitted in the input BWT! If the unknown character is the "
            f'terminator, you can solve the problem by adding option '
            f'"-t {ch}".'
        )
    F = np.empty(4, dtype=np.int64)
    F[0] = totals[4]
    F[1] = F[0] + totals[0]
    F[2] = F[1] + totals[1]
    F[3] = F[2] + totals[2]
    return packing.PackedBwt(
        blocks=blocks, block_counts=block_counts, F=F, counts=totals, n=n,
        term=term,
    )


def pack_file(path: str, term: int = dna.DEFAULT_TERM):
    # memmap, not fromfile: the multithreaded packer streams the pages in
    # and the raw ASCII never needs a second in-RAM copy (matters at the
    # multi-GB scale of BASELINE config 5)
    data = np.memmap(path, dtype=np.uint8, mode="r")
    return pack_bytes(data, term)


def pack_da_file(path: str, n: int):
    """Returns (bits uint8 (n,), words (n_blocks*4,) uint32 flat — the
    ops.bits.bv_build layout — and counts int32 (n_blocks,))."""
    lib = _load()
    data = np.fromfile(path, dtype=np.uint8, count=n)
    n_blocks = n // 128 + 1
    words = np.zeros((n_blocks, 4), dtype=np.uint32)
    counts = np.zeros(n_blocks, dtype=np.int32)
    bits = np.zeros(n, dtype=np.uint8)
    lib.pack_da(data.ctypes.data, n, words.ctypes.data, counts.ctypes.data,
                bits.ctypes.data)
    return bits, words.reshape(-1), counts
