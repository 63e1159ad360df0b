"""ctypes bindings for the native FASTA reader (native/fasta_reader.cpp).

Falls back transparently to the pure-Python parser when the shared
library has not been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native",
    "libfasta_reader.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        # attempt a one-shot build if a toolchain is available
        try:
            subprocess.run(["make", "-C", os.path.dirname(_LIB_PATH)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.fasta_read.restype = ctypes.c_void_p
    lib.fasta_read.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.fasta_total_len.restype = ctypes.c_int64
    lib.fasta_total_len.argtypes = [ctypes.c_void_p]
    lib.fasta_num_contigs.restype = ctypes.c_int64
    lib.fasta_num_contigs.argtypes = [ctypes.c_void_p]
    lib.fasta_copy_seq.restype = ctypes.c_int64
    lib.fasta_copy_seq.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                   ctypes.c_int64]
    lib.fasta_copy_starts.restype = ctypes.c_int64
    lib.fasta_copy_starts.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                      ctypes.c_int64]
    lib.fasta_contig_name.restype = ctypes.c_char_p
    lib.fasta_contig_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.fasta_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def read_genome_native(path, min_contig_len: int = 0
                       ) -> Optional[Tuple["np.ndarray", "np.ndarray",
                                           List[str]]]:
    """Read a FASTA file natively.

    Returns (seq_concat uint8 array, contig_starts int64 array incl.
    terminal total, contig names) or None if the library is unavailable
    or parsing failed.
    """
    import numpy as np

    lib = _load()
    if lib is None:
        return None
    h = lib.fasta_read(os.fsencode(os.fspath(path)), min_contig_len)
    if not h:
        return None
    try:
        total = lib.fasta_total_len(h)
        nc = lib.fasta_num_contigs(h)
        seq = np.empty(total, dtype=np.uint8)
        if total:
            lib.fasta_copy_seq(h, seq.ctypes.data_as(ctypes.c_void_p), total)
        starts = np.empty(nc + 1, dtype=np.int64)
        if nc:
            lib.fasta_copy_starts(h, starts.ctypes.data_as(ctypes.c_void_p), nc)
        starts[nc] = total
        names = [lib.fasta_contig_name(h, i).decode() for i in range(nc)]
        return seq, starts, names
    finally:
        lib.fasta_free(h)
