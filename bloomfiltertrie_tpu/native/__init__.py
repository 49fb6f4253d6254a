"""ctypes loader for the native parser (builds on first use, caches the .so).

Falls back cleanly to the NumPy codecs in ops/codec.py when no C++ toolchain
is available; callers use :func:`available` to pick the path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "parser.cpp")
_SO = os.path.join(_DIR, "libbftparser.so")

_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
    lib.bft_parse_kmer_lines.restype = ctypes.c_int64
    lib.bft_parse_kmer_lines.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int, u32p, u8p, ctypes.c_int64]
    lib.bft_kmerize_sequence.restype = ctypes.c_int64
    lib.bft_kmerize_sequence.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int, u32p, u8p, ctypes.c_int64]
    lib.bft_fasta_extract.restype = ctypes.c_int64
    lib.bft_fasta_extract.argtypes = [
        u8p, ctypes.c_int64, u8p, ctypes.c_int64, i64p, ctypes.c_int64]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def parse_kmer_lines(data: bytes, k: int):
    """ASCII k-mer file bytes -> (packed uint32 [N, W], valid bool [N])."""
    lib = _load()
    assert lib is not None
    from bloomfiltertrie_tpu.config import words_for_k
    w = words_for_k(k)
    buf = np.frombuffer(data, dtype=np.uint8)
    max_n = data.count(b"\n") + 1
    out = np.empty((max_n, w), dtype=np.uint32)
    valid = np.empty((max_n,), dtype=np.uint8)
    n = lib.bft_parse_kmer_lines(buf, buf.size, k, out, valid, max_n)
    return out[:n], valid[:n].astype(bool)


def kmerize_sequence(seq: bytes | np.ndarray, k: int):
    """Sequence bytes -> (packed windows [L-k+1, W], valid bool)."""
    lib = _load()
    assert lib is not None
    from bloomfiltertrie_tpu.config import words_for_k
    w = words_for_k(k)
    buf = (np.frombuffer(seq, dtype=np.uint8)
           if isinstance(seq, (bytes, bytearray)) else np.ascontiguousarray(seq))
    n_rows = max(buf.size - k + 1, 0)
    out = np.empty((n_rows, w), dtype=np.uint32)
    valid = np.empty((n_rows,), dtype=np.uint8)
    n = lib.bft_kmerize_sequence(buf, buf.size, k, out, valid, n_rows)
    assert n == n_rows
    return out, valid.astype(bool)


def fasta_sequences(data: bytes) -> list[np.ndarray]:
    """FASTA bytes -> list of raw base arrays (uint8), one per record."""
    lib = _load()
    assert lib is not None
    buf = np.frombuffer(data, dtype=np.uint8)
    out_seq = np.empty(buf.size, dtype=np.uint8)
    max_seqs = data.count(b">") + 2
    offsets = np.zeros((max_seqs + 1,), dtype=np.int64)
    n = lib.bft_fasta_extract(buf, buf.size, out_seq, out_seq.size,
                              offsets, max_seqs)
    if n < 0:
        raise ValueError("fasta buffer overflow")
    return [out_seq[offsets[i]: offsets[i + 1]].copy() for i in range(n)]
