"""2-bit nucleotide codec: ASCII <-> packed uint32 word tensors (host side).

Reference parity: ``src/fasta.c`` (``parseKmerCount`` fasta.c:3,
``kmer_comp_to_ascii`` fasta.c:55, ``parseSequenceBuffer`` fasta.c:108).
The reference packs A=00, C=01, G=10, T=11 LSB-first within each byte; we keep
the same base alphabet/order but pack **big-endian within each 32-bit word**
(base j of a k-mer sits in word j//16 at bit 30-2*(j%16)).  With that layout a
lexicographic compare of the word tuple equals the lexicographic compare of
the ASCII k-mer, so sorted tables, prefix ranges and canonical selection all
reduce to plain unsigned integer comparisons — the property every batched TPU
kernel in this engine relies on.  Only *sets* of k-mers are ever compared with
the reference (SURVEY §3: extraction order is layout-dependent), so the
internal bit layout is free.

Everything here is NumPy (host): parsing is IO-side work feeding the device
pipeline.  A native C++ fast path lives in ``bloomfiltertrie_tpu/native``.
"""

from __future__ import annotations

import numpy as np

from bloomfiltertrie_tpu.config import words_for_k

# ASCII -> 2-bit code; 255 = invalid (the reference rejects any IUPAC k-mer:
# src/fasta.c:3-53 returns 0 for non-ACGT and the row becomes all-zero).
_LUT = np.full(256, 255, dtype=np.uint8)
for i, b in enumerate(b"ACGT"):
    _LUT[b] = i
    _LUT[b + 32] = i  # lowercase

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)

# IUPAC degenerate codes (valid FASTA characters that are not concrete bases).
_IUPAC = np.zeros(256, dtype=bool)
for b in b"RYSWKMBDHVNryswkmbdhvn":
    _IUPAC[b] = True


def ascii_to_codes(buf: np.ndarray) -> np.ndarray:
    """Map ASCII bytes to 2-bit codes (255 where not a concrete base)."""
    return _LUT[buf]


def pack_codes(codes: np.ndarray, k: int) -> np.ndarray:
    """Pack 2-bit codes [N, k] (uint8, values 0..3) into uint32 [N, W].

    Invalid codes must be masked out by the caller; values >= 4 here would
    corrupt neighbouring bases.
    """
    n = codes.shape[0]
    w = words_for_k(k)
    padded = np.zeros((n, w * 16), dtype=np.uint32)
    padded[:, :k] = codes
    shifts = (30 - 2 * np.arange(16, dtype=np.uint32))[None, None, :]
    return (padded.reshape(n, w, 16) << shifts).sum(axis=2, dtype=np.uint32)


def unpack_words(words: np.ndarray, k: int) -> np.ndarray:
    """Inverse of :func:`pack_codes`: uint32 [N, W] -> codes uint8 [N, k]."""
    n, w = words.shape
    shifts = (30 - 2 * np.arange(16, dtype=np.uint32))[None, None, :]
    codes = (words[:, :, None] >> shifts) & 3
    return codes.reshape(n, w * 16)[:, :k].astype(np.uint8)


def encode_kmers(kmers: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """ASCII k-mers [N, k] (uint8) -> (packed uint32 [N, W], valid bool [N]).

    Mirrors ``parseKmerCount`` (src/fasta.c:3): any non-ACGT character makes
    the k-mer invalid; its packed row is zeroed.
    """
    codes = ascii_to_codes(np.ascontiguousarray(kmers))
    valid = (codes < 4).all(axis=1)
    codes = np.where(valid[:, None], codes, 0).astype(np.uint8)
    return pack_codes(codes, k), valid


def decode_kmers(words: np.ndarray, k: int) -> np.ndarray:
    """Packed uint32 [N, W] -> ASCII k-mers uint8 [N, k]."""
    return _BASES[unpack_words(words, k)]


def encode_strings(kmers: list[str] | list[bytes], k: int):
    """Convenience: python strings -> (packed, valid)."""
    arr = np.zeros((len(kmers), k), dtype=np.uint8)
    for i, s in enumerate(kmers):
        b = s.encode() if isinstance(s, str) else s
        if len(b) < k:
            raise ValueError(f"k-mer {i} shorter than k={k}")
        arr[i] = np.frombuffer(b[:k], dtype=np.uint8)
    return encode_kmers(arr, k)


def decode_strings(words: np.ndarray, k: int) -> list[str]:
    return [row.tobytes().decode() for row in decode_kmers(words, k)]


def revcomp_codes(codes: np.ndarray) -> np.ndarray:
    """Reverse complement on 2-bit codes [..., k] (invalid 255 preserved)."""
    comp = np.where(codes < 4, 3 - codes, codes).astype(np.uint8)
    return comp[..., ::-1]


def revcomp_packed(words: np.ndarray, k: int) -> np.ndarray:
    """Reverse complement of packed k-mers (host path, via unpack/repack)."""
    return pack_codes(revcomp_codes(unpack_words(words, k)), k)


def canonical_packed(words: np.ndarray, k: int) -> np.ndarray:
    """Lexicographically smaller of (k-mer, revcomp).

    Reference: ``query_sequence`` picks revcomp when
    ``strcmp(kmer, revcomp) >= 0`` (src/bft.c:1287-1293) — i.e. the minimum.
    Thanks to the order-preserving packing this is a word-tuple min.
    """
    rc = revcomp_packed(words, k)
    return np.where(lex_less(words, rc)[:, None], words, rc)


def lex_less(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Lexicographic a < b over trailing word axis (uint32)."""
    lt = np.zeros(a.shape[:-1], dtype=bool)
    eq = np.ones(a.shape[:-1], dtype=bool)
    for w in range(a.shape[-1]):
        aw, bw = a[..., w], b[..., w]
        lt |= eq & (aw < bw)
        eq &= aw == bw
    return lt


def kmerize_sequence(seq: bytes | np.ndarray, k: int):
    """All k-mer windows of a sequence -> (packed uint32 [L-k+1, W], valid).

    Windows containing a non-ACGT character are invalid (packed row zeroed),
    matching the reference's sliding-window parser (``parseSequenceBuffer``
    src/fasta.c:108) and the all-zero CSV rows for IUPAC queries
    (src/file_io.c:777-800).
    """
    buf = np.frombuffer(seq, dtype=np.uint8) if isinstance(seq, (bytes, bytearray)) else seq
    codes = ascii_to_codes(buf)
    n = len(codes) - k + 1
    if n <= 0:
        return (np.zeros((0, words_for_k(k)), dtype=np.uint32),
                np.zeros((0,), dtype=bool))
    win = np.lib.stride_tricks.sliding_window_view(codes, k)
    valid = (win < 4).all(axis=1)
    packed = pack_codes(np.where(valid[:, None], win, 0).astype(np.uint8), k)
    return packed, valid


def has_iupac(seq: bytes) -> bool:
    """True if the sequence contains a degenerate IUPAC code.

    Reference: ``is_substring_IUPAC`` (include/fasta.h) — such query rows are
    emitted all-zero rather than an error.
    """
    return bool(_IUPAC[np.frombuffer(seq, dtype=np.uint8)].any())
