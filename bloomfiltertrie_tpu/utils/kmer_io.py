"""k-mer file readers/writers — byte-compatible with the reference formats.

Two on-disk formats (reference README.md:171-174):
  * ``kmers``: ASCII, one k-mer per line, optionally followed by junk (the
    parser reads only the first k chars — src/fasta.c:3-53); IUPAC k-mers are
    skipped on insert / all-zero on query.
  * ``kmers_comp``: two ASCII header lines ``k\\n`` and ``nb_kmers\\n``, then
    nb_kmers records of ceil(2k/8) bytes, 2-bit packed **LSB-first within each
    byte** (A=00 C=01 G=10 T=11; base j in byte j//4 at bit 2*(j%4) — the
    MASK_INSERT layout of src/fasta.c:3 / kmer_comp_to_ascii src/fasta.c:55).

The on-disk LSB-first byte layout differs from the engine's internal
order-preserving word packing (ops/codec.py); conversion happens here.
"""

from __future__ import annotations

import numpy as np

from bloomfiltertrie_tpu.ops import codec


def disk_bytes_per_kmer(k: int) -> int:
    return (2 * k + 7) // 8


def codes_to_disk(codes: np.ndarray, k: int) -> np.ndarray:
    """2-bit codes [N, k] -> reference disk bytes [N, ceil(2k/8)] (LSB-first)."""
    n = codes.shape[0]
    nbytes = disk_bytes_per_kmer(k)
    padded = np.zeros((n, nbytes * 4), dtype=np.uint8)
    padded[:, :k] = codes
    shifts = (2 * np.arange(4, dtype=np.uint8))[None, None, :]
    return (padded.reshape(n, nbytes, 4).astype(np.uint16) << shifts).sum(
        axis=2).astype(np.uint8)


def disk_to_codes(raw: np.ndarray, k: int) -> np.ndarray:
    """Reference disk bytes [N, ceil(2k/8)] -> 2-bit codes [N, k]."""
    n, nbytes = raw.shape
    shifts = (2 * np.arange(4, dtype=np.uint8))[None, None, :]
    codes = (raw[:, :, None] >> shifts) & 3
    return codes.reshape(n, nbytes * 4)[:, :k].astype(np.uint8)


def read_kmer_file_ascii(path: str, k: int):
    """ASCII k-mer file -> (packed uint32 [N, W], valid bool [N]).

    Lines shorter than k are dropped (the reference's parse returns 0 and the
    k-mer is not counted); IUPAC lines become invalid rows.  Uses the native
    C++ parser when available (bloomfiltertrie_tpu/native), NumPy otherwise.
    """
    with open(path, "rb") as f:
        data = f.read()
    from bloomfiltertrie_tpu import native
    if native.available():
        return native.parse_kmer_lines(data, k)
    rows = []
    for line in data.split(b"\n"):
        line = line.rstrip(b"\r")
        if len(line) >= k:
            rows.append(line[:k])
    if not rows:
        w = codec.words_for_k(k)
        return np.zeros((0, w), dtype=np.uint32), np.zeros((0,), dtype=bool)
    arr = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(len(rows), k)
    return codec.encode_kmers(arr, k)


def read_fasta_file(path: str, k: int):
    """FASTA file -> (packed k-mer windows [N, W], valid bool [N]).

    The reference's FASTx ingest path exists but is commented out
    (``insert_Genomes_from_FASTxFiles`` src/file_io.c:277-318, with a
    (k-1)-char carry so windows never cross chunk boundaries); this provides
    the same capability: every record is k-merized independently.
    """
    with open(path, "rb") as f:
        data = f.read()
    from bloomfiltertrie_tpu import native
    if native.available():
        seqs = native.fasta_sequences(data)
        parts = [native.kmerize_sequence(s, k) for s in seqs if s.size >= k]
    else:
        seqs = []
        cur = []
        for line in data.split(b"\n"):
            line = line.strip()
            if line.startswith(b">"):
                if cur:
                    seqs.append(b"".join(cur))
                    cur = []
            elif line:
                cur.append(line)
        if cur:
            seqs.append(b"".join(cur))
        parts = [codec.kmerize_sequence(s, k) for s in seqs if len(s) >= k]
    w = codec.words_for_k(k)
    if not parts:
        return np.zeros((0, w), dtype=np.uint32), np.zeros((0,), dtype=bool)
    packed = np.concatenate([p for p, _ in parts])
    valid = np.concatenate([v for _, v in parts])
    return packed, valid


def read_kmer_file_comp(path: str, expected_k: int | None = None):
    """Compressed k-mer file -> (packed uint32 [N, W], valid bool [N])."""
    with open(path, "rb") as f:
        k = int(f.readline())
        nb = int(f.readline())
        if expected_k is not None and k != expected_k:
            raise ValueError(f"{path}: k={k} but index k={expected_k}")
        raw = np.frombuffer(f.read(nb * disk_bytes_per_kmer(k)), dtype=np.uint8)
    raw = raw.reshape(nb, disk_bytes_per_kmer(k))
    packed = codec.pack_codes(disk_to_codes(raw, k), k)
    return packed, np.ones((nb,), dtype=bool)


def read_kmer_file(path: str, k: int, compressed: bool):
    if compressed:
        return read_kmer_file_comp(path, k)
    return read_kmer_file_ascii(path, k)


def write_kmer_file_ascii(path: str, packed: np.ndarray, k: int):
    """One ASCII k-mer + newline per line (reference extract format,
    src/bft.c:287,298-307)."""
    with open(path, "wb") as f:
        if packed.shape[0]:
            chars = codec.decode_kmers(packed, k)
            out = np.empty((chars.shape[0], k + 1), dtype=np.uint8)
            out[:, :k] = chars
            out[:, k] = ord("\n")
            f.write(out.tobytes())


def write_kmer_file_comp(path: str, packed: np.ndarray, k: int):
    """Compressed extract format: ``k\\n``, ``nb_kmers\\n``, packed bytes
    (src/bft.c:271-286)."""
    with open(path, "wb") as f:
        f.write(f"{k}\n".encode())
        f.write(f"{packed.shape[0]}\n".encode())
        if packed.shape[0]:
            f.write(codes_to_disk(codec.unpack_words(packed, k), k).tobytes())
