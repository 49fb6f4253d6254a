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


class FastxStream:
    """Chunked FASTA/FASTQ k-merizer with a (k-1)-base carry.

    The reference's (commented-out) FASTx path streams file chunks and keeps
    a (k-1)-char carry so k-mers spanning chunk boundaries are never lost
    (``insert_Genomes_from_FASTxFiles`` src/file_io.c:277-318; record
    parsing per ``kseq_read`` include/kseq.h:168, which handles FASTA *and*
    FASTQ).  This is the active equivalent: host memory stays O(chunk)
    regardless of record or file size, and each yielded batch is k-merized
    by the native rolling encoder (native/parser.cpp) or the NumPy codec.

    Format is auto-detected from the first record character: '>' FASTA,
    '@' FASTQ.  FASTQ quality lines are length-matched to the sequence (the
    kseq rule), so '@'/'>' bytes inside quality strings cannot be mistaken
    for headers.  Multi-line sequences are supported in both formats.
    """

    def __init__(self, path: str, k: int, chunk_bytes: int = 1 << 22,
                 threads: int = 1):
        self.path = path
        self.k = k
        self.chunk_bytes = chunk_bytes
        self.threads = threads

    def _kmerize(self, fragment: bytes):
        from bloomfiltertrie_tpu import native
        if native.available():
            return native.kmerize_sequence(fragment, self.k)
        return codec.kmerize_sequence(fragment, self.k)

    def batches(self):
        """Yield (packed uint32[N, W], valid bool[N]) per k-merized fragment.

        With ``threads > 1`` the 2-bit rolling encode — the dominant cost,
        run in the native parser which releases the GIL — fans out to a
        worker pool while the serial stage keeps producing carry-correct
        fragments; results yield strictly IN ORDER (a bounded deque of
        futures), so downstream consumers see exactly the single-thread
        stream.  This is the pod ingest math's requirement (~50 MB/s parse
        per host sustained while routing): one core parses ~57 MB/s, the
        pool scales it across cores (kseq.h:168 streams one record at a
        time; here record assembly stays serial and cheap, encoding
        parallelizes).
        """
        if self.threads <= 1:
            for frag in self._fragments():
                yield self._kmerize(frag)
            return
        import collections
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(self.threads) as ex:
            pend = collections.deque()
            for frag in self._fragments():
                pend.append(ex.submit(self._kmerize, frag))
                while len(pend) > 2 * self.threads:
                    yield pend.popleft().result()
            while pend:
                yield pend.popleft().result()

    def _fragments(self):
        """Yield raw sequence fragments (bytes, each >= k, carry-joined).

        Sequence lines accumulate in ``pending`` and are joined in bulk
        at record boundaries and chunk ends (one fragment per ~chunk, not
        per line — per-call overhead would otherwise dominate on 60-80
        char FASTA lines).
        """
        k = self.k
        fmt = None          # ">" or "@"
        state = "header"    # header | seq | qual
        carry = b""         # last k-1 bases of the current record
        pending: list[bytes] = []   # unk-merized seq lines of this record
        seq_len = 0         # FASTQ: bases seen in the current record
        qual_left = 0       # FASTQ: quality bytes still expected
        line_frag = b""     # partial trailing line of the previous chunk
        out = None

        def drain(end_of_record):
            """Join carry+pending; update carry; return the fragment or
            None (fragments shorter than k cannot yield a k-mer)."""
            nonlocal carry, pending
            if not pending:
                if end_of_record:
                    carry = b""
                return None
            fragment = carry + b"".join(pending)
            pending = []
            if end_of_record:
                carry = b""
            elif len(fragment) >= k:
                carry = fragment[-(k - 1):] if k > 1 else b""
            else:
                carry = fragment
                return None
            if len(fragment) >= k:
                return fragment
            return None

        with open(self.path, "rb") as f:
            while True:
                chunk = f.read(self.chunk_bytes)
                final = not chunk
                data = line_frag + chunk
                # Fast path: a FASTA chunk with no '>' anywhere is pure
                # sequence of the current record — strip newlines in one C
                # call instead of a Python line loop (long-genome chunks are
                # the throughput case; '>' can only start a line, and a
                # header line split across chunks still contains '>').
                if (fmt == b">" and state == "seq" and not final
                        and b">" not in data):
                    line_frag = b""
                    pending.append(data.translate(None, b"\r\n"))
                    out = drain(end_of_record=False)
                    if out is not None:
                        yield out
                    continue
                if final:
                    lines = data.split(b"\n") if data else []
                    line_frag = b""
                else:
                    lines = data.split(b"\n")
                    line_frag = lines.pop()  # may be incomplete
                for line in lines:
                    line = line.rstrip(b"\r")
                    if fmt is None:
                        if not line:
                            continue
                        if line[:1] in (b">", b"@"):
                            fmt = line[:1]
                        else:
                            raise ValueError(
                                f"{self.path}: not FASTA/FASTQ (first "
                                f"record byte {line[:1]!r})")
                    if state == "qual":
                        qual_left -= len(line)
                        if qual_left <= 0:
                            state = "header"
                        continue
                    if state in ("header", "seq") and line[:1] == fmt:
                        # new record header ('@' in quality is unreachable:
                        # state == "qual" consumed exact lengths above)
                        out = drain(end_of_record=True)
                        if out is not None:
                            yield out
                        seq_len = 0
                        state = "seq"
                        continue
                    if fmt == b"@" and line[:1] == b"+" and state == "seq":
                        out = drain(end_of_record=True)
                        if out is not None:
                            yield out
                        qual_left = seq_len
                        state = "qual" if qual_left > 0 else "header"
                        continue
                    if state == "seq" and line:
                        seq_len += len(line)
                        pending.append(line)
                out = drain(end_of_record=False)   # chunk boundary
                if out is not None:
                    yield out
                if final:
                    break

    def read_all(self):
        """Materialize the whole stream: (packed [N, W], valid bool [N])."""
        w = codec.words_for_k(self.k)
        parts = list(self.batches())
        if not parts:
            return (np.zeros((0, w), dtype=np.uint32),
                    np.zeros((0,), dtype=bool))
        return (np.concatenate([p for p, _ in parts]),
                np.concatenate([v for _, v in parts]))


def read_fastx_file(path: str, k: int, chunk_bytes: int = 1 << 22,
                    threads: int = 1):
    """FASTA or FASTQ file -> (packed k-mer windows [N, W], valid bool [N]).

    Auto-detects the format; parses in O(chunk_bytes) memory with a
    (k-1)-base carry (see :class:`FastxStream`).  ``threads > 1``
    parallelizes the 2-bit encoding across cores.
    """
    return FastxStream(path, k, chunk_bytes, threads=threads).read_all()


# Backward-compatible alias (now FASTQ-capable and streaming).
read_fasta_file = read_fastx_file


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
