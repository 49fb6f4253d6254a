"""Build and query drivers — reference ``src/file_io.c`` equivalents.

These reproduce the reference CLI's observable file outputs byte-for-byte:

  * query CSV (``queryBFT_kmerPresences_from_KmerFiles`` file_io.c:651 and
    ``query_sequences_outputCSV`` file_io.c:1464): header = genome names
    comma-joined + ``\\n``; one ``0``/``1`` row per query, comma-joined +
    ``\\n``; then the file's final ``\\n`` is overwritten with ``\\0``
    (file_io.c:874-876 seeks back one char).
  * genome name = basename of the input path (file_io.c:124-125).
  * build prints per-file timing + peak RSS like the reference
    (file_io.c:195-206).
"""

from __future__ import annotations

import os
import resource
import time

import numpy as np

from bloomfiltertrie_tpu.models.cdbg import ColoredDBG
from bloomfiltertrie_tpu.ops import codec
from bloomfiltertrie_tpu.utils import kmer_io

PRINT_EVERY_X_KMERS = 1_000_000  # reference include/default_param.h:46


def insert_genomes_from_kmer_files(dbg: ColoredDBG, paths: list[str],
                                   compressed: bool, verbose: bool = True):
    """Reference ``insert_Genomes_from_KmerFiles`` (file_io.c:89)."""
    t_start = time.monotonic()
    for path in paths:
        t0 = time.monotonic()
        packed, valid = kmer_io.read_kmer_file(path, dbg.k, compressed)
        dbg.insert_genome(os.path.basename(path), packed, valid)
        if verbose:
            t1 = time.monotonic()
            peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
            print(f"\nFile {dbg.nb_genomes - 1}: {path}\n")
            print(f"{packed.shape[0]} kmers read")
            print(f"Elapsed time: {t1 - t0:.6f} s")
            print(f"Total time: {t1 - t_start:.6f} s")
            print(f"Peak of memory: {peak // 1024} mb")
            print(f"Current memory: {dbg.memory_stats()['bytes_total'] // 2**20} mb")


def insert_genomes_from_fasta_files(dbg: ColoredDBG, paths: list[str],
                                    verbose: bool = True,
                                    parser_threads: int = 1):
    """FASTA/FASTQ genome ingest (one genome per file), streamed.

    The reference's FASTx path is present but commented out
    (``insert_Genomes_from_FASTxFiles`` src/file_io.c:277-318, FASTA+FASTQ
    via ``kseq_read`` include/kseq.h:168); this is the active equivalent:
    file chunks are k-merized with a (k-1)-base carry (kmer_io.FastxStream
    — host memory O(chunk), never the whole file), non-ACGT windows are
    skipped (the IUPAC-reject rule, src/fasta.c:3-53), and batches flow
    straight into the buffered insert path.  Uses the native C++ parser
    when built (bloomfiltertrie_tpu/native/parser.cpp);
    ``parser_threads > 1`` fans the 2-bit encode across cores (the pod
    ingest math needs ~50 MB/s sustained parse per host).
    """
    t_start = time.monotonic()
    for path in paths:
        t0 = time.monotonic()
        dbg.start_genome(os.path.basename(path))
        n_kmers = 0
        stream = kmer_io.FastxStream(path, dbg.k, threads=parser_threads)
        for packed, valid in stream.batches():
            dbg.insert_kmers_packed(packed, valid)
            n_kmers += int(valid.sum())
        dbg.end_genome()
        if verbose:
            t1 = time.monotonic()
            peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
            print(f"\nFile {dbg.nb_genomes - 1}: {path}\n")
            print(f"{n_kmers} kmers read")
            print(f"Elapsed time: {t1 - t0:.6f} s")
            print(f"Total time: {t1 - t_start:.6f} s")
            print(f"Peak of memory: {peak // 1024} mb")
            print(f"Current memory: {dbg.memory_stats()['bytes_total'] // 2**20} mb")


def insert_genomes(dbg: ColoredDBG, paths: list[str], fmt: str,
                   verbose: bool = True):
    """Dispatch on input format: 'kmers' | 'kmers_comp' | 'fastx'."""
    if fmt == "fastx":
        insert_genomes_from_fasta_files(dbg, paths, verbose)
    else:
        insert_genomes_from_kmer_files(dbg, paths, fmt == "kmers_comp",
                                       verbose)


def insert_genomes_pipelined(dbg: ColoredDBG, paths: list[str], fmt: str,
                             verbose: bool = True, parser_threads: int = 1):
    """Pipelined ingest: host parses file i+1 while the device digests file i.

    The PP row of SURVEY §2's parallelism table: JAX dispatch is async, so
    ``insert_kmers_packed`` (buffer appends) returns immediately and the
    window flush overlaps the next file's host-side parse, which runs in a
    prefetch thread; ``parser_threads > 1`` additionally fans the 2-bit
    encode across cores inside the parse stage (kmer_io.FastxStream).
    Observable results are identical to the sequential drivers (same
    insertion order).
    """
    import concurrent.futures as cf

    from bloomfiltertrie_tpu.utils.profiling import PhaseTimer

    def parse(path):
        if fmt == "fastx":
            return kmer_io.read_fasta_file(path, dbg.k,
                                           threads=parser_threads)
        return kmer_io.read_kmer_file(path, dbg.k, fmt == "kmers_comp")

    timer = PhaseTimer()
    t_start = time.monotonic()
    with cf.ThreadPoolExecutor(max_workers=1) as pool:
        fut = pool.submit(parse, paths[0]) if paths else None
        for i, path in enumerate(paths):
            with timer.phase("parse_wait"):
                packed, valid = fut.result()
            fut = (pool.submit(parse, paths[i + 1])
                   if i + 1 < len(paths) else None)
            with timer.phase("device_insert"):
                t0 = time.monotonic()
                dbg.insert_genome(os.path.basename(path), packed, valid)
                t1 = time.monotonic()
            if verbose:
                peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
                print(f"\nFile {dbg.nb_genomes - 1}: {path}\n")
                print(f"{int(valid.sum())} kmers read")
                print(f"Elapsed time: {t1 - t0:.6f} s")
                print(f"Total time: {t1 - t_start:.6f} s")
                print(f"Peak of memory: {peak // 1024} mb")
    if verbose:
        print(timer.report())


def _write_csv(path: str, header: list[str], rows: np.ndarray):
    """CSV with the reference's trailing ``\\0``-for-``\\n`` quirk."""
    with open(path, "wb") as f:
        f.write(",".join(header).encode() + b"\n")
        if rows.shape[0]:
            n, g = rows.shape
            line = np.full((n, 2 * g), ord(","), dtype=np.uint8)
            line[:, ::2] = rows + ord("0")
            line[:, -1] = ord("\n")
            f.write(line.tobytes())
        f.seek(-1, os.SEEK_END)
        f.write(b"\0")


def _bitmap_to_rows(found: np.ndarray, bitmap: np.ndarray, nb_genomes: int):
    g = np.arange(nb_genomes)
    rows = (bitmap[:, g >> 5] >> (g & 31).astype(np.uint32)) & 1
    return (rows & found[:, None]).astype(np.uint8)


def query_kmer_presences(dbg: ColoredDBG, query_path: str, compressed: bool,
                         output_path: str):
    """Reference ``queryBFT_kmerPresences_from_KmerFiles`` (file_io.c:651).

    Returns the number of k-mers present (printed by the reference).
    """
    packed, valid = kmer_io.read_kmer_file(query_path, dbg.k, compressed)
    found, bitmap = dbg.query_kmers_packed(packed, valid)
    rows = _bitmap_to_rows(found, bitmap, dbg.nb_genomes)
    _write_csv(output_path, dbg.genome_names, rows)
    return int(found.sum())


def query_branching(dbg: ColoredDBG, query_path: str, compressed: bool) -> int:
    """Reference ``queryBFT_kmerBranching_from_KmerFiles`` (file_io.c:897):
    prints/returns only the branching count (file_io.c:1019)."""
    packed, valid = kmer_io.read_kmer_file(query_path, dbg.k, compressed)
    return dbg.branching_count_packed(packed, valid)


def query_sequences_csv(dbg: ColoredDBG, seq_path: str, threshold: float,
                        canonical: bool, output_path: str):
    """Reference ``query_sequences_outputCSV`` (file_io.c:1464): one sequence
    per line; row j = 1 iff genome j passes the k-mer count threshold.

    Scores ALL sequences through the batched device program
    (``query_sequences_batch``) — one membership+color+segment-count
    dispatch per ~1M concatenated windows instead of the reference's
    per-sequence loop; output bytes identical."""
    with open(seq_path, "rb") as f:
        seqs = [line.rstrip(b"\r\n") for line in f]
    if seqs and hasattr(dbg, "query_sequences_batch"):
        rows = dbg.query_sequences_batch(seqs, threshold, canonical)
    else:
        out = []
        for seq in seqs:
            row = np.zeros((dbg.nb_genomes,), dtype=np.uint8)
            if seq:
                hits = dbg.query_sequence(seq, threshold, canonical)
                row[hits] = 1
            out.append(row)
        rows = (np.stack(out) if out
                else np.zeros((0, dbg.nb_genomes), dtype=np.uint8))
    _write_csv(output_path, dbg.genome_names, rows)


def extract_kmers_to_disk(dbg: ColoredDBG, output_path: str,
                          compressed_output: bool):
    """Reference ``extract_kmers_to_disk`` (bft.c:255).  Order note: the
    reference emits trie-DFS order; we emit sorted order — SURVEY §3 fixes the
    contract as k-mer *set* equality."""
    packed = dbg.extract_kmers_packed()
    if compressed_output:
        kmer_io.write_kmer_file_comp(output_path, packed, dbg.k)
    else:
        kmer_io.write_kmer_file_ascii(output_path, packed, dbg.k)
