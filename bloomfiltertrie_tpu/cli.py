"""``bft``-compatible command line interface.

Mirrors the reference CLI (src/main.c:40-47):

  bft build k {kmers|kmers_comp|fastx} list_genome_files output_file [Options]
  bft load file_bft [-add_genomes {kmers|kmers_comp} list_genome_files output_file] [Options]

  Options:
  [-query_sequences threshold {canonical|non_canonical} list_sequence_files]
  [-query_kmers {kmers|kmers_comp} list_kmer_files]
  [-query_branching {kmers|kmers_comp} list_kmer_files]
  [-extract_kmers {kmers|kmers_comp} compressed_kmers_file]

Differences from the reference, by design:
  * k may be any value in [4, 126] (the reference requires k % 9 == 0, a
    constraint of its 9-char trie levels — src/main.c:61-63 — which the flat
    table does not have).
  * the index file is this engine's own checkpoint format (outputs are
    compared with the reference, not index files — SURVEY §5 checkpoint note).
  * a leading ``--shards N`` (or env ``BFT_SHARDS=N``) runs every command
    through the prefix-sharded engine over an N-device mesh
    (parallel/sharded.py) — build, load/-add_genomes, and all queries ride
    shard_map + collectives; outputs are byte-identical to the
    single-device engine.  This is the pod entry point the reference's
    single-process CLI has no analogue for.
"""

from __future__ import annotations

import sys

# Importing the package applies the JAX_PLATFORMS env override (see
# bloomfiltertrie_tpu/__init__.py) — required for CPU-pinned CLI runs in
# environments whose sitecustomize pins a TPU backend at interpreter start.
from bloomfiltertrie_tpu.config import BFTConfig, MAX_K
from bloomfiltertrie_tpu.models.cdbg import ColoredDBG
from bloomfiltertrie_tpu.utils import drivers

USAGE = """\
Usage:
bft [--shards N] build k {kmers|kmers_comp|fastx} list_genome_files output_file [Options]
bft [--shards N] load file_bft [-add_genomes {kmers|kmers_comp} list_genome_files output_file] [Options]

--shards N (or env BFT_SHARDS=N): run on the prefix-sharded engine over an
N-device mesh (N must be a power of two and <= available devices).

Options:
[-query_sequences threshold {canonical|non_canonical} list_sequence_files]
[-query_kmers {kmers|kmers_comp} list_kmer_files]
[-query_branching {kmers|kmers_comp} list_kmer_files]
[-extract_kmers {kmers|kmers_comp} compressed_kmers_file]
"""

VERSION = "0.1.0"


def _read_list_file(path: str) -> list[str]:
    with open(path) as f:
        return [line.rstrip("\r\n") for line in f if line.strip()]


def _err(msg: str):
    sys.stderr.write(msg)
    raise SystemExit(1)


def _make_engine(shards: int, config: BFTConfig):
    if shards <= 1:
        return ColoredDBG(config)
    from bloomfiltertrie_tpu.parallel.sharded import ShardedCDBG, make_mesh
    return ShardedCDBG(config, mesh=make_mesh(shards))


def _load_engine(shards: int, path: str):
    if shards <= 1:
        return ColoredDBG.load(path)
    from bloomfiltertrie_tpu.parallel.sharded import ShardedCDBG, make_mesh
    return ShardedCDBG.load(path, mesh=make_mesh(shards))


def main(argv: list[str] | None = None) -> int:
    import os
    argv = list(sys.argv[1:] if argv is None else argv)
    shards = int(os.environ.get("BFT_SHARDS", "1"))
    if argv and argv[0] == "--shards":
        if len(argv) < 2:
            _err(USAGE)
        shards = int(argv[1])
        argv = argv[2:]
    if not argv:
        _err(USAGE)
    if argv[0] in ("--version", "-v"):
        sys.stderr.write(VERSION + "\n")
        return 0

    if argv[0] == "build":
        if len(argv) < 5:
            _err(USAGE)
        k = int(argv[1])
        if not (4 <= k <= MAX_K):
            _err(f"Length k (for k-mers) must be in [4, {MAX_K}].\n")
        fmt, list_file, output = argv[2], argv[3], argv[4]
        if fmt not in ("kmers", "kmers_comp", "fastx"):
            _err("Unrecognized type of input files.\nChoice must be 'kmers' "
                 "for k-mers files, 'kmers_comp' for compressed k-mers files "
                 "or 'fastx' for FASTA files.\n")
        dbg = _make_engine(shards, BFTConfig(k=k, treshold_compression=1))
        drivers.insert_genomes(dbg, _read_list_file(list_file), fmt)
        _print_memory(dbg)
        dbg.save(output)
        rest = argv[5:]
    elif argv[0] == "load":
        if len(argv) < 2:
            _err(USAGE)
        dbg = _load_engine(shards, argv[1])
        _print_memory(dbg)
        rest = argv[2:]
        if rest and rest[0] == "-add_genomes":
            if len(rest) < 4:
                _err(USAGE)
            fmt, list_file, output = rest[1], rest[2], rest[3]
            drivers.insert_genomes(dbg, _read_list_file(list_file), fmt)
            dbg.save(output)
            rest = rest[4:]
    else:
        _err(f"Unrecognized command {argv[0]}.\n")

    i = 0
    while i < len(rest):
        opt = rest[i]
        if opt == "-query_kmers":
            fmt, list_file = rest[i + 1], rest[i + 2]
            for j, qpath in enumerate(_read_list_file(list_file)):
                nb = drivers.query_kmer_presences(
                    dbg, qpath, fmt == "kmers_comp", qpath + ".query_kmers.out")
                print(f"Number of k-mers present in the graph: {nb}")
            i += 3
        elif opt == "-query_branching":
            fmt, list_file = rest[i + 1], rest[i + 2]
            for qpath in _read_list_file(list_file):
                nb = drivers.query_branching(dbg, qpath, fmt == "kmers_comp")
                print(f"Number of branching k-mers in the graph: {nb}")
            i += 3
        elif opt == "-query_sequences":
            threshold = float(rest[i + 1])
            canon = rest[i + 2]
            if canon not in ("canonical", "non_canonical"):
                _err("Choice must be 'canonical' or 'non_canonical'.\n")
            for qpath in _read_list_file(rest[i + 3]):
                drivers.query_sequences_csv(
                    dbg, qpath, threshold, canon == "canonical",
                    qpath + ".query_sequences.out")
            i += 4
        elif opt == "-extract_kmers":
            fmt, out = rest[i + 1], rest[i + 2]
            drivers.extract_kmers_to_disk(dbg, out, fmt == "kmers_comp")
            i += 3
        else:
            _err(f"Unrecognized command {opt}.\n")
    return 0


def _print_memory(dbg: ColoredDBG):
    """Structure stats, mirroring printMemory (src/printMemory.c)."""
    st = dbg.memory_stats()
    print(f"Number of k-mers: {st['nb_kmers']}")
    print(f"Number of color classes: {st['nb_color_classes']}")
    print(f"Total size (bytes): {st['bytes_total']}")
    print(f"  keys={st['bytes_keys']} colors={st['bytes_colors']} "
          f"color_ref={st['bytes_color_ref']} bloom={st['bytes_bloom']}")


if __name__ == "__main__":
    raise SystemExit(main())
