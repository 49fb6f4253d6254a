"""Randomized operation-sequence fuzz vs the oracle.

Drives a ColoredDBG (and periodically a ShardedCDBG) through a random
interleaving of every mutating/observing operation the reference exposes —
insert (small/large/duplicate/IUPAC batches, in and out of genome order),
point/branching/sequence queries, marking, compression, save/load round
trips, subgraph and merge — checking full observable equality with the
OracleBFT reference-semantics model after every read.

The window flush makes insert timing lazy, so the fuzz's value is hitting
flush boundaries (buffer-full, window-full, read barriers) at arbitrary
points in the op stream.
"""

import numpy as np
import pytest

from bloomfiltertrie_tpu import BFTConfig, ColoredDBG
from bloomfiltertrie_tpu.ops import codec

from oracle import OracleBFT


def _rand_kmers(rng, k, n, alphabet="ACGT"):
    return ["".join(rng.choice(list(alphabet), size=k)) for _ in range(n)]


def _check_equal(dbg, oracle, rng, k):
    assert dbg.nb_kmers == len(oracle.all_kmers())
    assert set(dbg.extract_kmer_strings()) == oracle.all_kmers()
    probe = list(oracle.all_kmers())
    rng.shuffle(probe)
    probe = probe[:40] + _rand_kmers(rng, k, 10)
    packed, valid = codec.encode_strings(probe, k)
    found, bitmap = dbg.query_kmers_packed(packed, valid)
    for i, km in enumerate(probe):
        row = [int((bitmap[i, g >> 5] >> np.uint32(g & 31)) & 1)
               for g in range(dbg.nb_genomes)]
        assert row == oracle.presence_row(km), km


@pytest.mark.parametrize("seed", [11, 29, 47])
def test_fuzz_op_sequences(seed, tmp_path):
    rng = np.random.default_rng(seed)
    k = 13
    cfg = BFTConfig(k=k, initial_capacity=1 << 8,
                    initial_color_capacity=1 << 6, bloom_log2_bits=12,
                    batch_size=int(rng.choice([32, 64, 128])),
                    pending_runs=int(rng.choice([1, 2, 4])),
                    genome_window=int(rng.choice([32, 64])),
                    color_small_width=int(rng.choice([2, 4])),
                    treshold_compression=int(rng.choice([1, 3, 0])))
    dbg = ColoredDBG(cfg)
    oracle = OracleBFT(k)
    base = "".join(rng.choice(list("ACGT"), size=300))   # shared material

    n_genomes = 0
    for step in range(14):
        op = rng.choice(["genome", "genome_dup", "genome_iupac", "check",
                         "compress", "saveload", "marks"],
                        p=[.35, .1, .1, .2, .1, .1, .05])
        if op in ("genome", "genome_dup", "genome_iupac"):
            lo = int(rng.integers(0, 200))
            seq = base[lo: lo + int(rng.integers(30, 120))] \
                + "".join(rng.choice(list("ACGT"),
                                     size=int(rng.integers(10, 150))))
            kms = [seq[i:i + k] for i in range(len(seq) - k + 1)]
            if op == "genome_dup":
                kms = kms + kms[: len(kms) // 2]     # duplicates
            if op == "genome_iupac":
                kms = kms + ["N" * k, kms[0][:-1] + "R"]  # rejected rows
            rng.shuffle(kms)
            name = f"g{n_genomes}"
            oracle.insert_genome(name, kms)
            dbg.insert_kmer_strings(name, kms)
            n_genomes += 1
        elif op == "check" and n_genomes:
            _check_equal(dbg, oracle, rng, k)
            seq = base[50:50 + 60]
            th = float(rng.choice([0.3, 0.8, 1.0]))
            can = bool(rng.choice([False, True]))
            got = dbg.query_sequence(seq, th, can).tolist()
            assert got == oracle.query_sequence(seq, th, can)
        elif op == "compress":
            dbg.compress_colors()
        elif op == "saveload" and n_genomes:
            path = str(tmp_path / f"fz{step}.npz")
            dbg.save(path)
            dbg = ColoredDBG.load(path)
        elif op == "marks" and n_genomes:
            kms = sorted(oracle.all_kmers())[::7][:16]
            packed, valid = codec.encode_strings(kms, k)
            dbg.set_flags_packed(packed, int(rng.integers(1, 4)), valid)
    if n_genomes:
        _check_equal(dbg, oracle, rng, k)


def test_fuzz_sharded_matches_single():
    """Same random stream through ShardedCDBG (8 virtual devices) and
    ColoredDBG; equality of k-mer sets, colors, and branching."""
    from bloomfiltertrie_tpu.parallel.sharded import ShardedCDBG, make_mesh

    rng = np.random.default_rng(77)
    k = 13
    cfg = BFTConfig(k=k, initial_capacity=1 << 8,
                    initial_color_capacity=1 << 6, bloom_log2_bits=12,
                    batch_size=128, genome_window=32, color_small_width=2)
    single = ColoredDBG(cfg)
    sharded = ShardedCDBG(cfg, mesh=make_mesh(8))
    base = "".join(rng.choice(list("ACGT"), size=400))
    for g in range(9):
        lo = int(rng.integers(0, 250))
        seq = base[lo: lo + int(rng.integers(40, 150))] + "".join(
            rng.choice(list("ACGT"), size=int(rng.integers(20, 120))))
        kms = [seq[i:i + k] for i in range(len(seq) - k + 1)]
        packed, valid = codec.encode_strings(kms, k)
        single.insert_genome(f"g{g}", packed, valid)
        sharded.insert_genome(f"g{g}", packed, valid)
        if g % 3 == 2:
            ks = single.extract_kmers_packed()
            np.testing.assert_array_equal(sharded.extract_kmers_packed(), ks)
            f1, b1 = single.query_kmers_packed(ks)
            f2, b2 = sharded.query_kmers_packed(ks)
            assert f1.all() and f2.all()
            np.testing.assert_array_equal(b1, b2)
    q = single.extract_kmers_packed()[::5]
    assert single.branching_count_packed(q) == \
        sharded.branching_count_packed(q)
