"""Sharded index tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from bloomfiltertrie_tpu import BFTConfig
from bloomfiltertrie_tpu.ops import codec
from bloomfiltertrie_tpu.parallel.sharded import ShardedCDBG, make_mesh

from oracle import OracleBFT


def small_config(k, **kw):
    kw.setdefault("initial_capacity", 1 << 8)
    kw.setdefault("initial_color_capacity", 1 << 6)
    kw.setdefault("bloom_log2_bits", 12)
    kw.setdefault("batch_size", 512)
    return BFTConfig(k=k, **kw)


def random_genome(rng, length):
    return "".join(rng.choice(list("ACGT"), size=length))


def genome_kmers(seq, k):
    return [seq[i:i + k] for i in range(len(seq) - k + 1)]


@pytest.fixture(scope="module", params=[2, 8])
def built(request):
    n_dev = request.param
    assert len(jax.devices()) >= n_dev, "conftest must force 8 cpu devices"
    mesh = make_mesh(n_dev)
    rng = np.random.default_rng(21)
    k = 27
    base = random_genome(rng, 900)
    genomes = {
        "g0": base[:600],
        "g1": base[300:900],
        "g2": base[150:450] + random_genome(rng, 300),
    }
    dbg = ShardedCDBG(small_config(k), mesh=mesh)
    oracle = OracleBFT(k)
    for name, seq in genomes.items():
        kms = genome_kmers(seq, k)
        oracle.insert_genome(name, kms)
        packed, valid = codec.encode_strings(kms, k)
        dbg.insert_genome(name, packed, valid)
    return dbg, oracle, genomes


def test_sharded_kmer_set(built):
    dbg, oracle, _ = built
    assert set(dbg.extract_kmer_strings()) == oracle.all_kmers()
    assert dbg.nb_kmers == len(oracle.all_kmers())


def test_sharded_extract_is_globally_sorted(built):
    dbg, _, _ = built
    packed = dbg.extract_kmers_packed()
    as_tuples = [tuple(r) for r in packed]
    assert as_tuples == sorted(as_tuples)


def test_sharded_membership_and_colors(built):
    dbg, oracle, _ = built
    rng = np.random.default_rng(5)
    queries = sorted(oracle.all_kmers())[:80] + \
        [random_genome(rng, dbg.k) for _ in range(40)] + ["ACGTN" + "A" * (dbg.k - 5)]
    packed, valid = codec.encode_strings(queries, dbg.k)
    found, bitmap = dbg.query_kmers_packed(packed, valid)
    for i, km in enumerate(queries):
        assert bool(found[i]) == oracle.contains(km), km
        row = [int((bitmap[i, g >> 5] >> np.uint32(g & 31)) & 1)
               for g in range(dbg.nb_genomes)]
        assert row == oracle.presence_row(km), km


def test_sharded_branching(built):
    dbg, oracle, _ = built
    rng = np.random.default_rng(9)
    queries = list(oracle.all_kmers()) + [random_genome(rng, dbg.k)
                                          for _ in range(20)]
    packed, valid = codec.encode_strings(queries, dbg.k)
    assert dbg.branching_count_packed(packed, valid) == \
        oracle.branching_count(queries)


def test_sharded_query_sequence(built):
    dbg, oracle, genomes = built
    for seq, thr, canon in [(genomes["g0"][50:250], 0.8, True),
                            (genomes["g2"][100:300], 0.5, False)]:
        got = dbg.query_sequence(seq, thr, canon).tolist()
        assert got == oracle.query_sequence(seq, thr, canon)


def test_sharded_matches_single_device(built):
    """Sharded index contents must equal the single-shard ColoredDBG's."""
    from bloomfiltertrie_tpu import ColoredDBG
    dbg, oracle, genomes = built
    single = ColoredDBG(small_config(dbg.k))
    for name, seq in genomes.items():
        single.insert_kmer_strings(name, genome_kmers(seq, dbg.k))
    np.testing.assert_array_equal(
        dbg.extract_kmers_packed(), single.extract_kmers_packed())
