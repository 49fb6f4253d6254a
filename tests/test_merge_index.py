"""Index-union (merge_cdbg) and sharded checkpoint tests."""

import numpy as np
import pytest

from bloomfiltertrie_tpu import BFTConfig, ColoredDBG
from bloomfiltertrie_tpu.models.merge import merge_cdbg
from bloomfiltertrie_tpu.ops import codec

from oracle import OracleBFT


def small_config(k, **kw):
    kw.setdefault("initial_capacity", 1 << 8)
    kw.setdefault("initial_color_capacity", 1 << 6)
    kw.setdefault("bloom_log2_bits", 12)
    kw.setdefault("batch_size", 128)
    return BFTConfig(k=k, **kw)


def random_genome(rng, length):
    return "".join(rng.choice(list("ACGT"), size=length))


def genome_kmers(seq, k):
    return [seq[i:i + k] for i in range(len(seq) - k + 1)]


def test_merge_cdbg():
    """merge(a, b) == building all genomes sequentially (reference merge.c
    semantics, but actually functional)."""
    rng = np.random.default_rng(33)
    k = 9
    base = random_genome(rng, 400)
    sets = {
        "a0": base[:150], "a1": base[50:220],
        "b0": base[100:300], "b1": random_genome(rng, 150),
    }
    a = ColoredDBG(small_config(k))
    b = ColoredDBG(small_config(k))
    oracle = OracleBFT(k)
    for name in ["a0", "a1"]:
        kms = genome_kmers(sets[name], k)
        a.insert_kmer_strings(name, kms)
        oracle.insert_genome(name, kms)
    for name in ["b0", "b1"]:
        kms = genome_kmers(sets[name], k)
        b.insert_kmer_strings(name, kms)
        oracle.insert_genome(name, kms)

    m = merge_cdbg(a, b)
    assert m.genome_names == ["a0", "a1", "b0", "b1"]
    assert set(m.extract_kmer_strings()) == oracle.all_kmers()
    for km in sorted(oracle.all_kmers()):
        assert set(m.get_colors(km).list_id_genomes().tolist()) == \
            oracle.colors(km), km
    # 35+ genomes would cross a word boundary; test offset shifting too
    wide = ColoredDBG(small_config(k))
    oracle2 = OracleBFT(k)
    for name in ["a0", "a1", "b0", "b1"]:
        kms = genome_kmers(sets[name], k)
        oracle2.insert_genome("x" + name, kms)
    # merge m with itself-shifted: 4+4 genomes
    m2 = merge_cdbg(m, m)
    assert m2.nb_genomes == 8
    km = sorted(oracle.all_kmers())[0]
    got = set(m2.get_colors(km).list_id_genomes().tolist())
    want = oracle.colors(km) | {g + 4 for g in oracle.colors(km)}
    assert got == want


@pytest.mark.parametrize("reload_devices", [2, 8])
def test_sharded_save_load_reshard(tmp_path, reload_devices):
    import jax
    from bloomfiltertrie_tpu.parallel.sharded import ShardedCDBG, make_mesh

    rng = np.random.default_rng(44)
    k = 27
    seq = random_genome(rng, 600)
    kms = genome_kmers(seq, k)
    packed, valid = codec.encode_strings(kms, k)

    dbg = ShardedCDBG(small_config(k), mesh=make_mesh(4))
    dbg.insert_genome("g0", packed, valid)
    dbg.insert_genome("g1", packed[:300], valid[:300])
    path = str(tmp_path / "sharded.npz")
    dbg.save(path)

    loaded = ShardedCDBG.load(path, mesh=make_mesh(reload_devices))
    assert loaded.genome_names == ["g0", "g1"]
    np.testing.assert_array_equal(loaded.extract_kmers_packed(),
                                  dbg.extract_kmers_packed())
    found, bitmap = loaded.query_kmers_packed(packed[:100])
    assert found.all()
    f2, b2 = dbg.query_kmers_packed(packed[:100])
    np.testing.assert_array_equal(bitmap, b2)
    # index remains usable for incremental insertion after reload
    loaded.insert_genome("g2", packed[300:], valid[300:])
    assert loaded.nb_kmers == dbg.nb_kmers
