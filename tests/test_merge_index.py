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


def test_sharded_merge_equals_single_merge():
    """VERDICT r3 #9: merge_into_sharded(a, b) == merge_cdbg(a_single,
    b_single) — keys, full color matrix, flags — with b on a DIFFERENT
    mesh size than a (rows re-route through a's all_to_all).  Reference
    intent: merging_BFT src/merge.c:3-400 (dead code upstream)."""
    import numpy as np
    from bloomfiltertrie_tpu import BFTConfig, ColoredDBG
    from bloomfiltertrie_tpu.models.merge import merge_cdbg, merge_into_sharded
    from bloomfiltertrie_tpu.parallel.sharded import ShardedCDBG, make_mesh
    from bloomfiltertrie_tpu.ops import codec

    rng = np.random.default_rng(321)
    k = 15
    cfg = BFTConfig(k=k, initial_capacity=1 << 8,
                    initial_color_capacity=1 << 6, bloom_log2_bits=12,
                    batch_size=1 << 10, color_small_width=2,
                    genome_window=32)

    def genomes(seed, ng, shared):
        r = np.random.default_rng(seed)
        out = []
        for g in range(ng):
            seq = shared + "".join(r.choice(list("ACGT"), size=200))
            out.append([seq[i:i + k] for i in range(len(seq) - k + 1)])
        return out

    shared = "".join(rng.choice(list("ACGT"), size=120))
    ga = genomes(1, 3, shared)
    gb = genomes(2, 4, shared)          # overlaps a via `shared`

    def build(cls_or_mesh, gs, tag):
        if cls_or_mesh is None:
            d = ColoredDBG(cfg)
        else:
            d = ShardedCDBG(cfg, mesh=cls_or_mesh)
        for i, kms in enumerate(gs):
            packed, valid = codec.encode_strings(kms, k)
            d.insert_genome(f"{tag}{i}", packed, valid)
        return d

    a_sh = build(make_mesh(8), ga, "a")
    b_sh = build(make_mesh(4), gb, "b")   # different mesh size than a
    a_si = build(None, ga, "a")
    b_si = build(None, gb, "b")
    # marks on some of b's k-mers survive the merge (max-combined)
    mark_keys, mv = codec.encode_strings(gb[0][:10], k)
    b_sh.set_flags_packed(mark_keys, 2, mv)
    b_si.set_flags_packed(np.asarray(mark_keys), 2, np.asarray(mv))

    want = merge_cdbg(a_si, b_si)
    got = merge_into_sharded(a_sh, b_sh)

    assert got.genome_names == want.genome_names
    kw = want.extract_kmers_packed()
    kg = got.extract_kmers_packed()
    np.testing.assert_array_equal(kg, kw)
    f1, b1 = want.query_kmers_packed(kw)
    f2, b2 = got.query_kmers_packed(kw)
    assert f1.all() and f2.all()
    np.testing.assert_array_equal(b1, b2)
    np.testing.assert_array_equal(got.get_flags_packed(mark_keys, mv),
                                  want.get_flags_packed(
                                      np.asarray(mark_keys), np.asarray(mv)))
    assert got.nb_kmers == want.nb_kmers
