"""Hybrid color engine (models/table.py ColorStore): pool transitions.

Targets the in-memory small-id-list / dense-bitmap split — the device
analogue of the reference's per-annotation mode selection
(src/annotation.c:416 compute_best_mode, :658 modify_mode_annotation).
Every test forces small color_small_width so the small -> dense overflow
transition is actually crossed, then validates observable color semantics
against the oracle.
"""

import os

import numpy as np
import pytest

from bloomfiltertrie_tpu import BFTConfig, ColoredDBG
from bloomfiltertrie_tpu.models import table as tbl

from oracle import OracleBFT


def random_genome(rng, length):
    return "".join(rng.choice(list("ACGT"), size=length))


def genome_kmers(seq, k):
    return [seq[i:i + k] for i in range(len(seq) - k + 1)]


def tiny_config(k, s_w, **kw):
    kw.setdefault("initial_capacity", 1 << 8)
    kw.setdefault("initial_color_capacity", 1 << 6)
    kw.setdefault("initial_dense_color_capacity", 1 << 4)
    kw.setdefault("bloom_log2_bits", 12)
    kw.setdefault("batch_size", 128)
    kw.setdefault("color_small_width", s_w)
    return BFTConfig(k=k, **kw)


def build_pair(n_genomes, s_w, seed=3, k=9, length=260, core=160):
    """Engine + oracle over n_genomes sharing a core region."""
    rng = np.random.default_rng(seed)
    base = random_genome(rng, length)
    dbg = ColoredDBG(tiny_config(k, s_w))
    oracle = OracleBFT(k)
    for g in range(n_genomes):
        seq = base[:core] + random_genome(rng, length - core)
        kms = genome_kmers(seq, k)
        oracle.insert_genome(f"g{g}", kms)
        dbg.insert_kmer_strings(f"g{g}", kms)
    return dbg, oracle


@pytest.mark.parametrize("s_w", [1, 2, 4])
def test_overflow_to_dense_matches_oracle(s_w):
    """Core k-mers (present in all 6 genomes) must cross small->dense."""
    n_genomes = 6
    dbg, oracle = build_pair(n_genomes, s_w)
    stats = dbg.memory_stats()
    assert stats["nb_dense_classes"] >= 1, \
        "core class (6 genomes) must live in the dense pool"
    assert stats["nb_small_classes"] >= 1
    for km in sorted(oracle.all_kmers()):
        ann = dbg.get_colors(km)
        assert ann is not None
        assert list(ann.list_id_genomes()) == sorted(oracle.colors(km)), km
    # absent k-mer
    assert dbg.get_colors("A" * dbg.k) is None or oracle.contains("A" * dbg.k)


def test_invariants_and_canonical_split():
    os.environ["BFT_DEBUG_INVARIANTS"] = "1"
    try:
        dbg, oracle = build_pair(5, 2, seed=11)
        dbg._check_invariants()
        # canonical split: every small class has <= S ids, every dense > S
        sd, dd = dbg._sd, dbg._dd
        ids = np.asarray(dbg.colors.ids)[:sd]
        assert ((ids != tbl.EMPTY_ID).sum(axis=1) <= 2).all()
        if dd:
            from bloomfiltertrie_tpu.models import colors_codec
            bits = colors_codec.unpack_rows(
                np.asarray(dbg.colors.rows)[:dd], dbg.nb_genomes)
            assert (bits.sum(axis=1) > 2).all()
    finally:
        os.environ.pop("BFT_DEBUG_INVARIANTS", None)


def test_save_load_roundtrip_with_dense(tmp_path):
    dbg, oracle = build_pair(7, 2, seed=19)
    p = str(tmp_path / "hybrid_idx")
    dbg.save(p)
    dbg2 = ColoredDBG.load(p)
    assert dbg2.nb_kmers == dbg.nb_kmers
    assert dbg2.memory_stats()["nb_dense_classes"] >= 1
    for km in sorted(oracle.all_kmers()):
        ann = dbg2.get_colors(km)
        assert ann is not None
        assert list(ann.list_id_genomes()) == sorted(oracle.colors(km)), km
    # add a genome after reload (resume-and-continue, reference
    # load -add_genomes): genome ids continue in insertion order
    rng = np.random.default_rng(23)
    seq = random_genome(rng, 120)
    kms = genome_kmers(seq, dbg.k)
    oracle.insert_genome("g7", kms)
    dbg2.insert_kmer_strings("g7", kms)
    for km in kms[:20]:
        assert list(dbg2.get_colors(km).list_id_genomes()) == \
            sorted(oracle.colors(km)), km


def test_compress_dedups_within_pools():
    dbg, oracle = build_pair(6, 2, seed=29)
    dbg.compress_colors()
    sd, dd = dbg._sd, dbg._dd
    ids = np.asarray(dbg.colors.ids)[:sd]
    rows = np.asarray(dbg.colors.rows)[:dd]
    assert len(np.unique(ids, axis=0)) == sd, "duplicate small classes"
    if dd:
        assert len(np.unique(rows, axis=0)) == dd, "duplicate dense classes"
    # distinct observable color sets == total classes after compression
    distinct = {tuple(sorted(oracle.colors(km))) for km in oracle.all_kmers()}
    assert sd + dd == len(distinct)


def test_memory_stats_pools():
    dbg, _ = build_pair(6, 2, seed=31)
    st = dbg.memory_stats()
    assert st["bytes_colors"] == st["bytes_colors_small"] + \
        st["bytes_colors_dense"]
    assert st["nb_color_classes"] == st["nb_small_classes"] + \
        st["nb_dense_classes"]


def test_sharded_hybrid_matches_single():
    """Sharded build with forced overflow equals single-chip build."""
    import jax
    from bloomfiltertrie_tpu.parallel.sharded import ShardedCDBG, make_mesh
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    rng = np.random.default_rng(37)
    k = 9
    base = random_genome(rng, 300)
    genomes = [base[:200] + random_genome(rng, 100) for _ in range(6)]
    cfg = tiny_config(k, 2)
    single = ColoredDBG(cfg)
    sharded = ShardedCDBG(cfg, mesh=make_mesh(4))
    oracle = OracleBFT(k)
    for g, seq in enumerate(genomes):
        kms = genome_kmers(seq, k)
        oracle.insert_genome(f"g{g}", kms)
        single.insert_kmer_strings(f"g{g}", kms)
        from bloomfiltertrie_tpu.ops import codec
        packed, valid = codec.encode_strings(kms, k)
        sharded.insert_genome(f"g{g}", packed, valid)
    assert sharded.nb_kmers == single.nb_kmers
    assert sharded.memory_stats()["nb_dense_classes"] >= 1
    kms = sorted(oracle.all_kmers())
    from bloomfiltertrie_tpu.ops import codec
    packed, valid = codec.encode_strings(kms, k)
    f1, b1 = single.query_kmers_packed(packed, np.asarray(valid))
    f2, b2 = sharded.query_kmers_packed(packed, valid)
    assert (f1 == f2).all()
    assert (b1 == b2).all()
    for i, km in enumerate(kms):
        want = sorted(oracle.colors(km))
        got = np.nonzero(
            np.unpackbits(b2[i].view(np.uint8), bitorder="little"))[0]
        assert list(got) == want, km
