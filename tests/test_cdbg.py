import numpy as np
import pytest

from bloomfiltertrie_tpu import BFTConfig, ColoredDBG
from bloomfiltertrie_tpu.ops import codec

from oracle import OracleBFT, revcomp


def random_genome(rng, length):
    return "".join(rng.choice(list("ACGT"), size=length))


def genome_kmers(seq, k):
    return [seq[i:i + k] for i in range(len(seq) - k + 1)]


def small_config(k, **kw):
    kw.setdefault("initial_capacity", 1 << 8)
    kw.setdefault("initial_color_capacity", 1 << 6)
    kw.setdefault("bloom_log2_bits", 12)
    kw.setdefault("batch_size", 128)
    return BFTConfig(k=k, **kw)


@pytest.fixture(scope="module")
def built():
    """3 overlapping genomes at k=9, engine + oracle."""
    rng = np.random.default_rng(42)
    k = 9
    base = random_genome(rng, 400)
    genomes = {
        "g0": base[:300],
        "g1": base[100:400],
        "g2": base[50:350][:150] + random_genome(rng, 150),
    }
    dbg = ColoredDBG(small_config(k))
    oracle = OracleBFT(k)
    for name, seq in genomes.items():
        kms = genome_kmers(seq, k)
        oracle.insert_genome(name, kms)
        dbg.insert_kmer_strings(name, kms)
    return dbg, oracle, genomes


def test_kmer_set_equality(built):
    dbg, oracle, _ = built
    assert set(dbg.extract_kmer_strings()) == oracle.all_kmers()
    assert dbg.nb_kmers == len(oracle.all_kmers())


def test_membership_and_colors(built):
    dbg, oracle, _ = built
    rng = np.random.default_rng(7)
    queries = list(oracle.all_kmers())[:50] + [random_genome(rng, dbg.k)
                                              for _ in range(50)]
    for km in queries:
        assert dbg.contains(km) == oracle.contains(km), km
        ann = dbg.get_colors(km)
        if oracle.contains(km):
            assert set(ann.list_id_genomes().tolist()) == oracle.colors(km)
        else:
            assert ann is None


def test_query_kmers_matrix(built):
    dbg, oracle, _ = built
    kmers = sorted(oracle.all_kmers())[:100] + ["ACGTNACGT", "A" * dbg.k]
    packed, valid = codec.encode_strings(kmers, dbg.k)
    found, bitmap = dbg.query_kmers_packed(packed, valid)
    for i, km in enumerate(kmers):
        row = [int((bitmap[i, g >> 5] >> np.uint32(g & 31)) & 1)
               for g in range(dbg.nb_genomes)]
        assert row == oracle.presence_row(km), km


def test_same_genome_reinsertion_noop():
    """Reference: re-inserting a k-mer for its own genome changes nothing
    (src/retrieveAnnotation.c:278).  Insert every k-mer of genome 0 twice,
    with a flush in between (so the second copy probes the main table and
    hits the found-and-has-genome no-op path), and assert the final state —
    n, d, and the full color matrix — equals a build without duplicates."""
    from bloomfiltertrie_tpu import ColoredDBG
    rng = np.random.default_rng(31)
    k = 27
    g0 = genome_kmers(random_genome(rng, 400), k)
    g1 = genome_kmers(random_genome(rng, 400), k)
    all_kms = sorted(set(g0 + g1))
    packed_all, valid_all = codec.encode_strings(all_kms, k)

    dup = ColoredDBG(small_config(k))
    dup.start_genome("g0")
    p0, v0 = codec.encode_strings(g0, k)
    dup.insert_kmers_packed(p0, v0)
    dup.flush()                      # first copies now live in the table
    dup.insert_kmers_packed(p0, v0)  # same-genome re-insertion
    dup.end_genome()
    dup.insert_kmer_strings("g1", g1)
    dup.compress_colors()

    ref = ColoredDBG(small_config(k))
    ref.insert_kmer_strings("g0", g0)
    ref.insert_kmer_strings("g1", g1)
    ref.compress_colors()

    assert dup.nb_kmers == ref.nb_kmers
    assert dup.nb_color_classes == ref.nb_color_classes
    _, bm_dup = dup.query_kmers_packed(packed_all, valid_all)
    _, bm_ref = ref.query_kmers_packed(packed_all, valid_all)
    np.testing.assert_array_equal(bm_dup, bm_ref)


def test_neighbors(built):
    dbg, oracle, _ = built
    for km in list(oracle.all_kmers())[:60]:
        assert sorted(dbg.successors(km)) == sorted(oracle.successors(km))
        assert sorted(dbg.predecessors(km)) == sorted(oracle.predecessors(km))


def test_branching(built):
    dbg, oracle, _ = built
    rng = np.random.default_rng(3)
    queries = list(oracle.all_kmers()) + [random_genome(rng, dbg.k)
                                          for _ in range(30)]
    packed, valid = codec.encode_strings(queries, dbg.k)
    assert dbg.branching_count_packed(packed, valid) == \
        oracle.branching_count(queries)


@pytest.mark.parametrize("canonical", [False, True])
@pytest.mark.parametrize("threshold", [0.3, 0.8, 1.0])
def test_query_sequence(built, canonical, threshold):
    dbg, oracle, genomes = built
    rng = np.random.default_rng(5)
    seqs = [genomes["g0"][20:90],
            genomes["g1"][50:120] + "N" + genomes["g1"][120:150],
            revcomp(genomes["g2"][10:80]),
            random_genome(rng, 70)]
    for seq in seqs:
        got = dbg.query_sequence(seq, threshold, canonical).tolist()
        want = oracle.query_sequence(seq, threshold, canonical)
        assert got == want, seq


def test_prefix_matching(built):
    dbg, oracle, _ = built
    for prefix in ["A", "AC", "GAT", "TTTT"]:
        got = set(codec.decode_strings(dbg.prefix_matching(prefix), dbg.k))
        want = {km for km in oracle.all_kmers() if km.startswith(prefix)}
        assert got == want, prefix


def test_annotation_set_ops(built):
    dbg, oracle, _ = built
    kms = [km for km in sorted(oracle.all_kmers())
           if len(oracle.colors(km)) >= 1][:10]
    a = dbg.get_colors(kms[0])
    b = dbg.get_colors(kms[-1])
    sa, sb = oracle.colors(kms[0]), oracle.colors(kms[-1])
    assert set(dbg.annotation_intersection(a, b).list_id_genomes().tolist()) == sa & sb
    assert set(dbg.annotation_union(a, b).list_id_genomes().tolist()) == sa | sb
    assert set(dbg.annotation_sym_difference(a, b).list_id_genomes().tolist()) == sa ^ sb


def test_marking(built):
    dbg, oracle, _ = built
    kms = sorted(oracle.all_kmers())[:20]
    packed, valid = codec.encode_strings(kms, dbg.k)
    dbg.set_marking()
    dbg.set_flags_packed(packed, 3, valid)
    flags = dbg.get_flags_packed(packed, valid)
    assert (flags == 3).all()
    other, v2 = codec.encode_strings(sorted(oracle.all_kmers())[20:40], dbg.k)
    assert (dbg.get_flags_packed(other, v2) == 0).all()
    dbg.unset_marking()
    assert (dbg.get_flags_packed(packed, valid) == 0).all()


def test_iterate_over_kmers(built):
    dbg, oracle, _ = built
    seen = {}
    dbg.iterate_over_kmers(
        lambda km, ann, fl: seen.__setitem__(km, set(ann.list_id_genomes().tolist())))
    assert set(seen) == oracle.all_kmers()
    for km, colors in list(seen.items())[:100]:
        assert colors == oracle.colors(km)


def test_save_load(built, tmp_path):
    dbg, oracle, _ = built
    path = str(tmp_path / "index.npz")
    dbg.save(path)
    loaded = ColoredDBG.load(path)
    assert loaded.nb_kmers == dbg.nb_kmers
    assert loaded.genome_names == dbg.genome_names
    assert set(loaded.extract_kmer_strings()) == oracle.all_kmers()
    for km in sorted(oracle.all_kmers())[:30]:
        assert set(loaded.get_colors(km).list_id_genomes().tolist()) == \
            oracle.colors(km)


def test_incremental_add_genomes(built):
    """load ... -add_genomes equivalence: build 2+1 == build 3."""
    dbg3, oracle, genomes = built
    k = dbg3.k
    names = list(genomes)
    dbg = ColoredDBG(small_config(k))
    for name in names[:2]:
        dbg.insert_kmer_strings(name, genome_kmers(genomes[name], k))
    # simulate save/load then add
    dbg.insert_kmer_strings(names[2], genome_kmers(genomes[names[2]], k))
    assert set(dbg.extract_kmer_strings()) == oracle.all_kmers()
    for km in sorted(oracle.all_kmers())[:50]:
        assert set(dbg.get_colors(km).list_id_genomes().tolist()) == \
            oracle.colors(km)


def test_subgraph(built):
    dbg, oracle, _ = built
    kms = sorted(oracle.all_kmers())[:40]
    packed, _ = codec.encode_strings(kms, dbg.k)
    sub = dbg.subgraph(packed, add_colors=True)
    assert set(sub.extract_kmer_strings()) == set(kms)
    for km in kms[:20]:
        assert set(sub.get_colors(km).list_id_genomes().tolist()) == \
            oracle.colors(km)


def test_compress_colors_idempotent(built):
    dbg, oracle, _ = built
    d_before = dbg.nb_color_classes
    dbg.compress_colors()
    assert dbg.nb_color_classes <= d_before
    for km in sorted(oracle.all_kmers())[:50]:
        assert set(dbg.get_colors(km).list_id_genomes().tolist()) == \
            oracle.colors(km)


@pytest.mark.parametrize("k", [27, 32, 63, 126])
def test_multiword_k(k):
    rng = np.random.default_rng(k)
    seq = random_genome(rng, 300)
    kms = genome_kmers(seq, k)
    dbg = ColoredDBG(small_config(k))
    oracle = OracleBFT(k)
    dbg.insert_kmer_strings("g0", kms)
    oracle.insert_genome("g0", kms)
    assert set(dbg.extract_kmer_strings()) == oracle.all_kmers()
    assert dbg.contains(kms[0])
    assert not dbg.contains(random_genome(rng, k))


def test_allT_kmer_k16():
    """k=16 makes all-T collide with the sentinel bit pattern; must work."""
    k = 16
    dbg = ColoredDBG(small_config(k))
    kms = ["T" * 16, "A" * 16, "ACGT" * 4]
    dbg.insert_kmer_strings("g", kms)
    assert dbg.nb_kmers == 3
    for km in kms:
        assert dbg.contains(km)
        assert set(dbg.get_colors(km).list_id_genomes().tolist()) == {0}
    assert set(dbg.extract_kmer_strings()) == set(kms)


def test_query_sequence_early_abort_equivalence():
    """Chunked early-abort scan (reference bft.c:1283-1320) must match the
    full-count answer, and must actually stop early on hopeless queries."""
    from bloomfiltertrie_tpu import ColoredDBG
    rng = np.random.default_rng(41)
    k = 27
    base = random_genome(rng, 600)
    dbg = ColoredDBG(small_config(k))
    dbg.insert_kmer_strings("g0", genome_kmers(base, k))
    oracle = OracleBFT(k)
    oracle.insert_genome("g0", genome_kmers(base, k))

    # hopeless long query: no window hits; tiny chunks force several rounds
    junk = random_genome(rng, 3000)
    calls = []
    orig = dbg.query_kmers_packed
    dbg.query_kmers_packed = lambda *a, **kw: (calls.append(1), orig(*a, **kw))[1]
    got = dbg.query_sequence(junk, 0.9, False, chunk_windows=256)
    assert got.tolist() == oracle.query_sequence(junk, 0.9, False)
    n_chunks_full = -(-(len(junk) - k + 1) // 256)
    assert len(calls) < n_chunks_full, "early abort never triggered"
    dbg.query_kmers_packed = orig

    # positive + mixed queries agree with the oracle at several thresholds
    for seq, thr in [(base[37:300], 0.8), (base[100:400] + junk[:300], 0.4),
                     (junk[:200], 0.5)]:
        for canon in (False, True):
            got = dbg.query_sequence(seq, thr, canon, chunk_windows=64)
            assert got.tolist() == oracle.query_sequence(seq, thr, canon)


def test_config_canonical_default():
    from bloomfiltertrie_tpu import ColoredDBG
    rng = np.random.default_rng(43)
    k = 27
    base = random_genome(rng, 300)
    cfg_c = small_config(k, canonical=True)
    dbg = ColoredDBG(cfg_c)
    dbg.insert_kmer_strings("g0", genome_kmers(base, k))
    oracle = OracleBFT(k)
    oracle.insert_genome("g0", genome_kmers(base, k))
    q = revcomp(base[10:200])
    assert dbg.query_sequence(q, 0.7).tolist() == \
        oracle.query_sequence(q, 0.7, True)


def test_bloom_prefilter_and_disabled_mode():
    """Bloom pre-filter must not change answers (no false negatives), and a
    bloom_enabled=False build stays exact while skipping plane maintenance."""
    from bloomfiltertrie_tpu import ColoredDBG
    rng = np.random.default_rng(53)
    k = 27
    kms = genome_kmers(random_genome(rng, 500), k)
    misses = [random_genome(rng, k) for _ in range(200)]
    queries = kms[:100] + misses
    packed, valid = codec.encode_strings(queries, k)

    dbg = ColoredDBG(small_config(k))
    dbg.insert_kmer_strings("g0", kms)
    f_plain, bm_plain = dbg.query_kmers_packed(packed, valid)
    f_bloom, bm_bloom = dbg.query_kmers_packed(packed, valid,
                                               use_bloom_prefilter=True)
    np.testing.assert_array_equal(f_plain, f_bloom)
    np.testing.assert_array_equal(bm_plain, bm_bloom)
    assert f_plain[:100].all()

    off = ColoredDBG(small_config(k, bloom_enabled=False))
    off.insert_kmer_strings("g0", kms)
    f_off, bm_off = off.query_kmers_packed(packed, valid)
    np.testing.assert_array_equal(f_plain, f_off)
    np.testing.assert_array_equal(bm_plain, bm_off)
    # plane untouched when disabled
    import jax as _jax
    assert int(np.asarray(_jax.device_get(off.bloom)).sum()) == 0
    assert int(np.asarray(_jax.device_get(dbg.bloom)).sum()) > 0


def test_color_csr(built):
    dbg, oracle, _ = built
    offsets, ids = dbg.get_color_csr()
    assert offsets.shape[0] == dbg.nb_color_classes + 1
    # every k-mer's class decodes to its oracle color set
    n = dbg.nb_kmers
    import jax as _jax
    cref = np.asarray(_jax.device_get(dbg.table.color_ref))[:n]
    strs = dbg.extract_kmer_strings()
    for i in range(0, n, 7):
        c = cref[i]
        got = set(ids[offsets[c]:offsets[c + 1]].tolist())
        assert got == oracle.colors(strs[i]), strs[i]


def test_debug_invariants_catch_corruption(monkeypatch):
    """VERDICT r1 #7 done-criterion: corrupt a structural contract and see a
    hard error under BFT_DEBUG_INVARIANTS=1 (SURVEY §5 sanitizers row)."""
    import dataclasses

    import jax.numpy as jnp
    import pytest

    from bloomfiltertrie_tpu import ColoredDBG

    k = 27
    dbg = ColoredDBG(small_config(k))
    rng = np.random.default_rng(5)
    dbg.insert_kmer_strings("g0", genome_kmers(random_genome(rng, 200), k))

    monkeypatch.setenv("BFT_DEBUG_INVARIANTS", "1")
    dbg._check_invariants()  # healthy state passes

    # corrupt: point a live row's color_ref outside [0, d)
    bad = dbg.table.color_ref.at[0].set(jnp.int32(dbg.nb_color_classes + 7))
    dbg.table = dataclasses.replace(dbg.table, color_ref=bad)
    with pytest.raises(AssertionError, match="color_ref out of pool range"):
        dbg._check_invariants()

    # corrupt: break sortedness of the key tensor
    dbg2 = ColoredDBG(small_config(k))
    dbg2.insert_kmer_strings("g0", genome_kmers(random_genome(rng, 200), k))
    dbg2.flush()  # corrupt the MERGED table, not the pre-flush empty one
    swapped = dbg2.table.keys.at[0].set(dbg2.table.keys[1]).at[1].set(
        dbg2.table.keys[0])
    dbg2.table = dataclasses.replace(dbg2.table, keys=swapped)
    with pytest.raises(AssertionError, match="not sorted"):
        dbg2._check_invariants()


def test_prefix_matching_with_annotations(built):
    """(k-mer, annotation) prefix delivery — reference
    iterate_over_prefixes (extract_kmers.c:599)."""
    dbg, oracle, _ = built
    for prefix in ["A", "AC", "GG", "TTT"]:
        keys, bms, flags = dbg.prefix_matching(prefix, with_annotations=True)
        kms = codec.decode_strings(keys, dbg.k)
        want = sorted(km for km in oracle.all_kmers() if km.startswith(prefix))
        assert kms == want, prefix
        for i, km in enumerate(kms):
            got = np.nonzero(np.unpackbits(
                bms[i].view(np.uint8), bitorder="little"))[0]
            assert sorted(oracle.colors(km)) == list(got), km
        assert flags.shape == (len(kms),)
        # callback variant agrees
        seen = []
        dbg.iterate_over_prefix(prefix, lambda s, ann, f: seen.append(
            (s, tuple(ann.list_id_genomes()))))
        assert [s for s, _ in seen] == want
        for (s, ids_), km in zip(seen, kms):
            assert list(ids_) == sorted(oracle.colors(km))


def test_window_flush_stress():
    """Multi-genome window flush edge cases vs the oracle: many genomes per
    window, window-boundary flushes, mid-genome buffer-full flushes, keys
    shared by > color_small_width genomes (straight-to-dense and
    small->dense overflow child classes), and interleaved reads.

    Reference semantics being preserved: the per-genome color no-op rule
    (src/retrieveAnnotation.c:278) and insertion-order genome ids
    (src/file_io.c:124-125)."""
    rng = np.random.default_rng(123)
    k = 11
    n_genomes = 70
    # window=32 forces 3 window flushes; tiny buffer forces mid-genome
    # flushes; S=4 makes dense overflow common.
    cfg = small_config(k, genome_window=32, pending_runs=1, batch_size=64,
                      color_small_width=4, treshold_compression=7)
    dbg = ColoredDBG(cfg)
    oracle = OracleBFT(k)

    core = random_genome(rng, 80)              # shared by ALL genomes
    cluster = [random_genome(rng, 60) for _ in range(5)]
    for g in range(n_genomes):
        seq = core + cluster[g % 5] + random_genome(rng, 40)
        kms = genome_kmers(seq, k)
        rng.shuffle(kms)
        kms = kms + kms[:7]                    # in-genome duplicates
        oracle.insert_genome(f"g{g}", kms)
        dbg.insert_kmer_strings(f"g{g}", kms)
        if g in (5, 33):                       # interleaved read barriers
            assert dbg.nb_kmers == len(oracle.all_kmers())

    assert set(dbg.extract_kmer_strings()) == oracle.all_kmers()
    allk = sorted(oracle.all_kmers())
    for km in allk[::5]:
        ann = dbg.get_colors(km)
        got = [1 if ann.presence_genome(j) else 0 for j in range(n_genomes)]
        assert got == oracle.presence_row(km), km
    # dense classes must exist (core k-mers span 70 genomes > S=4)
    assert dbg._dd > 0


def test_iteration_early_termination(built):
    """Reference callback contract (src/bft.c:1051,1096 doc blocks): a
    callback returning 0 stops the walk; a None-returning Python callback
    iterates to the end."""
    dbg, oracle, _ = built
    seen = []
    dbg.iterate_over_kmers(lambda km, ann, fl: (seen.append(km), 0)[1])
    assert len(seen) == 1                      # stopped after the first
    seen2 = []
    dbg.iterate_over_kmers(
        lambda km, ann, fl: (seen2.append(km), len(seen2) < 5)[1])
    assert len(seen2) == 5                     # truthy continues, falsy stops
    seen3 = []
    dbg.iterate_over_kmers(lambda km, ann, fl: seen3.append(km))  # None
    assert set(seen3) == oracle.all_kmers()
    # prefix variant
    pref = sorted(oracle.all_kmers())[0][:1]
    seen4 = []
    dbg.iterate_over_prefix(pref, lambda km, ann, fl: (seen4.append(km), 0)[1])
    assert len(seen4) == 1


def test_neighbors_with_colors(built):
    """Reference get_neighbors (src/bft.c:804): neighbor records carry
    immediately-queryable annotations (src/branchingNode.c:112)."""
    dbg, oracle, _ = built
    kms = sorted(oracle.all_kmers())[:40]
    from bloomfiltertrie_tpu.ops import codec as cdc
    packed, valid = cdc.encode_strings(kms, dbg.k)
    out = dbg.neighbors_with_colors_packed(packed, np.asarray(valid))
    for i, km in enumerate(kms):
        succ = {cdc.decode_strings(out["succ"]["packed"][i, b:b+1], dbg.k)[0]
                for b in range(4) if out["succ"]["found"][i, b]}
        assert succ == set(oracle.successors(km)), km
        pred = {cdc.decode_strings(out["pred"]["packed"][i, b:b+1], dbg.k)[0]
                for b in range(4) if out["pred"]["found"][i, b]}
        assert pred == set(oracle.predecessors(km)), km
        for b in range(4):
            if out["succ"]["found"][i, b]:
                nb = cdc.decode_strings(
                    out["succ"]["packed"][i, b:b+1], dbg.k)[0]
                bm = out["succ"]["bitmap"][i, b]
                got = {g for g in range(dbg.nb_genomes)
                       if (bm[g >> 5] >> np.uint32(g & 31)) & 1}
                assert got == oracle.colors(nb), (km, nb)
    # single-k-mer convenience
    s, p = dbg.neighbors_with_colors(kms[0])
    assert {x[0] for x in s} == set(oracle.successors(kms[0]))
    for nb, ann in s + p:
        assert set(ann.list_id_genomes().tolist()) == oracle.colors(nb)


def test_class_size_stats(built):
    """Reference printMemory.c:68 analogue: per-class-size histogram and
    biggest class, checked against the oracle's color sets."""
    dbg, oracle, _ = built
    dbg.compress_colors()   # histogram of LIVE classes only
    css = dbg.class_size_stats()
    want_sets = {frozenset(oracle.colors(km)) for km in oracle.all_kmers()}
    want_hist = np.bincount([len(s) for s in want_sets])
    assert css["biggest_class"] == max(len(s) for s in want_sets)
    np.testing.assert_array_equal(css["histogram"], want_hist)
    ms = dbg.memory_stats()
    assert ms["biggest_class"] == css["biggest_class"]


def test_query_sequences_batch_matches_per_sequence(built):
    """The one-program batched scorer (VERDICT r4 #4) must agree with the
    per-sequence path (and hence the oracle) for every (threshold,
    canonical) combination, including N-containing, short, and empty
    sequences."""
    dbg, oracle, genomes = built
    rng = np.random.default_rng(15)
    seqs = [genomes["g0"][20:90],
            genomes["g1"][50:120] + "N" + genomes["g1"][120:150],
            revcomp(genomes["g2"][10:80]),
            random_genome(rng, 70),
            "",                       # empty -> all-zero row
            "ACGT",                   # shorter than k -> all-zero row
            genomes["g0"]]
    for thr in (0.4, 0.8, 1.0):
        for canon in (False, True):
            rows = dbg.query_sequences_batch(seqs, thr, canon)
            assert rows.shape == (len(seqs), dbg.nb_genomes)
            for i, seq in enumerate(seqs):
                want = np.zeros((dbg.nb_genomes,), np.uint8)
                want[dbg.query_sequence(seq, thr, canon)] = 1
                assert (rows[i] == want).all(), (i, thr, canon)


def test_query_sequences_batch_blocking(built):
    """Tiny max_windows forces multi-block scoring; results unchanged."""
    dbg, oracle, genomes = built
    seqs = [genomes["g0"][i:i + 40] for i in range(0, 200, 13)]
    a = dbg.query_sequences_batch(seqs, 0.7, False)
    b = dbg.query_sequences_batch(seqs, 0.7, False, max_windows=32)
    assert (a == b).all()


def test_query_sequences_batch_block_aligned(built):
    """Long average sequences pick the 64-row count block; ragged lengths
    (incl. non-multiples of 64 and an empty row) must still match the
    per-sequence path exactly — the block padding contributes zero."""
    from bloomfiltertrie_tpu.models.cdbg import _seq_block_size
    dbg, oracle, genomes = built
    seqs = [genomes["g0"] + genomes["g1"],        # long, odd window count
            genomes["g2"][: 37 + dbg.k - 1],      # 37 windows (not 64-mult)
            "",                                    # empty
            genomes["g1"] + genomes["g1"][::-1] + genomes["g0"]]
    assert _seq_block_size(dbg.k, seqs) == 64
    rows = dbg.query_sequences_batch(seqs, 0.6, False)
    for i, seq in enumerate(seqs):
        want = np.zeros((dbg.nb_genomes,), np.uint8)
        want[dbg.query_sequence(seq, 0.6, False)] = 1
        assert (rows[i] == want).all(), i


def _distinct_kmers(rng, k, n):
    """n distinct random k-mers (as strings)."""
    out = set()
    while len(out) < n:
        out.add(random_genome(rng, k))
    return sorted(out)


def test_flush_speculative_mispredict_fallback():
    """The speculative stage-B flush must fall back EXACTLY on mispredicts.

    Window 1 is duplicate-heavy and tiny (5 genomes x the same 200 k-mers),
    so the next flush predicts a small head count (h = 1024) and takes the
    split A1/A2 path.  Window 2 holds 1,300 distinct keys — n_heads > h
    forces the exact A2 rerun (with its n_pairs re-sync) — and overflows
    the initial table capacity, so the table-headroom check also rejects
    the speculative stage B.  Oracle equality proves the fallback path is
    bit-exact; a rerun with BFT_SPEC_FLUSH=0 proves speculation never
    changes results.
    """
    rng = np.random.default_rng(31)
    k = 9
    shared = _distinct_kmers(rng, k, 200)
    big = _distinct_kmers(rng, k, 1300)

    def build():
        cfg = small_config(k, initial_capacity=1 << 9,
                           batch_size=256, pending_runs=16,
                           genome_window=32)
        dbg = ColoredDBG(cfg)
        for i in range(5):
            dbg.insert_kmer_strings(f"s{i}", shared)
        dbg.flush()                      # window 1: learns predictions
        dbg.insert_kmer_strings("b0", big)
        dbg.insert_kmer_strings("b1", big[:900])
        dbg.flush()                      # window 2: h + headroom mispredict
        return dbg

    oracle = OracleBFT(k)
    for i in range(5):
        oracle.insert_genome(f"s{i}", shared)
    oracle.insert_genome("b0", big)
    oracle.insert_genome("b1", big[:900])

    dbg = build()
    assert set(dbg.extract_kmer_strings()) == oracle.all_kmers()
    probe = shared[:40] + big[:40] + big[1200:]
    for km in probe:
        got = set(dbg.get_colors(km).list_id_genomes().tolist())
        assert got == oracle.colors(km), km

    import os
    os.environ["BFT_SPEC_FLUSH"] = "0"
    try:
        dbg_off = build()
    finally:
        del os.environ["BFT_SPEC_FLUSH"]
    assert set(dbg_off.extract_kmer_strings()) == oracle.all_kmers()
    for km in probe:
        a = set(dbg_off.get_colors(km).list_id_genomes().tolist())
        b = set(dbg.get_colors(km).list_id_genomes().tolist())
        assert a == b, km
