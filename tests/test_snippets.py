import numpy as np
import pytest

from bloomfiltertrie_tpu import BFTConfig, ColoredDBG
from bloomfiltertrie_tpu.models import snippets
from bloomfiltertrie_tpu.ops import codec

from oracle import OracleBFT


def small_config(k):
    return BFTConfig(k=k, initial_capacity=1 << 8,
                     initial_color_capacity=1 << 6, bloom_log2_bits=12,
                     batch_size=128)


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(17)
    k = 9
    base = "".join(rng.choice(list("ACGT"), size=300))
    other = "".join(rng.choice(list("ACGT"), size=120))  # separate component(s)
    genomes = {
        "g0": [base[:200]],
        "g1": [base[100:300], other],
    }
    dbg = ColoredDBG(small_config(k))
    oracle = OracleBFT(k)
    for name, seqs in genomes.items():
        kms = [s[i:i + k] for s in seqs for i in range(len(s) - k + 1)]
        dbg.insert_kmer_strings(name, kms)
        oracle.insert_genome(name, kms)
    return dbg, oracle


def test_core_dispensable_singleton(built):
    dbg, oracle = built
    core = set(codec.decode_strings(snippets.extract_core_kmers(dbg), dbg.k))
    disp = set(codec.decode_strings(snippets.extract_dispensable_kmers(dbg), dbg.k))
    single = set(codec.decode_strings(snippets.extract_singleton_kmers(dbg), dbg.k))
    g = dbg.nb_genomes
    assert core == {km for km in oracle.all_kmers()
                    if len(oracle.colors(km)) == g}
    assert disp == {km for km in oracle.all_kmers()
                    if len(oracle.colors(km)) < g}
    assert single == {km for km in oracle.all_kmers()
                      if len(oracle.colors(km)) == 1}
    assert core | disp == oracle.all_kmers()


def test_simple_paths_cover_graph(built):
    dbg, oracle = built
    paths = snippets.extract_simple_paths(dbg)
    k = dbg.k
    covered = []
    for p in paths:
        assert len(p) >= k
        covered.extend(p[i:i + k] for i in range(len(p) - k + 1))
    # every k-mer covered exactly once
    assert len(covered) == len(set(covered)) == len(oracle.all_kmers())
    assert set(covered) == oracle.all_kmers()
    # interior path vertices are non-branching
    for p in paths:
        for i in range(1, len(p) - k):
            km = p[i:i + k]
            assert len(oracle.successors(km)) == 1
            assert len(oracle.predecessors(km)) == 1


def _component_of(oracle, start):
    seen = {start}
    stack = [start]
    while stack:
        km = stack.pop()
        for nb in oracle.successors(km) + oracle.predecessors(km):
            if nb not in seen:
                seen.add(nb)
                stack.append(nb)
    return seen


def test_bfs(built):
    dbg, oracle = built
    start = sorted(oracle.all_kmers())[0]
    order = snippets.bfs(dbg, start)
    assert order[0] == start
    assert len(order) == len(set(order))
    assert set(order) == _component_of(oracle, start)
    assert snippets.bfs(dbg, "A" * dbg.k) == [] or "A" * dbg.k in oracle.all_kmers()


def test_dfs(built):
    dbg, oracle = built
    start = sorted(oracle.all_kmers())[0]
    order = snippets.dfs(dbg, start)
    assert set(order) == _component_of(oracle, start)
    assert len(order) == len(set(order))


def test_connected_components(built):
    dbg, oracle = built
    want = 0
    seen = set()
    for km in oracle.all_kmers():
        if km not in seen:
            seen |= _component_of(oracle, km)
            want += 1
    assert snippets.nb_connected_components(dbg) == want


def test_connected_components_two_islands():
    k = 5
    dbg = ColoredDBG(small_config(k))
    # chain ACGTA->CGTAC plus an isolated GGGGG: deterministically 2 components
    dbg.insert_kmer_strings("g", ["ACGTA", "CGTAC", "GGGGG"])
    assert snippets.nb_connected_components(dbg) == 2


def test_traversal_visits_all(built):
    dbg, oracle = built
    order = snippets.cdbg_traversal(dbg)
    assert len(order) == len(oracle.all_kmers())
    assert set(order) == oracle.all_kmers()


def test_unitig_isolated_cycle():
    """An isolated cycle must be emitted exactly once, cut at one vertex."""
    k = 5
    dbg = ColoredDBG(small_config(k))
    # cycle: ACGTA -> CGTAC -> GTACG -> TACGT -> ACGTA  (rotations of ACGT A)
    cyc = ["ACGTA", "CGTAC", "GTACG", "TACGT"]
    dbg.insert_kmer_strings("g", cyc)
    paths = snippets.extract_simple_paths(dbg)
    covered = [p[i:i + k] for p in paths for i in range(len(p) - k + 1)]
    assert sorted(covered) == sorted(cyc)
    assert len(paths) == 1


def test_unitig_self_loop():
    k = 5
    dbg = ColoredDBG(small_config(k))
    dbg.insert_kmer_strings("g", ["AAAAA", "AAAAC"])  # AAAAA loops on itself
    paths = snippets.extract_simple_paths(dbg)
    covered = [p[i:i + k] for p in paths for i in range(len(p) - k + 1)]
    assert sorted(covered) == ["AAAAA", "AAAAC"]


def test_bfs_color_restricted(built):
    dbg, oracle = built
    start = sorted(km for km in oracle.all_kmers()
                   if 0 in oracle.colors(km))[0]
    order = snippets.bfs(dbg, start, genome_id=0)
    assert order[0] == start
    assert len(order) == len(set(order))
    # every visited k-mer (except possibly the start) carries color 0
    for km in order[1:]:
        assert 0 in oracle.colors(km), km
    # oracle: reachability within the color-0 subgraph
    seen = {start}
    stack = [start]
    while stack:
        km = stack.pop()
        for nb in oracle.successors(km) + oracle.predecessors(km):
            if nb not in seen and 0 in oracle.colors(nb):
                seen.add(nb)
                stack.append(nb)
    assert set(order) == seen


def test_graph_algorithms_scale_smoke():
    """Unitigs + components on a ~60k-k-mer graph complete quickly on the
    CPU backend (the TPU path is the same code at 1M+; see BASELINE.md)."""
    rng = np.random.default_rng(99)
    k = 31
    seqs = ["".join(rng.choice(list("ACGT"), size=20000)) for _ in range(3)]
    cfg = BFTConfig(k=k, initial_capacity=1 << 17,
                    initial_color_capacity=1 << 8, bloom_log2_bits=16,
                    batch_size=1 << 15)
    dbg = ColoredDBG(cfg)
    for i, s in enumerate(seqs):
        kms = [s[j:j + k] for j in range(len(s) - k + 1)]
        dbg.insert_kmer_strings(f"g{i}", kms)
    n = dbg.nb_kmers
    assert n > 55000
    paths = snippets.extract_simple_paths(dbg)
    assert sum(len(p) - k + 1 for p in paths) == n
    assert snippets.nb_connected_components(dbg) >= 1
