"""Sequence-parallel k-merization (halo exchange over the mesh)."""

import numpy as np
import pytest

from bloomfiltertrie_tpu.ops import codec
from bloomfiltertrie_tpu.parallel.seqpar import kmerize_sequence_sharded
from bloomfiltertrie_tpu.parallel.sharded import make_mesh


@pytest.mark.parametrize("n_dev", [2, 8])
@pytest.mark.parametrize("k", [9, 27, 63])
def test_matches_host_kmerization(n_dev, k):
    rng = np.random.default_rng(k * n_dev)
    seq = "".join(rng.choice(list("ACGTN"), size=500,
                             p=[0.24, 0.24, 0.24, 0.24, 0.04])).encode()
    mesh = make_mesh(n_dev)
    packed_s, valid_s = kmerize_sequence_sharded(seq, k, mesh)
    packed_h, valid_h = codec.kmerize_sequence(seq, k)
    n_windows = len(seq) - k + 1
    # sharded output covers every window in order (plus padded tail rows)
    assert packed_s.shape[0] >= n_windows
    np.testing.assert_array_equal(valid_s[:n_windows], valid_h)
    assert not valid_s[n_windows:].any()
    np.testing.assert_array_equal(packed_s[:n_windows][valid_h],
                                  packed_h[valid_h])


def test_short_sequence_single_window():
    mesh = make_mesh(4)
    seq = b"ACGTACGTA"
    packed_s, valid_s = kmerize_sequence_sharded(seq, 9, mesh)
    packed_h, valid_h = codec.kmerize_sequence(seq, 9)
    assert valid_s.sum() == 1
    np.testing.assert_array_equal(packed_s[:1], packed_h)


def test_feeds_sharded_insert():
    from bloomfiltertrie_tpu import BFTConfig
    from bloomfiltertrie_tpu.parallel.sharded import ShardedCDBG
    rng = np.random.default_rng(3)
    k = 27
    seq = "".join(rng.choice(list("ACGT"), size=800)).encode()
    mesh = make_mesh(4)
    packed, valid = kmerize_sequence_sharded(seq, k, mesh)
    cfg = BFTConfig(k=k, initial_capacity=1 << 8,
                    initial_color_capacity=1 << 6, bloom_log2_bits=12,
                    batch_size=512)
    dbg = ShardedCDBG(cfg, mesh=mesh)
    dbg.insert_genome("g0", packed, valid)
    s = seq.decode()
    want = {s[i:i + k] for i in range(len(s) - k + 1)}
    assert set(dbg.extract_kmer_strings()) == want
