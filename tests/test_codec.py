import numpy as np
import pytest

from bloomfiltertrie_tpu.ops import codec


def rand_kmers(rng, n, k):
    return rng.choice(list("ACGT"), size=(n, k))


@pytest.mark.parametrize("k", [9, 16, 27, 31, 32, 45, 63, 126])
def test_roundtrip(k):
    rng = np.random.default_rng(0)
    strs = ["".join(r) for r in rand_kmers(rng, 64, k)]
    packed, valid = codec.encode_strings(strs, k)
    assert valid.all()
    assert codec.decode_strings(packed, k) == strs


def test_invalid_chars_rejected():
    packed, valid = codec.encode_strings(["ACGTN" + "A" * 4, "ACGTACGTA"], 9)
    assert not valid[0] and valid[1]
    assert (packed[0] == 0).all()  # invalid rows zeroed


def test_lowercase_accepted():
    p1, v1 = codec.encode_strings(["acgtacgta"], 9)
    p2, v2 = codec.encode_strings(["ACGTACGTA"], 9)
    assert v1.all() and (p1 == p2).all()


@pytest.mark.parametrize("k", [9, 27, 32, 63])
def test_lex_order_preserved(k):
    """Packed word-tuple order must equal string order (the core invariant)."""
    rng = np.random.default_rng(1)
    strs = ["".join(r) for r in rand_kmers(rng, 200, k)]
    packed, _ = codec.encode_strings(strs, k)
    order_str = np.argsort(np.array(strs))
    # lexsort by words, last word least significant
    order_words = np.lexsort(tuple(packed[:, w] for w in reversed(range(packed.shape[1]))))
    assert (np.array(strs)[order_str] == np.array(strs)[order_words]).all()


@pytest.mark.parametrize("k", [9, 27, 31, 63])
def test_revcomp_and_canonical(k):
    rng = np.random.default_rng(2)
    strs = ["".join(r) for r in rand_kmers(rng, 100, k)]
    packed, _ = codec.encode_strings(strs, k)
    rc = codec.revcomp_packed(packed, k)
    comp = str.maketrans("ACGT", "TGCA")
    expect = [s.translate(comp)[::-1] for s in strs]
    assert codec.decode_strings(rc, k) == expect
    canon = codec.canonical_packed(packed, k)
    expect_canon = [min(s, e) for s, e in zip(strs, expect)]
    assert codec.decode_strings(canon, k) == expect_canon


def test_kmerize_sequence():
    k = 5
    seq = b"ACGTANCGTAC"
    packed, valid = codec.kmerize_sequence(seq, k)
    assert packed.shape[0] == len(seq) - k + 1
    # windows overlapping the N are invalid
    expect_valid = [False if "N" in seq.decode()[i:i + k] else True
                    for i in range(len(seq) - k + 1)]
    assert valid.tolist() == expect_valid
    got = codec.decode_strings(packed[valid], k)
    expect = [seq.decode()[i:i + k]
              for i in range(len(seq) - k + 1) if expect_valid[i]]
    assert got == expect


def test_has_iupac():
    assert codec.has_iupac(b"ACGTNACGT")
    assert not codec.has_iupac(b"ACGTACGT")
