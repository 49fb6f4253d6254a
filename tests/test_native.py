"""Native C++ parser vs the NumPy codec (must agree bit-for-bit)."""

import numpy as np
import pytest

from bloomfiltertrie_tpu import native
from bloomfiltertrie_tpu.ops import codec

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


@pytest.mark.parametrize("k", [9, 27, 31, 32, 63])
def test_parse_kmer_lines_matches_numpy(k):
    rng = np.random.default_rng(0)
    lines = []
    for _ in range(50):
        lines.append("".join(rng.choice(list("ACGT"), size=k)))
    lines.append("ACGTN" + "A" * (k - 5))       # IUPAC -> invalid
    lines.append("acgt" * ((k + 3) // 4))       # lowercase
    lines.append(lines[0] + " 42")              # trailing count ignored
    lines.append("TOOSHORT")                    # dropped
    data = ("\n".join(lines) + "\n").encode()
    got_p, got_v = native.parse_kmer_lines(data, k)

    kept = [l[:k] for l in lines if len(l.split()[0] if " " in l else l) >= k
            and len(l) >= k]
    want_p, want_v = codec.encode_strings(kept, k)
    np.testing.assert_array_equal(got_v, want_v)
    np.testing.assert_array_equal(got_p, want_p)


@pytest.mark.parametrize("k", [9, 27, 31, 32, 63])
def test_kmerize_sequence_matches_numpy(k):
    rng = np.random.default_rng(1)
    seq = "".join(rng.choice(list("ACGTN"), size=500, p=[.24, .24, .24, .24, .04]))
    got_p, got_v = native.kmerize_sequence(seq.encode(), k)
    want_p, want_v = codec.kmerize_sequence(seq.encode(), k)
    np.testing.assert_array_equal(got_v, want_v)
    np.testing.assert_array_equal(got_p, want_p)


def test_fasta_extract():
    data = b">seq1 desc\nACGT\nACGT\n>seq2\nTTTT\n>empty\n>seq3\nGG\nGG\n"
    seqs = native.fasta_sequences(data)
    assert [s.tobytes() for s in seqs] == [b"ACGTACGT", b"TTTT", b"", b"GGGG"]


def test_native_throughput_sane():
    """The native k-merizer should beat the numpy path comfortably."""
    import time
    k = 31
    rng = np.random.default_rng(2)
    seq = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=2_000_000)
    sb = seq.tobytes()
    t0 = time.perf_counter(); native.kmerize_sequence(sb, k); t_nat = time.perf_counter() - t0
    t0 = time.perf_counter(); codec.kmerize_sequence(sb, k); t_np = time.perf_counter() - t0
    # informational, no hard assert on CI-variance; just sanity floor
    assert t_nat < t_np * 2.0
