"""File-format byte-level tests (reference interop formats, SURVEY §3)."""

import numpy as np
import pytest

from bloomfiltertrie_tpu.ops import codec
from bloomfiltertrie_tpu.utils import drivers, kmer_io


@pytest.mark.parametrize("k", [9, 27, 31, 63])
def test_comp_file_roundtrip(tmp_path, k):
    rng = np.random.default_rng(0)
    strs = ["".join(rng.choice(list("ACGT"), size=k)) for _ in range(37)]
    packed, _ = codec.encode_strings(strs, k)
    path = str(tmp_path / "x.kmers_comp")
    kmer_io.write_kmer_file_comp(path, packed, k)
    with open(path, "rb") as f:
        assert f.readline() == f"{k}\n".encode()
        assert f.readline() == b"37\n"
        body = f.read()
    assert len(body) == 37 * kmer_io.disk_bytes_per_kmer(k)
    packed2, valid = kmer_io.read_kmer_file_comp(path, k)
    assert valid.all()
    np.testing.assert_array_equal(packed, packed2)


def test_disk_byte_layout_lsb_first():
    """Byte layout must match the reference MASK_INSERT packing
    (src/fasta.c:3): base j in byte j//4 at bit 2*(j%4)."""
    packed, _ = codec.encode_strings(["ACGTACGTA"], 9)
    raw = kmer_io.codes_to_disk(codec.unpack_words(packed, 9), 9)[0]
    # A=00 C=01 G=10 T=11 LSB-first: "ACGT" -> 0b11100100 = 0xE4
    assert raw[0] == 0xE4
    assert raw[1] == 0xE4
    assert raw[2] == 0x00  # trailing 'A' + padding
    # reference kmer_comp_to_ascii round trip equivalence
    codes = kmer_io.disk_to_codes(raw[None, :], 9)
    assert codec.decode_strings(codec.pack_codes(codes, 9), 9) == ["ACGTACGTA"]


def test_ascii_file_roundtrip(tmp_path):
    k = 27
    rng = np.random.default_rng(1)
    strs = ["".join(rng.choice(list("ACGT"), size=k)) for _ in range(20)]
    path = str(tmp_path / "x.kmers")
    packed, _ = codec.encode_strings(strs, k)
    kmer_io.write_kmer_file_ascii(path, packed, k)
    assert open(path).read() == "".join(s + "\n" for s in strs)
    packed2, valid = kmer_io.read_kmer_file_ascii(path, k)
    assert valid.all()
    np.testing.assert_array_equal(packed, packed2)


def test_ascii_reader_skips_and_flags(tmp_path):
    k = 9
    path = str(tmp_path / "x.kmers")
    with open(path, "w") as f:
        f.write("ACGTACGTA 12\n")      # trailing count ignored
        f.write("ACGTNCGTA\n")          # IUPAC -> invalid
        f.write("SHORT\n")              # too short -> dropped
        f.write("acgtacgta\n")          # lowercase ok
    packed, valid = kmer_io.read_kmer_file_ascii(path, k)
    assert packed.shape[0] == 3
    assert valid.tolist() == [True, False, True]


def test_csv_quirk(tmp_path):
    path = str(tmp_path / "o.csv")
    rows = np.array([[1, 0, 1], [0, 0, 0]], dtype=np.uint8)
    drivers._write_csv(path, ["a", "b", "c"], rows)
    raw = open(path, "rb").read()
    assert raw == b"a,b,c\n1,0,1\n0,0,0\0"


def test_csv_quirk_empty_rows(tmp_path):
    """With zero queries the reference still overwrites the last newline."""
    path = str(tmp_path / "o.csv")
    drivers._write_csv(path, ["a", "b"],
                       np.zeros((0, 2), dtype=np.uint8))
    assert open(path, "rb").read() == b"a,b\0"


def test_pipelined_ingest_matches_sequential(tmp_path):
    """insert_genomes_pipelined == sequential driver (PP ingest overlap)."""
    import numpy as np
    from bloomfiltertrie_tpu import BFTConfig, ColoredDBG
    from bloomfiltertrie_tpu.utils import drivers
    rng = np.random.default_rng(8)
    k = 27
    paths = []
    for i in range(3):
        seq = "".join(rng.choice(list("ACGT"), size=300))
        kms = [seq[j:j + k] for j in range(len(seq) - k + 1)]
        p = tmp_path / f"g{i}.kmers"
        p.write_text("\n".join(kms) + "\n")
        paths.append(str(p))
    cfg = BFTConfig(k=k, initial_capacity=1 << 8,
                    initial_color_capacity=1 << 6, bloom_log2_bits=12,
                    batch_size=128)
    a, b = ColoredDBG(cfg), ColoredDBG(cfg)
    drivers.insert_genomes(a, paths, "kmers", verbose=False)
    drivers.insert_genomes_pipelined(b, paths, "kmers", verbose=False)
    np.testing.assert_array_equal(a.extract_kmers_packed(),
                                  b.extract_kmers_packed())
    assert a.genome_names == b.genome_names
    qs, qv = None, None
    import bloomfiltertrie_tpu.ops.codec as codec
    qs, qv = codec.encode_strings(
        [open(paths[0]).read().split()[0]], k)
    fa, ba = a.query_kmers_packed(qs, qv), b.query_kmers_packed(qs, qv)
    np.testing.assert_array_equal(fa[1], ba[1])


def test_phase_timer_and_trace_noop():
    from bloomfiltertrie_tpu.utils.profiling import PhaseTimer, trace
    t = PhaseTimer()
    with t.phase("x"):
        pass
    with t.phase("x"):
        pass
    assert t.counts["x"] == 2 and "x:" in t.report()
    with trace(None):  # no dir configured -> no-op
        pass
