"""CLI fastx build path (active equivalent of the reference's commented
FASTx ingest, src/file_io.c:277-318)."""

import numpy as np

from bloomfiltertrie_tpu import ColoredDBG, cli

from oracle import OracleBFT


def test_build_from_fasta(tmp_path):
    rng = np.random.default_rng(61)
    k = 27
    seqs = ["".join(rng.choice(list("ACGT"), size=400)) for _ in range(2)]
    fa = tmp_path / "g0.fa"
    fa.write_text(f">r0 desc\n{seqs[0][:200]}\n{seqs[0][200:]}\n"
                  f">r1\n{seqs[1]}\nNNN\n")
    lst = tmp_path / "list.txt"
    lst.write_text(str(fa) + "\n")
    out = tmp_path / "idx"
    rc = cli.main(["build", str(k), "fastx", str(lst), str(out),
                   "-extract_kmers", "kmers", str(tmp_path / "ext.kmers")])
    assert rc == 0
    oracle = OracleBFT(k)
    kms = [s[i:i + k] for s in seqs for i in range(len(s) - k + 1)]
    oracle.insert_genome("g0.fa", kms)
    got = set((tmp_path / "ext.kmers").read_text().split())
    assert got == oracle.all_kmers()
    # reload works and colors are genome 0
    dbg = ColoredDBG.load(str(out))
    assert dbg.genome_names == ["g0.fa"]
    ann = dbg.get_colors(kms[0])
    assert ann.list_id_genomes().tolist() == [0]


def test_fastq_build_matches_fasta(tmp_path):
    """FASTQ ingest (kseq.h:168 handles both formats; now we do too)."""
    rng = np.random.default_rng(71)
    k = 27
    reads = ["".join(rng.choice(list("ACGT"), size=90)) for _ in range(30)]
    fq = tmp_path / "g0.fastq"
    recs = []
    for i, r in enumerate(reads):
        # quality line starts with '@' / '+' on purpose: must not be
        # mistaken for a header/separator (length-matched consumption)
        qual = "@" + "+" * 40 + "I" * (len(r) - 41)
        recs.append(f"@read{i} extra\n{r}\n+\n{qual}\n")
    fq.write_text("".join(recs))
    lst = tmp_path / "list.txt"
    lst.write_text(str(fq) + "\n")
    out = tmp_path / "idx"
    rc = cli.main(["build", str(k), "fastx", str(lst), str(out),
                   "-extract_kmers", "kmers", str(tmp_path / "ext.kmers")])
    assert rc == 0
    oracle = OracleBFT(k)
    kms = [r[i:i + k] for r in reads for i in range(len(r) - k + 1)]
    oracle.insert_genome("g0.fastq", kms)
    got = set((tmp_path / "ext.kmers").read_text().split())
    assert got == oracle.all_kmers()


def test_stream_chunk_boundaries_equivalent(tmp_path):
    """Tiny chunk sizes must yield the same k-mer multiset as whole-file
    parsing: the (k-1)-base carry (file_io.c:277-318) never loses or
    duplicates a window."""
    from bloomfiltertrie_tpu.utils import kmer_io
    rng = np.random.default_rng(73)
    k = 15
    # one long multi-line record + several short ones + an N island
    long_seq = "".join(rng.choice(list("ACGT"), size=5000))
    fa = tmp_path / "mix.fa"
    lines = [long_seq[i:i + 61] for i in range(0, len(long_seq), 61)]
    body = ">long\n" + "\n".join(lines) + "\n"
    body += ">short\nACGTACGTACGTACG\n"
    body += ">withN\n" + long_seq[:40] + "N" + long_seq[40:80] + "\n"
    fa.write_text(body)
    ref_p, ref_v = kmer_io.read_fastx_file(str(fa), k)
    for chunk in (17, 64, 1 << 12):
        p, v = kmer_io.read_fastx_file(str(fa), k, chunk_bytes=chunk)
        assert p[v].shape == ref_p[ref_v].shape, chunk
        assert (np.sort(p[v].view(np.uint8).reshape(v.sum(), -1), axis=0)
                == np.sort(ref_p[ref_v].view(np.uint8).reshape(
                    ref_v.sum(), -1), axis=0)).all(), chunk


def test_fastq_multiline_and_stream(tmp_path):
    from bloomfiltertrie_tpu.utils import kmer_io
    k = 11
    seq = "ACGTACGTACGTACGTACGTACGT"  # 24 bases over 2 lines
    fq = tmp_path / "m.fastq"
    fq.write_text("@r0\n" + seq[:12] + "\n" + seq[12:] + "\n+\n"
                  + "I" * 12 + "\n" + "I" * 12 + "\n"
                  + "@r1\nACGTTTTTACGTT\n+\nIIIIIIIIIIIII\n")
    p, v = kmer_io.read_fastx_file(str(fq), k, chunk_bytes=8)
    from bloomfiltertrie_tpu.ops import codec
    kms = set(codec.decode_strings(p[v], k))
    want = {seq[i:i + k] for i in range(len(seq) - k + 1)}
    want |= {"ACGTTTTTACGTT"[i:i + k] for i in range(3)}
    assert kms == want


def test_threaded_fastx_equals_serial(tmp_path):
    """VERDICT r3 #8: the threaded FastxStream (worker pool over carry-
    correct fragments, in-order yield) must produce the exact single-thread
    stream — FASTA and FASTQ, multi-line records, tiny chunks forcing many
    carry joins (reference streaming model kseq.h:168)."""
    import numpy as np
    from bloomfiltertrie_tpu.utils.kmer_io import FastxStream
    rng = np.random.default_rng(17)
    k = 31
    fa = tmp_path / "t.fa"
    with open(fa, "wb") as f:
        for i in range(40):
            f.write(f">r{i} desc\n".encode())
            L = int(rng.integers(5, 3000))
            seq = rng.choice(list(b"ACGTN"), p=[.24, .24, .24, .24, .04],
                             size=L).astype(np.uint8)
            for off in range(0, L, 57):
                f.write(seq[off:off + 57].tobytes() + b"\n")
    fq = tmp_path / "t.fq"
    with open(fq, "wb") as f:
        for i in range(40):
            L = int(rng.integers(5, 500))
            seq = rng.choice(list(b"ACGT"), size=L).astype(np.uint8)
            f.write(f"@r{i}\n".encode() + seq.tobytes() + b"\n+\n"
                    + b"@" * L + b"\n")   # '@' quality bytes must not confuse
    for path in (fa, fq):
        for chunk in (1 << 10, 1 << 14):
            s = FastxStream(str(path), k, chunk_bytes=chunk,
                            threads=1).read_all()
            t = FastxStream(str(path), k, chunk_bytes=chunk,
                            threads=7).read_all()
            np.testing.assert_array_equal(s[0], t[0])
            np.testing.assert_array_equal(s[1], t[1])


def test_cli_sharded_build_query_byte_equal(tmp_path):
    """--shards N: the pod CLI path (VERDICT r4 #3).  Build + every query
    option through ShardedCDBG on the virtual mesh must produce
    byte-identical outputs to the single-device engine, and the two
    checkpoint formats must cross-load."""
    rng = np.random.default_rng(83)
    k = 27
    genomes = []
    base = "".join(rng.choice(list("ACGT"), size=500))
    for g in range(3):
        mut = list(base)
        for p in rng.integers(0, len(base), 12):
            mut[p] = "ACGT"[rng.integers(0, 4)]
        genomes.append("".join(mut))
    paths = []
    for g, seq in enumerate(genomes):
        p = tmp_path / f"g{g}.kmers"
        kms = [seq[i:i + k] for i in range(len(seq) - k + 1)]
        p.write_text("\n".join(kms) + "\n")
        paths.append(str(p))
    lst = tmp_path / "list.txt"
    lst.write_text("\n".join(paths) + "\n")
    qpath = tmp_path / "q.kmers"
    qkms = [genomes[0][i:i + k] for i in range(0, 100, 3)] + \
           ["".join(rng.choice(list("ACGT"), size=k)) for _ in range(40)]
    qpath.write_text("\n".join(qkms) + "\n")
    qlist = tmp_path / "qlist.txt"
    qlist.write_text(str(qpath) + "\n")
    spath = tmp_path / "s.txt"
    spath.write_text(genomes[1][40:200] + "\n" + genomes[2][:90] + "\n")
    slist = tmp_path / "slist.txt"
    slist.write_text(str(spath) + "\n")

    def run(shards, tag):
        out = tmp_path / f"idx_{tag}"
        args = ["build", str(k), "kmers", str(lst), str(out),
                "-query_kmers", "kmers", str(qlist),
                "-query_sequences", "0.8", "canonical", str(slist),
                "-extract_kmers", "kmers", str(tmp_path / f"ext_{tag}")]
        if shards > 1:
            args = ["--shards", str(shards)] + args
        assert cli.main(args) == 0
        res = {
            "qcsv": (tmp_path / "q.kmers.query_kmers.out").read_bytes(),
            "scsv": (tmp_path / "s.txt.query_sequences.out").read_bytes(),
            "ext": set((tmp_path / f"ext_{tag}").read_text().split()),
        }
        return out, res

    out1, r1 = run(1, "single")
    out4, r4 = run(4, "sharded")
    assert r1["qcsv"] == r4["qcsv"]
    assert r1["scsv"] == r4["scsv"]
    assert r1["ext"] == r4["ext"]

    # cross-load: single engine reads the sharded checkpoint and vice versa
    from bloomfiltertrie_tpu.parallel.sharded import ShardedCDBG, make_mesh
    single_of_sharded = ColoredDBG.load(str(out4) + ".npz")
    sharded_of_single = ShardedCDBG.load(str(out1) + ".npz",
                                         mesh=make_mesh(2))
    assert set(single_of_sharded.extract_kmer_strings()) == r1["ext"]
    assert set(sharded_of_single.extract_kmer_strings()) == r1["ext"]
