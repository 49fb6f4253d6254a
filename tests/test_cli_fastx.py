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
