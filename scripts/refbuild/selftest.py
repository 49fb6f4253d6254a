"""Self-test of the reference-build harness: shim-built `bft` vs the oracle.

Fast (<1 min) proof that the binary scripts/refbuild/build.sh produces is
faithful: builds a small 3-genome dataset, runs every CLI mode the equality
contract covers (build, -query_kmers, -query_branching, -extract_kmers,
load -add_genomes), and checks the outputs against the Python oracle
(tests/oracle.py — the reference's observable semantics).  The full-scale
head-to-head against OUR engine is scripts/compare_reference.py (which
auto-invokes build.sh too).

Usage: python scripts/refbuild/selftest.py
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np  # noqa: E402

BASE = "/tmp/refbuild_selftest"
BFT = "/tmp/refbuild/bft"
K = 27


def log(m):
    print(m, file=sys.stderr, flush=True)


def ensure_binary():
    if not os.path.exists(BFT):
        log("building reference bft via scripts/refbuild/build.sh ...")
        subprocess.run(
            ["bash", os.path.join(REPO, "scripts", "refbuild", "build.sh")],
            check=True, capture_output=True)
    assert os.path.exists(BFT)


def make_dataset():
    os.makedirs(BASE, exist_ok=True)
    rng = np.random.default_rng(5)
    alpha = np.array(list("ACGT"))
    base = rng.integers(0, 4, size=3000)
    genomes = {}
    for i in range(3):
        seq = base.copy()
        pos = rng.choice(len(seq), size=30, replace=False)
        seq[pos] = (seq[pos] + rng.integers(1, 4, size=30)) % 4
        genomes[f"g{i}.kmers"] = "".join(alpha[seq])
    paths = []
    for name, s in genomes.items():
        p = os.path.join(BASE, name)
        kms = [s[i:i + K] for i in range(len(s) - K + 1)]
        open(p, "w").write("\n".join(kms) + "\n")
        paths.append(p)
    open(os.path.join(BASE, "list2.txt"), "w").write("\n".join(paths[:2]) + "\n")
    open(os.path.join(BASE, "list1.txt"), "w").write(paths[2] + "\n")
    # query file: k-mers of genome 0 + some absent random k-mers
    q = [genomes["g0.kmers"][i:i + K] for i in range(0, 500, 7)]
    q += ["".join(rng.choice(list("ACGT"), size=K)) for _ in range(40)]
    open(os.path.join(BASE, "queries.kmers"), "w").write("\n".join(q) + "\n")
    open(os.path.join(BASE, "qlist.txt"), "w").write(
        os.path.join(BASE, "queries.kmers") + "\n")
    return paths, q


def main():
    ensure_binary()
    paths, queries = make_dataset()

    from oracle import OracleBFT
    oracle = OracleBFT(K)
    for p in paths[:2]:
        oracle.insert_genome(os.path.basename(p), open(p).read().split())

    # build 2 genomes + query + branching + extract
    out = subprocess.run(
        [BFT, "build", str(K), "kmers", os.path.join(BASE, "list2.txt"),
         os.path.join(BASE, "idx2"),
         "-query_kmers", "kmers", os.path.join(BASE, "qlist.txt"),
         "-query_branching", "kmers", os.path.join(BASE, "qlist.txt"),
         "-extract_kmers", "kmers", os.path.join(BASE, "ext2.kmers")],
        cwd=BASE, capture_output=True, text=True, check=True).stdout

    ext = set(open(os.path.join(BASE, "ext2.kmers")).read().split())
    assert ext == oracle.all_kmers(), "extract: k-mer set mismatch"

    raw = open(os.path.join(BASE, "queries.csv"), "rb").read()
    assert raw[-1:] == b"\0", "CSV must end with NUL (file_io.c:706-719)"
    lines = raw[:-1].decode().split("\n")
    assert lines[0] == "g0.kmers,g1.kmers"
    for q, row in zip(queries, lines[1:]):
        assert [int(x) for x in row.split(",")] == oracle.presence_row(q), \
            f"query row mismatch for {q}"

    # "Nb branching k-mers = N" (src/file_io.c:1019)
    branch_lines = [l for l in out.splitlines()
                    if "branching" in l.lower() and "=" in l]
    got = int(branch_lines[0].split("=")[-1].strip(" ."))
    want = oracle.branching_count(queries)
    assert got == want, f"branching {got} != oracle {want}"

    # load + add_genomes (exercises both patched upstream bugs)
    oracle.insert_genome(os.path.basename(paths[2]),
                         open(paths[2]).read().split())
    subprocess.run(
        [BFT, "load", os.path.join(BASE, "idx2"),
         "-add_genomes", "kmers", os.path.join(BASE, "list1.txt"),
         os.path.join(BASE, "idx3"),
         "-query_kmers", "kmers", os.path.join(BASE, "qlist.txt")],
        cwd=BASE, capture_output=True, text=True, check=True)
    raw3 = open(os.path.join(BASE, "queries.csv"), "rb").read()
    lines3 = raw3[:-1].decode().split("\n")
    assert lines3[0] == "g0.kmers,g1.kmers,g2.kmers"
    for q, row in zip(queries, lines3[1:]):
        assert [int(x) for x in row.split(",")] == oracle.presence_row(q), \
            f"post-add query row mismatch for {q}"

    log(f"refbuild selftest OK: {len(ext)} k-mers, "
        f"{len(queries)} queries byte-checked, branching={got}, "
        "load -add_genomes verified")


if __name__ == "__main__":
    main()
