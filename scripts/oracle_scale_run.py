"""Real-scale CLI runs vs the Python oracle (BASELINE.md configs 1-4).

Runs on CPU (platform forced before any computation) so it can execute
anywhere; wall times land in BASELINE.md.  Scales: config 1 uses a full
E. coli-sized genome (4.6 Mbp); configs 2-4 use strain mutants / reduced
per-genome sizes noted in the output (CPU is the verification vehicle —
TPU numbers live in bench.py / measure_scale.py).

Usage: python scripts/oracle_scale_run.py [1 2 3 4]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def log(m):
    print(m, file=sys.stderr, flush=True)


BASE_DIR = "/tmp/bft_oracle_scale"
K = 27


def mutate(rng, seq: np.ndarray, rate: float) -> np.ndarray:
    out = seq.copy()
    n_mut = int(len(seq) * rate)
    pos = rng.choice(len(seq), size=n_mut, replace=False)
    out[pos] = (out[pos] + rng.integers(1, 4, size=n_mut)) % 4
    return out


def to_ascii(codes: np.ndarray) -> bytes:
    return np.array([65, 67, 71, 84], dtype=np.uint8)[codes].tobytes()


def write_kmer_file(path: str, seq_ascii: bytes, k: int) -> int:
    """One k-mer per line, every window of the sequence."""
    s = seq_ascii.decode()
    kms = [s[i:i + k] for i in range(len(s) - k + 1)]
    with open(path, "w") as f:
        f.write("\n".join(kms) + "\n")
    return len(kms)


def oracle_from_files(paths, k):
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    from oracle import OracleBFT
    o = OracleBFT(k)
    for p in paths:
        o.insert_genome(os.path.basename(p), open(p).read().split())
    return o


def config1():
    """1 E. coli-sized genome (4.6 Mbp), build + extract, set equality."""
    from bloomfiltertrie_tpu import cli
    rng = np.random.default_rng(1)
    d = os.path.join(BASE_DIR, "c1")
    os.makedirs(d, exist_ok=True)
    seq = rng.integers(0, 4, size=4_600_000, dtype=np.uint8)
    g = os.path.join(d, "ecoli.kmers")
    n_kmers = write_kmer_file(g, to_ascii(seq), K)
    open(os.path.join(d, "list.txt"), "w").write(g + "\n")
    t0 = time.monotonic()
    rc = cli.main(["build", str(K), "kmers", os.path.join(d, "list.txt"),
                   os.path.join(d, "idx"),
                   "-extract_kmers", "kmers", os.path.join(d, "ext.kmers")])
    dt = time.monotonic() - t0
    assert rc == 0
    got = open(os.path.join(d, "ext.kmers")).read().split()
    want = set(open(g).read().split())
    assert len(got) == len(set(got)) and set(got) == want
    print(json.dumps({"config": 1, "k": K, "kmers_in": n_kmers,
                      "distinct": len(want), "build_extract_s": round(dt, 1),
                      "equal": True}), flush=True)


def config2():
    """3 strains (1%% mutants), -query_kmers + -query_branching CSV parity."""
    from bloomfiltertrie_tpu import cli
    rng = np.random.default_rng(2)
    d = os.path.join(BASE_DIR, "c2")
    os.makedirs(d, exist_ok=True)
    base = rng.integers(0, 4, size=1_000_000, dtype=np.uint8)
    paths = []
    for i in range(3):
        s = base if i == 0 else mutate(rng, base, 0.01)
        p = os.path.join(d, f"strain{i}.kmers")
        write_kmer_file(p, to_ascii(s), K)
        paths.append(p)
    open(os.path.join(d, "list.txt"), "w").write("\n".join(paths) + "\n")
    # queries: strain0's first 500k k-mers + 100k randoms
    qs = open(paths[0]).read().split()[:500_000]
    qr = ["".join(x) for x in np.array(list("ACGT"))[
        rng.integers(0, 4, size=(100_000, K))]]
    qpath = os.path.join(d, "queries.kmers")
    open(qpath, "w").write("\n".join(qs + qr) + "\n")
    open(os.path.join(d, "qlist.txt"), "w").write(qpath + "\n")
    t0 = time.monotonic()
    rc = cli.main(["build", str(K), "kmers", os.path.join(d, "list.txt"),
                   os.path.join(d, "idx"),
                   "-query_kmers", "kmers", os.path.join(d, "qlist.txt"),
                   "-query_branching", "kmers", os.path.join(d, "qlist.txt")])
    dt = time.monotonic() - t0
    assert rc == 0
    # spot-validate 2000 random CSV rows against the oracle
    o = oracle_from_files(paths, K)
    raw = open(qpath + ".query_kmers.out", "rb").read()
    assert raw[-1:] == b"\0"
    lines = raw[:-1].decode().split("\n")
    allq = qs + qr
    idxs = rng.choice(len(allq), size=2000, replace=False)
    for i in idxs:
        want = [str(x) for x in o.presence_row(allq[i])]
        assert lines[1 + i].split(",") == want, i
    print(json.dumps({"config": 2, "k": K, "genomes": 3,
                      "queries": len(allq),
                      "build_query_branching_s": round(dt, 1),
                      "csv_rows_checked": 2000, "equal": True}), flush=True)


def config3():
    """10-genome build, then -add_genomes 5 more; merged index equality."""
    from bloomfiltertrie_tpu import cli
    rng = np.random.default_rng(3)
    d = os.path.join(BASE_DIR, "c3")
    os.makedirs(d, exist_ok=True)
    base = rng.integers(0, 4, size=400_000, dtype=np.uint8)
    paths = []
    for i in range(15):
        s = mutate(rng, base, 0.02 * (1 + i % 3))
        p = os.path.join(d, f"g{i:02d}.kmers")
        write_kmer_file(p, to_ascii(s), K)
        paths.append(p)
    open(os.path.join(d, "l10.txt"), "w").write("\n".join(paths[:10]) + "\n")
    open(os.path.join(d, "l5.txt"), "w").write("\n".join(paths[10:]) + "\n")
    qpath = paths[0]
    open(os.path.join(d, "qlist.txt"), "w").write(qpath + "\n")
    t0 = time.monotonic()
    assert cli.main(["build", str(K), "kmers", os.path.join(d, "l10.txt"),
                     os.path.join(d, "idx10")]) == 0
    t_build = time.monotonic() - t0
    t0 = time.monotonic()
    assert cli.main(["load", os.path.join(d, "idx10.npz"),
                     "-add_genomes", "kmers", os.path.join(d, "l5.txt"),
                     os.path.join(d, "idx15"),
                     "-query_kmers", "kmers", os.path.join(d, "qlist.txt")]) == 0
    t_add = time.monotonic() - t0
    o = oracle_from_files(paths, K)
    raw = open(qpath + ".query_kmers.out", "rb").read()
    lines = raw[:-1].decode().split("\n")
    assert lines[0].split(",") == [os.path.basename(p) for p in paths]
    qs = open(qpath).read().split()
    idxs = rng.choice(len(qs), size=1500, replace=False)
    for i in idxs:
        assert lines[1 + i].split(",") == [str(x) for x in o.presence_row(qs[i])], i
    print(json.dumps({"config": 3, "k": K, "genomes": "10+5",
                      "build10_s": round(t_build, 1),
                      "add5_query_s": round(t_add, 1),
                      "csv_rows_checked": 1500, "equal": True}), flush=True)


def config4():
    """100 genomes, -query_sequences 0.8 canonical CSV equality."""
    from bloomfiltertrie_tpu import cli
    rng = np.random.default_rng(4)
    d = os.path.join(BASE_DIR, "c4")
    os.makedirs(d, exist_ok=True)
    base = rng.integers(0, 4, size=100_000, dtype=np.uint8)
    paths = []
    for i in range(100):
        s = mutate(rng, base, 0.005 * (1 + i % 5))
        p = os.path.join(d, f"g{i:03d}.kmers")
        write_kmer_file(p, to_ascii(s), K)
        paths.append(p)
    open(os.path.join(d, "list.txt"), "w").write("\n".join(paths) + "\n")
    # query sequences: slices of strains (forward + revcomp) + randoms
    comp = {65: 84, 67: 71, 71: 67, 84: 65}
    seqs = []
    for i in range(30):
        s = to_ascii(mutate(rng, base[:3000], 0.002)).decode()
        if i % 3 == 1:
            s = s[::-1].translate({65: 84, 67: 71, 71: 67, 84: 65})
        if i % 3 == 2:
            s = to_ascii(rng.integers(0, 4, size=2000, dtype=np.uint8)).decode()
        seqs.append(s)
    spath = os.path.join(d, "seqs.txt")
    open(spath, "w").write("\n".join(seqs) + "\n")
    open(os.path.join(d, "slist.txt"), "w").write(spath + "\n")
    t0 = time.monotonic()
    assert cli.main(["build", str(K), "kmers", os.path.join(d, "list.txt"),
                     os.path.join(d, "idx"),
                     "-query_sequences", "0.8", "canonical",
                     os.path.join(d, "slist.txt")]) == 0
    dt = time.monotonic() - t0
    o = oracle_from_files(paths, K)
    raw = open(spath + ".query_sequences.out", "rb").read()
    assert raw[-1:] == b"\0"
    lines = raw[:-1].decode().split("\n")
    for i, s in enumerate(seqs):
        want = o.query_sequence(s, 0.8, True)
        got = [g for g, v in enumerate(lines[1 + i].split(",")) if v == "1"]
        assert got == want, i
    print(json.dumps({"config": 4, "k": K, "genomes": 100,
                      "sequences": len(seqs),
                      "build_queryseq_s": round(dt, 1),
                      "equal": True}), flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["1", "2", "3", "4"]
    os.makedirs(BASE_DIR, exist_ok=True)
    for c in which:
        log(f"== config {c} ==")
        {"1": config1, "2": config2, "3": config3, "4": config4}[c]()
    log("done")
