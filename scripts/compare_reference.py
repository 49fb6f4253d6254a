"""Head-to-head: our CLI vs the ACTUAL reference `bft` binary.

The reference binary is built by the committed harness in scripts/refbuild/
(std::map-backed Judy shim + two upstream main.c bugfix patches; Judy and
jemalloc are not in this image).  If the binary is missing it is rebuilt
automatically (scripts/refbuild/build.sh; ~1 min).  Datasets are the ones
scripts/oracle_scale_run.py generates (k=27, a multiple of 9 as the
reference requires, main.c:61-63).

Checks (BASELINE.json's bit-for-bit contract):
  * -extract_kmers: k-mer SET equality (reference order is trie-DFS,
    SURVEY §3 says compare as sets).
  * -query_kmers CSV: byte-for-byte equality (incl. the trailing NUL).
  * -query_branching: identical counts.
  * load -add_genomes: merged-index query CSV byte equality.
  * -query_sequences CSV: byte-for-byte equality.
Also records both sides' wall times for BASELINE.md.

The sharded row: config 4 additionally re-runs OUR side through the
``--shards 8`` CLI on the virtual 8-device CPU mesh, binding "sharded
engine" and "byte-equal vs the reference binary" together (VERDICT r4 #3).

Usage: python scripts/compare_reference.py [--quick] [ref_binary]
  --quick: generate SMALL datasets inline (seconds per config instead of
           minutes; same four configs, same byte-equality assertions) —
           the cheap equality profile for routine reruns; the full-size
           datasets (scripts/oracle_scale_run.py first) remain the round-
           boundary evidence.  Used in-suite by tests/test_compare_quick.py.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# 8 virtual CPU devices BEFORE jax import: the sharded config-4 row runs
# our CLI over an 8-shard mesh.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

QUICK = "--quick" in sys.argv[1:]
_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
BASE = "/tmp/bft_quick" if QUICK else "/tmp/bft_oracle_scale"
REF = _pos[0] if _pos else "/tmp/refbuild/bft"
K = "27"

if not os.path.exists(REF):
    # Rebuild the reference binary from the committed harness.
    print(f"{REF} missing; building via scripts/refbuild/build.sh",
          file=sys.stderr, flush=True)
    # Keep this script's stdout JSON-only: the build chatter (patch/make)
    # goes to stderr so consumers can parse every stdout line as a row.
    subprocess.run(
        ["bash", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "refbuild", "build.sh")],
        check=True, stdout=sys.stderr, stderr=sys.stderr)


def log(m):
    print(m, file=sys.stderr, flush=True)


def run_ref(args, cwd=None):
    t0 = time.monotonic()
    p = subprocess.run([REF] + args, capture_output=True, text=True, cwd=cwd)
    dt = time.monotonic() - t0
    if p.returncode != 0:
        raise RuntimeError(f"ref bft failed: {p.stderr[-500:]}\n{p.stdout[-500:]}")
    return dt, p.stdout


def run_ours(args):
    from bloomfiltertrie_tpu import cli
    import io
    import contextlib
    t0 = time.monotonic()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli.main(args)
    dt = time.monotonic() - t0
    assert rc == 0
    return dt, buf.getvalue()


def csv_of(query_path):
    """The reference writes <basename-minus-ext>.csv into its CWD
    (src/main.c:263); run_ref pins cwd to the dataset dir."""
    base = os.path.basename(query_path)
    dot = base.rfind(".")
    return (base[:dot] if dot > 0 else base) + ".csv"


def compare_config2():
    d = os.path.join(BASE, "c2")
    lst, qlist = os.path.join(d, "list.txt"), os.path.join(d, "qlist.txt")
    qpath = os.path.join(d, "queries.kmers")

    t_ref, out_ref = run_ref(["build", K, "kmers", lst,
                              os.path.join(d, "ref_idx"),
                              "-query_kmers", "kmers", qlist,
                              "-query_branching", "kmers", qlist,
                              "-extract_kmers", "kmers",
                              os.path.join(d, "ref_ext.kmers")], cwd=d)
    ref_csv = open(os.path.join(d, csv_of(qpath)), "rb").read()
    os.rename(os.path.join(d, csv_of(qpath)), os.path.join(d, csv_of(qpath)) + ".ref")
    ref_branch = [l for l in out_ref.splitlines()
                  if "branching" in l.lower() and "=" in l]

    t_ours, out_ours = run_ours(["build", K, "kmers", lst,
                                 os.path.join(d, "our_idx"),
                                 "-query_kmers", "kmers", qlist,
                                 "-query_branching", "kmers", qlist,
                                 "-extract_kmers", "kmers",
                                 os.path.join(d, "our_ext.kmers")])
    our_csv = open(qpath + ".query_kmers.out", "rb").read()
    our_branch = [l for l in out_ours.splitlines()
                  if "branching" in l.lower() and ":" in l]

    ref_set = set(open(os.path.join(d, "ref_ext.kmers")).read().split())
    our_set = set(open(os.path.join(d, "our_ext.kmers")).read().split())
    ref_n = int(ref_branch[0].split()[-1].strip(".")) if ref_branch else -1
    our_n = int(our_branch[0].split()[-1].strip(".")) if our_branch else -2
    print(json.dumps({
        "config": 2, "ref_s": round(t_ref, 1), "ours_s": round(t_ours, 1),
        "kmer_set_equal": ref_set == our_set,
        "query_csv_byte_equal": ref_csv == our_csv,
        "branching_ref": ref_n, "branching_ours": our_n,
        "branching_equal": ref_n == our_n,
    }), flush=True)
    assert ref_set == our_set and ref_csv == our_csv and ref_n == our_n


def compare_config3():
    d = os.path.join(BASE, "c3")
    l10, l5 = os.path.join(d, "l10.txt"), os.path.join(d, "l5.txt")
    qlist = os.path.join(d, "qlist.txt")
    qpath = open(qlist).read().strip()

    t_ref_b, _ = run_ref(["build", K, "kmers", l10,
                          os.path.join(d, "ref_idx10")], cwd=d)
    t_ref_a, _ = run_ref(["load", os.path.join(d, "ref_idx10"),
                          "-add_genomes", "kmers", l5,
                          os.path.join(d, "ref_idx15"),
                          "-query_kmers", "kmers", qlist], cwd=d)
    ref_csv = open(os.path.join(d, csv_of(qpath)), "rb").read()
    os.rename(os.path.join(d, csv_of(qpath)),
              os.path.join(d, csv_of(qpath)) + ".ref3")

    t_our_b, _ = run_ours(["build", K, "kmers", l10,
                           os.path.join(d, "our_idx10")])
    t_our_a, _ = run_ours(["load", os.path.join(d, "our_idx10.npz"),
                           "-add_genomes", "kmers", l5,
                           os.path.join(d, "our_idx15"),
                           "-query_kmers", "kmers", qlist])
    our_csv = open(qpath + ".query_kmers.out", "rb").read()
    print(json.dumps({
        "config": 3,
        "ref_build10_s": round(t_ref_b, 1), "ref_add5_s": round(t_ref_a, 1),
        "ours_build10_s": round(t_our_b, 1), "ours_add5_s": round(t_our_a, 1),
        "query_csv_byte_equal": ref_csv == our_csv,
    }), flush=True)
    assert ref_csv == our_csv


def compare_config4():
    d = os.path.join(BASE, "c4")
    lst = os.path.join(d, "list.txt")
    slist = os.path.join(d, "slist.txt")
    spath = open(slist).read().strip()

    t_ref, _ = run_ref(["build", K, "kmers", lst, os.path.join(d, "ref_idx"),
                        "-query_sequences", "0.8", "canonical", slist], cwd=d)
    ref_csv = open(os.path.join(d, csv_of(spath)), "rb").read()
    os.rename(os.path.join(d, csv_of(spath)),
              os.path.join(d, csv_of(spath)) + ".ref4")

    t_ours, _ = run_ours(["build", K, "kmers", lst, os.path.join(d, "our_idx"),
                          "-query_sequences", "0.8", "canonical", slist])
    our_csv = open(spath + ".query_sequences.out", "rb").read()
    print(json.dumps({
        "config": 4, "ref_s": round(t_ref, 1), "ours_s": round(t_ours, 1),
        "seq_csv_byte_equal": ref_csv == our_csv,
    }), flush=True)
    assert ref_csv == our_csv


def compare_config4_sharded():
    """Config 4 through the ``--shards 8`` CLI: the sharded engine's CSV
    must be byte-equal to the reference binary's (uses the ref CSV that
    compare_config4 just produced — run after it)."""
    d = os.path.join(BASE, "c4")
    lst = os.path.join(d, "list.txt")
    slist = os.path.join(d, "slist.txt")
    spath = open(slist).read().strip()
    ref_csv = open(os.path.join(d, csv_of(spath)) + ".ref4", "rb").read()

    t_ours, _ = run_ours(["--shards", "8", "build", K, "kmers", lst,
                          os.path.join(d, "our_idx_sh"),
                          "-query_sequences", "0.8", "canonical", slist])
    our_csv = open(spath + ".query_sequences.out", "rb").read()
    print(json.dumps({
        "config": 4, "engine": "sharded", "shards": 8,
        "ours_s": round(t_ours, 1),
        "seq_csv_byte_equal": ref_csv == our_csv,
    }), flush=True)
    assert ref_csv == our_csv


def quick_gen():
    """Tiny in-line datasets for --quick: same four configs and file
    layouts as scripts/oracle_scale_run.py, sized so each head-to-head
    costs seconds on the CPU correctness vehicle."""
    import numpy as np
    k = int(K)
    rng = np.random.default_rng(12)

    def to_ascii(codes):
        return np.array([65, 67, 71, 84], np.uint8)[codes].tobytes()

    def mutate(seq, rate):
        out = seq.copy()
        n_mut = max(int(len(seq) * rate), 1)
        pos = rng.choice(len(seq), size=n_mut, replace=False)
        out[pos] = (out[pos] + rng.integers(1, 4, size=n_mut)) % 4
        return out

    def write_kmers(path, codes):
        s = to_ascii(codes).decode()
        kms = [s[i:i + k] for i in range(len(s) - k + 1)]
        open(path, "w").write("\n".join(kms) + "\n")
        return kms

    # c1: one 60 kbp genome, build + extract (our side runs here so
    # compare_config1 finds ext.kmers as in the full flow)
    d1 = os.path.join(BASE, "c1")
    os.makedirs(d1, exist_ok=True)
    g = rng.integers(0, 4, size=60_000, dtype=np.uint8)
    write_kmers(os.path.join(d1, "g0.kmers"), g)
    open(os.path.join(d1, "list.txt"), "w").write(
        os.path.join(d1, "g0.kmers") + "\n")
    run_ours(["build", K, "kmers", os.path.join(d1, "list.txt"),
              os.path.join(d1, "our_idx"),
              "-extract_kmers", "kmers", os.path.join(d1, "ext.kmers")])

    # c2: 3 strains of a 20 kbp base + 1.5k queries (half misses)
    d2 = os.path.join(BASE, "c2")
    os.makedirs(d2, exist_ok=True)
    base = rng.integers(0, 4, size=20_000, dtype=np.uint8)
    paths = []
    allq = []
    for i in range(3):
        p = os.path.join(d2, f"s{i}.kmers")
        allq += write_kmers(p, mutate(base, 0.01))[::20]
        paths.append(p)
    open(os.path.join(d2, "list.txt"), "w").write("\n".join(paths) + "\n")
    misses = ["".join("ACGT"[c] for c in rng.integers(0, 4, size=k))
              for _ in range(len(allq))]
    open(os.path.join(d2, "queries.kmers"), "w").write(
        "\n".join(allq + misses) + "\n")
    open(os.path.join(d2, "qlist.txt"), "w").write(
        os.path.join(d2, "queries.kmers") + "\n")

    # c3: build 4 + add 2 (10 kbp strains), 800 queries
    d3 = os.path.join(BASE, "c3")
    os.makedirs(d3, exist_ok=True)
    base3 = rng.integers(0, 4, size=10_000, dtype=np.uint8)
    p10, p5, qs = [], [], []
    for i in range(6):
        p = os.path.join(d3, f"s{i}.kmers")
        qs += write_kmers(p, mutate(base3, 0.02))[::15]
        (p10 if i < 4 else p5).append(p)
    open(os.path.join(d3, "l10.txt"), "w").write("\n".join(p10) + "\n")
    open(os.path.join(d3, "l5.txt"), "w").write("\n".join(p5) + "\n")
    open(os.path.join(d3, "queries.kmers"), "w").write("\n".join(qs) + "\n")
    open(os.path.join(d3, "qlist.txt"), "w").write(
        os.path.join(d3, "queries.kmers") + "\n")

    # c4: 12 genomes (8 kbp), 8 query sequences incl. revcomp + random
    d4 = os.path.join(BASE, "c4")
    os.makedirs(d4, exist_ok=True)
    base4 = rng.integers(0, 4, size=8_000, dtype=np.uint8)
    paths4 = []
    for i in range(12):
        p = os.path.join(d4, f"g{i:02d}.kmers")
        write_kmers(p, mutate(base4, 0.005 * (1 + i % 5)))
        paths4.append(p)
    open(os.path.join(d4, "list.txt"), "w").write("\n".join(paths4) + "\n")
    seqs = []
    for i in range(8):
        s = to_ascii(mutate(base4[:1500], 0.002)).decode()
        if i % 3 == 1:
            s = s[::-1].translate({65: 84, 67: 71, 71: 67, 84: 65})
        if i % 3 == 2:
            s = to_ascii(rng.integers(0, 4, size=900, dtype=np.uint8)
                         ).decode()
        seqs.append(s)
    spath = os.path.join(d4, "seqs.txt")
    open(spath, "w").write("\n".join(seqs) + "\n")
    open(os.path.join(d4, "slist.txt"), "w").write(spath + "\n")


def compare_config1():
    d = os.path.join(BASE, "c1")
    lst = os.path.join(d, "list.txt")
    t_ref, out = run_ref(["build", K, "kmers", lst, os.path.join(d, "ref_idx"),
                          "-extract_kmers", "kmers",
                          os.path.join(d, "ref_ext.kmers")], cwd=d)
    ref_set = set(open(os.path.join(d, "ref_ext.kmers")).read().split())
    our_set = set(open(os.path.join(d, "ext.kmers")).read().split())
    print(json.dumps({
        "config": 1, "ref_build_extract_s": round(t_ref, 1),
        "kmer_set_equal": ref_set == our_set,
        "n": len(ref_set),
    }), flush=True)
    assert ref_set == our_set


if __name__ == "__main__":
    if QUICK:
        log("== generating quick datasets ==")
        quick_gen()
    for name, fn in [("2", compare_config2), ("3", compare_config3),
                     ("4", compare_config4),
                     ("4-sharded", compare_config4_sharded),
                     ("1", compare_config1)]:
        log(f"== compare config {name} ==")
        fn()
    log("done")
