"""Multi-host skeleton: degenerate single-process behavior."""

import numpy as np

from bloomfiltertrie_tpu.parallel import multihost


def test_initialize_single_process_noop():
    assert multihost.initialize() == 0


def test_files_for_process_partition():
    files = [f"g{i}" for i in range(10)]
    parts = [multihost.files_for_process(files, p, 3) for p in range(3)]
    assert sorted(sum(parts, [])) == sorted(files)
    assert {len(p) for p in parts} <= {3, 4}
    # deterministic
    assert parts[0] == multihost.files_for_process(files, 0, 3)


def test_scatter_batch_slices_cover():
    n = 1003
    rows = np.zeros(n, dtype=int)
    for p in range(4):
        sl = multihost.scatter_batch_slices(n, p, 4)
        rows[sl] += 1
    assert (rows == 1).all()


def test_host_local_batch_single():
    b = np.arange(12).reshape(6, 2)
    got, valid = multihost.host_local_batch(b)
    np.testing.assert_array_equal(got, b)
    assert valid.all()


def test_two_process_protocol_simulated():
    """Simulated two-process build following the documented protocol
    (multihost.py module docstring): every process calls start_genome for
    EVERY genome in the shared file list; the owner contributes the file's
    k-mers, non-owners contribute an empty batch; genome ids stay globally
    consistent and the result equals a single-host build.

    True SPMD would run this loop once per host against the same global
    arrays; the simulation drives one ShardedCDBG through both virtual
    processes' contribution sequences, which exercises exactly the
    host-side protocol logic (ownership partition + empty-batch path).
    """
    import jax
    from bloomfiltertrie_tpu import BFTConfig
    from bloomfiltertrie_tpu.ops import codec
    from bloomfiltertrie_tpu.parallel.sharded import ShardedCDBG, make_mesh
    import sys
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from oracle import OracleBFT

    assert len(jax.devices()) >= 4
    rng = np.random.default_rng(55)
    k = 27
    n_proc = 2
    files = {}
    for i in range(5):
        seq = "".join(rng.choice(list("ACGT"), size=300))
        files[f"g{i}"] = [seq[j:j + k] for j in range(len(seq) - k + 1)]
    names = sorted(files)

    cfg = BFTConfig(k=k, initial_capacity=1 << 8,
                    initial_color_capacity=1 << 6, bloom_log2_bits=12,
                    batch_size=256)
    mesh = make_mesh(4)

    # multi-host-protocol build
    dbg = ShardedCDBG(cfg, mesh=mesh)
    w = cfg.words
    for gi, name in enumerate(names):   # shared file list, same on all hosts
        owner_files = {p: multihost.files_for_process(names, p, n_proc)
                       for p in range(n_proc)}
        dbg.start_genome(name)          # every process, every genome
        for p in range(n_proc):
            if name in owner_files[p]:
                packed, valid = codec.encode_strings(files[name], k)
            else:                       # non-owner: empty batch
                packed = np.zeros((0, w), np.uint32)
                valid = np.zeros((0,), bool)
            dbg.insert_kmers_packed(packed, valid)
        dbg.end_genome()

    # single-host reference build + oracle
    ref = ShardedCDBG(cfg, mesh=mesh)
    oracle = OracleBFT(k)
    for name in names:
        packed, valid = codec.encode_strings(files[name], k)
        ref.insert_genome(name, packed, valid)
        oracle.insert_genome(name, files[name])

    assert dbg.genome_names == ref.genome_names == names
    assert dbg.nb_kmers == ref.nb_kmers == len(oracle.all_kmers())
    kall = ref.extract_kmers_packed()
    assert (dbg.extract_kmers_packed() == kall).all()
    f1, b1 = dbg.query_kmers_packed(kall)
    f2, b2 = ref.query_kmers_packed(kall)
    assert f1.all() and (b1 == b2).all()


def test_one_genome_scattered_across_processes():
    """scatter_batch_slices flow: one genome's batch split across virtual
    hosts; the routed union equals the whole-batch insert."""
    import jax
    from bloomfiltertrie_tpu import BFTConfig
    from bloomfiltertrie_tpu.ops import codec
    from bloomfiltertrie_tpu.parallel.sharded import ShardedCDBG, make_mesh

    assert len(jax.devices()) >= 4
    rng = np.random.default_rng(66)
    k = 27
    seq = "".join(rng.choice(list("ACGT"), size=800))
    kms = [seq[j:j + k] for j in range(len(seq) - k + 1)]
    packed, valid = codec.encode_strings(kms, k)
    cfg = BFTConfig(k=k, initial_capacity=1 << 8,
                    initial_color_capacity=1 << 6, bloom_log2_bits=12,
                    batch_size=256)
    mesh = make_mesh(4)

    dbg = ShardedCDBG(cfg, mesh=mesh)
    dbg.start_genome("g0")
    for p in range(3):
        sl = multihost.scatter_batch_slices(packed.shape[0], p, 3)
        dbg.insert_kmers_packed(packed[sl], valid[sl])
    dbg.end_genome()

    ref = ShardedCDBG(cfg, mesh=mesh)
    ref.insert_genome("g0", packed, valid)
    assert dbg.nb_kmers == ref.nb_kmers
    assert (dbg.extract_kmers_packed() == ref.extract_kmers_packed()).all()


def test_two_process_real_distributed():
    """REAL two-process jax.distributed build (VERDICT r3 #3): spawns two
    OS processes (localhost gRPC coordinator, 4 virtual CPU devices each,
    BFT_MULTIHOST=1), builds the shared 8-shard index via the documented
    protocol, and each process asserts its own shards equal both the
    all-contribute build and the oracle (tests/multihost_worker.py).

    This executes multihost.initialize's cluster branch and the actual
    cross-process collective path the simulation below cannot reach.
    """
    import os
    import socket
    import subprocess
    import sys

    # pick a free port for the coordinator
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(p), "2"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for p in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1200)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    for i, p in enumerate(procs):
        assert p.returncode == 0, \
            f"worker {i} failed (rc={p.returncode}):\n{outs[i][-4000:]}"
        assert "all multihost asserts passed" in outs[i]
