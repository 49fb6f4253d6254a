"""Worker process for the REAL two-process jax.distributed build test.

Launched by tests/test_multihost.py (one subprocess per virtual host) with:
    python tests/multihost_worker.py <port> <process_id> <num_processes>

Each process pins 4 virtual CPU devices, joins the cluster through
``multihost.initialize`` (exercising the actual gRPC coordinator +
collective path — SURVEY §2/§5 comm-backend row), and builds TWO sharded
indexes over the GLOBAL 8-device mesh following the documented protocol
(multihost.py module docstring):

  * build A: genome payloads partitioned round-robin across processes
    (owner contributes the file's k-mers, the other an empty batch);
  * build B: every process contributes the FULL batch for every genome —
    idempotent by set semantics + the same-genome color no-op
    (reference src/retrieveAnnotation.c:278), so B is the single-host
    equivalent build run in the same SPMD world.

Asserts, distributed across processes so every shard is checked by its
owner: A == B on every local shard (keys, counts, color bitmaps decoded
per row) and local shard keys == the oracle's keys for those shard ranges.
Exit code 0 = all asserts passed on this process.
"""

import os
import sys

port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["BFT_MULTIHOST"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# jax.distributed.initialize must run BEFORE anything touches the XLA
# backend — package imports build module-level jnp constants, so the
# cluster join happens first (this is the documented multihost.py order:
# initialize(), then build).
from bloomfiltertrie_tpu.parallel import multihost  # noqa: E402

_got_pid = multihost.initialize(f"localhost:{port}", nproc, pid)

import numpy as np  # noqa: E402

from bloomfiltertrie_tpu import BFTConfig  # noqa: E402
from bloomfiltertrie_tpu.ops import codec  # noqa: E402
from bloomfiltertrie_tpu.parallel.sharded import ShardedCDBG, make_mesh  # noqa: E402
from oracle import OracleBFT  # noqa: E402


def main():
    got_pid = _got_pid
    assert got_pid == pid, (got_pid, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, len(jax.devices())
    assert len(jax.local_devices()) == 4

    rng = np.random.default_rng(55)
    k = 27
    files = {}
    for i in range(6):
        seq = "".join(rng.choice(list("ACGT"), size=400))
        files[f"g{i}"] = [seq[j:j + k] for j in range(len(seq) - k + 1)]
    names = sorted(files)

    # global batch shape: one chunk; each process's region must fit a whole
    # genome's k-mers (374 rows < 512 = 1024/2).
    gshape = 1024
    cfg = BFTConfig(k=k, initial_capacity=1 << 8,
                    initial_color_capacity=1 << 6, bloom_log2_bits=12,
                    batch_size=gshape)
    mesh = make_mesh()          # global 8-device mesh
    w = cfg.words

    def build(partitioned: bool) -> ShardedCDBG:
        dbg = ShardedCDBG(cfg, mesh=mesh)
        mine = set(multihost.files_for_process(names, pid, nproc))
        for name in names:      # every process registers every genome
            dbg.start_genome(name)
            if not partitioned or name in mine:
                packed, valid = codec.encode_strings(files[name], k)
            else:               # non-contributor: zero rows, SAME dispatch
                packed = np.zeros((0, w), np.uint32)
                valid = np.zeros((0,), bool)
            # every process embeds its contribution into its own region of
            # the same-shaped global batch (multihost.py SPMD contract)
            gp, gv = multihost.place_local_batch(packed, valid, gshape)
            dbg.insert_kmers_packed(gp, gv)
            dbg.end_genome()
        dbg.flush()
        return dbg

    a = build(partitioned=True)
    b = build(partitioned=False)

    oracle = OracleBFT(k)
    for name in names:
        oracle.insert_genome(name, files[name])

    # Replicated global stats
    assert a.nb_kmers == b.nb_kmers == len(oracle.all_kmers()), \
        (a.nb_kmers, b.nb_kmers, len(oracle.all_kmers()))
    assert a.genome_names == names

    # Per-shard state equality, each process checking its OWN shards.
    def local_shards(x):
        # keyed by shard id = start of the leading (shard-axis) slice
        return {s.index[0].start: np.asarray(s.data)
                for s in x.addressable_shards}

    ka, kb = local_shards(a.keys), local_shards(b.keys)
    na, nb_ = local_shards(a.n), local_shards(b.n)
    assert ka.keys() == kb.keys() and len(ka) >= 1
    # oracle keys, partitioned by shard exactly as shard_of_keys does
    all_packed, _ = codec.encode_strings(sorted(oracle.all_kmers()), k)
    order = np.lexsort(all_packed.T[::-1])
    all_sorted = all_packed[order]
    shard_bits = a.config.shard_bits
    shard_of = (all_sorted[:, 0] >> np.uint32(32 - shard_bits)).astype(int)

    checked = 0
    for s in ka:                   # shard id
        n_s = int(na[s][0])
        assert n_s == int(nb_[s][0])
        rows_a = ka[s][0, :n_s]
        rows_b = kb[s][0, :n_s]
        np.testing.assert_array_equal(rows_a, rows_b)
        want = all_sorted[shard_of == s]
        np.testing.assert_array_equal(rows_a, want)
        checked += 1
    assert checked == 4, checked

    # Color equality through the replicated query path (bitmaps per k-mer).
    fa, ba = a.query_kmers_packed(all_sorted[:64])
    fb, bb = b.query_kmers_packed(all_sorted[:64])
    assert fa.all() and fb.all()
    np.testing.assert_array_equal(ba, bb)
    for i in range(64):
        km = codec.decode_strings(all_sorted[i:i + 1], k)[0]
        got = {g for g in range(len(names))
               if (ba[i, g >> 5] >> np.uint32(g & 31)) & 1}
        assert got == oracle.colors(km), km

    # Host-assembly APIs on the REAL multi-process mesh (VERDICT r4 #8):
    # extraction and unitig assembly must work even though remote shards
    # are non-addressable — _host_view's replicated gather makes every
    # process able to assemble the full result.
    ext = a.extract_kmers_packed()
    np.testing.assert_array_equal(ext, all_sorted)
    unis = a.extract_unitigs()
    covered = [u[i:i + k] for u in unis for i in range(len(u) - k + 1)]
    assert set(covered) == oracle.all_kmers()
    assert len(covered) == len(set(covered))

    print(f"process {pid}: all multihost asserts passed", flush=True)


if __name__ == "__main__":
    main()
