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
