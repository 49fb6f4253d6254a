import jax.numpy as jnp
import numpy as np
import pytest

from bloomfiltertrie_tpu.ops import sortedset as ss


def np_sortrows(a):
    return a[np.lexsort(tuple(a[:, w] for w in reversed(range(a.shape[1]))))]


def rand_rows(rng, n, w, hi=10):
    return rng.integers(0, hi, size=(n, w)).astype(np.uint32)


@pytest.mark.parametrize("w", [1, 2, 4])
def test_sort_and_unique(w):
    rng = np.random.default_rng(0)
    a = rand_rows(rng, 100, w)
    valid = rng.random(100) < 0.8
    count, uk, src = ss.sort_unique(jnp.asarray(a), jnp.asarray(valid))
    count = int(count)
    expect = np.unique(a[valid], axis=0)
    assert count == expect.shape[0]
    np.testing.assert_array_equal(np.asarray(uk)[:count], expect)
    # src indices point at occurrences of each row
    np.testing.assert_array_equal(a[np.asarray(src)[:count]], expect)
    # tail is sentinel
    assert (np.asarray(uk)[count:] == 0xFFFFFFFF).all()


def test_sort_unique_allT_alias():
    """A genuine all-0xFF key must survive next to invalid sentinel padding."""
    a = np.array([[0xFFFFFFFF], [1], [0xFFFFFFFF]], dtype=np.uint32)
    valid = np.array([False, True, True])  # first all-F row is invalid
    count, uk, _ = ss.sort_unique(jnp.asarray(a), jnp.asarray(valid))
    assert int(count) == 2
    np.testing.assert_array_equal(np.asarray(uk)[:2, 0],
                                  [1, 0xFFFFFFFF])


@pytest.mark.parametrize("w", [1, 3])
def test_searchsorted_matches_numpy(w):
    rng = np.random.default_rng(1)
    cap = 64
    n = 40
    table = np.full((cap, w), 0xFFFFFFFF, dtype=np.uint32)
    rows = np.unique(rand_rows(rng, n * 2, w), axis=0)[:n]
    table[: rows.shape[0]] = rows
    queries = rand_rows(rng, 50, w)
    got = np.asarray(ss.searchsorted(jnp.asarray(table), jnp.asarray(queries)))
    # numpy equivalent via structured view
    def key(a):
        return [tuple(r) for r in a]
    tk = key(table)
    for q, g in zip(key(queries), got):
        import bisect
        assert g == bisect.bisect_left(tk, q)


def test_lookup_guards():
    table = np.full((8, 1), 0xFFFFFFFF, dtype=np.uint32)
    table[:3, 0] = [2, 5, 9]
    found, idx = ss.lookup(jnp.asarray(table), jnp.asarray(3),
                           jnp.asarray([[5], [6], [0xFFFFFFFF]], dtype=jnp.uint32))
    found = np.asarray(found)
    assert found.tolist() == [True, False, False]
    assert int(np.asarray(idx)[0]) == 1


def test_merge_into():
    rng = np.random.default_rng(2)
    w = 2
    cap = 128
    old = np.unique(rand_rows(rng, 60, w, hi=50), axis=0)
    new_pool = np.unique(rand_rows(rng, 40, w, hi=50), axis=0)
    # disjointness precondition
    old_set = {tuple(r) for r in old}
    new = np.array([r for r in new_pool if tuple(r) not in old_set],
                   dtype=np.uint32).reshape(-1, w)
    table = np.full((cap, w), 0xFFFFFFFF, dtype=np.uint32)
    table[: old.shape[0]] = old
    payload = np.full((cap,), -1, dtype=np.int32)
    payload[: old.shape[0]] = np.arange(old.shape[0])
    newbuf = np.full((64, w), 0xFFFFFFFF, dtype=np.uint32)
    newbuf[: new.shape[0]] = new
    new_payload = np.full((64,), 1000, dtype=np.int32)

    keys, n, (pl,) = ss.merge_into(
        jnp.asarray(table), jnp.asarray(old.shape[0]),
        jnp.asarray(newbuf), jnp.asarray(new.shape[0]),
        table_payloads=(jnp.asarray(payload),),
        new_payloads=(jnp.asarray(new_payload),),
        payload_fills=(-1,))
    n = int(n)
    assert n == old.shape[0] + new.shape[0]
    merged = np.asarray(keys)[:n]
    expect = np_sortrows(np.concatenate([old, new]))
    np.testing.assert_array_equal(merged, expect)
    # payloads followed their rows
    pl = np.asarray(pl)[:n]
    for row, p in zip(merged, pl):
        if tuple(row) in old_set:
            assert (old[p] == row).all()
        else:
            assert p == 1000
    assert (np.asarray(keys)[n:] == 0xFFFFFFFF).all()
