"""Index-union: merge two ColoredDBGs into one (component #23).

The reference ships an out-of-core BFT ⊎ BFT merge that is ~70% commented out
and disconnected from the build (``merging_BFT`` src/merge.c:3-400, caller
src/file_io.c:1022-1462 also commented; only ``l_insert_kmer`` still
compiles).  This is the working TPU-era equivalent: genome ids of ``b`` are
appended after ``a``'s (insertion order preserved), k-mer sets are united,
and duplicate k-mers get the union of their color sets.

Host-side NumPy implementation: merging is an offline maintenance operation
(the reference's was disk-spill based); the result is re-uploaded as a fresh
index.  Complexity O((na+nb) log) + O(unique (class_a, class_b) pairs).
"""

from __future__ import annotations

import numpy as np

from bloomfiltertrie_tpu.models.cdbg import ColoredDBG, _next_pow2


def _shift_rows(rows: np.ndarray, offset: int, out_words: int) -> np.ndarray:
    """Shift genome bitmaps left by ``offset`` bits into ``out_words`` words."""
    d, cw = rows.shape
    out = np.zeros((d, out_words), dtype=np.uint32)
    word_off, bit_off = offset // 32, offset % 32
    for wsrc in range(cw):
        lo = rows[:, wsrc] << np.uint32(bit_off) if bit_off else rows[:, wsrc]
        out[:, wsrc + word_off] |= lo.astype(np.uint32)
        if bit_off:
            hi = rows[:, wsrc] >> np.uint32(32 - bit_off)
            if wsrc + word_off + 1 < out_words:
                out[:, wsrc + word_off + 1] |= hi.astype(np.uint32)
    return out


def merge_cdbg(a: ColoredDBG, b: ColoredDBG) -> ColoredDBG:
    """Union of two indexes; colors of shared k-mers are united."""
    import jax

    if a.k != b.k:
        raise ValueError("cannot merge indexes with different k")
    k = a.k
    offset = a.nb_genomes
    total_genomes = offset + b.nb_genomes
    out_cw = max(1, _next_pow2((total_genomes + 31) // 32))

    keys_a = a.extract_kmers_packed()
    keys_b = b.extract_kmers_packed()
    # Unified (bitmap-expanded) dictionaries + rebased per-kmer refs.
    rows_a, cls_a = a.export_color_rows()
    rows_b, cls_b = b.export_color_rows()

    rows_a = np.pad(rows_a, ((0, 0), (0, out_cw - rows_a.shape[1])))
    rows_b_shift = _shift_rows(rows_b, offset, out_cw)

    flags_a = np.asarray(jax.device_get(a.table.flags))[: a.nb_kmers]
    flags_b = np.asarray(jax.device_get(b.table.flags))[: b.nb_kmers]

    # merge key sets (both already sorted; lexsort for the union)
    w = keys_a.shape[1] if keys_a.size else keys_b.shape[1]
    all_keys = np.concatenate([keys_a, keys_b])
    src = np.concatenate([np.zeros(len(keys_a), np.int8),
                          np.ones(len(keys_b), np.int8)])
    cls = np.concatenate([cls_a, cls_b])
    flg = np.concatenate([flags_a, flags_b])
    # np.lexsort: LAST key is primary -> (src least-significant, then words
    # from last to first) so rows sort by key, ties broken a-before-b.
    order = np.lexsort((src,) + tuple(all_keys[:, i]
                                      for i in reversed(range(w))))
    all_keys, src, cls, flg = (all_keys[order], src[order], cls[order],
                               flg[order])

    dup_with_next = np.zeros(len(all_keys), dtype=bool)
    if len(all_keys) > 1:
        dup_with_next[:-1] = (all_keys[1:] == all_keys[:-1]).all(axis=1)
    first = np.ones(len(all_keys), dtype=bool)
    first[1:] = ~dup_with_next[:-1]

    # class table for the merged index: [a's | b's shifted | pair classes]
    da, db = rows_a.shape[0], rows_b_shift.shape[0]
    merged_cls = np.where(src == 0, cls, cls + da)

    # duplicate pairs: (class_a, class_b) -> new class = union row
    dup_idx = np.nonzero(dup_with_next)[0]   # a-row of each (a,b) dup pair
    pair_a = cls[dup_idx]
    pair_b = cls[dup_idx + 1]
    pairs = np.stack([pair_a, pair_b], axis=1)
    uniq_pairs, pair_of = (np.unique(pairs, axis=0, return_inverse=True)
                           if len(pairs) else
                           (np.zeros((0, 2), np.int32), np.zeros(0, np.int64)))
    pair_rows = (rows_a[uniq_pairs[:, 0]] | rows_b_shift[uniq_pairs[:, 1]]
                 if len(uniq_pairs) else np.zeros((0, out_cw), np.uint32))
    merged_cls[dup_idx] = da + db + pair_of

    out_keys = all_keys[first]
    out_cls = merged_cls[first].astype(np.int32)
    # Flags: duplicates keep the max 2-bit state of the two sides (marks
    # from either input survive the merge; conflicting states resolve to
    # the higher one).  Tested in tests/test_merge_index.py.
    merged_flg = flg.copy()
    merged_flg[dup_idx] = np.maximum(flg[dup_idx], flg[dup_idx + 1])
    out_flg = merged_flg[first]
    all_rows = np.concatenate([rows_a, rows_b_shift, pair_rows])

    # build the result index (hybrid color pools, models/table.py ColorStore)
    cfg = a.config
    out = ColoredDBG(cfg)
    out.genome_names = list(a.genome_names) + list(b.genome_names)
    import jax.numpy as jnp
    from bloomfiltertrie_tpu.models import colors_codec
    from bloomfiltertrie_tpu.models import table as tbl
    from bloomfiltertrie_tpu.ops import sortedset as ss

    ids_p, dense_p, remap = colors_codec.pools_from_bitmap_rows(
        all_rows, total_genomes, cfg.color_small_width)
    sd, dd = ids_p.shape[0], dense_p.shape[0]
    cap = max(_next_pow2(len(out_keys)), cfg.initial_capacity)
    scap = max(_next_pow2(max(sd, 1)), cfg.initial_color_capacity)
    dcap = max(_next_pow2(max(dd, 1)), cfg.initial_dense_color_capacity)
    keys_full = np.full((cap, w), 0xFFFFFFFF, dtype=np.uint32)
    keys_full[: len(out_keys)] = out_keys
    cref_full = np.full((cap,), -1, dtype=np.int32)
    # Mask negative refs explicitly: a -1 in out_cls must stay the no-class
    # sentinel, not wrap to the last dictionary row via fancy indexing.
    cref_full[: len(out_cls)] = (
        np.where(out_cls < 0, -1, remap[np.maximum(out_cls, 0)])
        if len(all_rows) else -1)
    flags_full = np.zeros((cap,), dtype=np.uint8)
    flags_full[: len(out_flg)] = out_flg
    ids_full = np.full((scap, cfg.color_small_width), tbl.EMPTY_ID,
                       dtype=np.int32)
    ids_full[:sd] = ids_p
    rows_full = np.zeros((dcap, out_cw), dtype=np.uint32)
    rows_full[:dd] = dense_p
    keys_d = jnp.asarray(keys_full)
    n_d = jnp.asarray(len(out_keys), dtype=jnp.int32)
    out.table = tbl.KmerTable(
        keys=keys_d, color_ref=jnp.asarray(cref_full),
        flags=jnp.asarray(flags_full), n=n_d,
        bucket_starts=ss.build_bucket_starts(keys_d, n_d))
    out.colors = tbl.ColorStore(
        ids=jnp.asarray(ids_full), rows=jnp.asarray(rows_full),
        sd=jnp.asarray(sd, dtype=jnp.int32),
        dd=jnp.asarray(dd, dtype=jnp.int32))
    out._n = len(out_keys)
    out._sd, out._dd = sd, dd
    out.compress_colors()  # gc duplicate/unreferenced classes
    return out


# ---------------------------------------------------------------------------
# Sharded merge: b's rows feed a's MASKED window flush straight from device
# memory — no (k-mer, genome) pair is ever materialized (VERDICT r4 #6).
# ---------------------------------------------------------------------------

def _window_masks_impl(cref, ids_pool, rows_pool, n, wlo, *, window: int):
    """Per-row window-genome masks of ONE table slice: [cap] class refs ->
    uint32[cap, window//32] whose bit b of word j = genome wlo + 32j + b is
    in the row's class — the device-side replacement for the host pair
    expansion (pure VPU compare/shift work, mirrors stage B's parent-bit
    logic in models/table.py flush_stage_b_impl)."""
    import jax
    import jax.numpy as jnp

    from bloomfiltertrie_tpu.models import table as tbl

    cap = cref.shape[0]
    mw = window // 32
    cwb = rows_pool.shape[1]
    live = (jnp.arange(cap, dtype=jnp.int32) < n) & (cref >= 0)
    dense = live & ((cref & tbl.DENSE_TAG) != 0)
    small = live & ~dense
    srow = ids_pool[jnp.where(small, cref, 0)]             # [cap, S]
    rel = srow - wlo
    inwin = ((srow != tbl.EMPTY_ID) & (rel >= 0) & (rel < window)
             & small[:, None])
    drow = jnp.where(dense[:, None],
                     rows_pool[jnp.where(dense, cref & ~tbl.DENSE_TAG, 0)],
                     jnp.uint32(0))                        # [cap, cwb]
    w0 = wlo >> 5
    sh = (wlo & 31).astype(jnp.uint32)

    def sel_word(widx):
        outv = jnp.zeros((cap,), dtype=jnp.uint32)
        for c in range(cwb):
            outv = jnp.where(widx == c, drow[:, c], outv)
        return outv

    cols = []
    s_w = srow.shape[1]
    for j in range(mw):
        mj = jnp.zeros((cap,), dtype=jnp.uint32)
        for t in range(s_w):
            mj = mj | jnp.where(
                inwin[:, t] & ((rel[:, t] >> 5) == j),
                jnp.uint32(1) << (rel[:, t] & 31).astype(jnp.uint32),
                jnp.uint32(0))
        lo = sel_word(w0 + j)
        hi = sel_word(w0 + j + 1)
        dj = (lo >> sh) | jnp.where(
            sh > 0, hi << ((jnp.uint32(32) - sh) & 31), jnp.uint32(0))
        cols.append(mj | jnp.where(dense, dj, jnp.uint32(0)))
    return jnp.stack(cols, axis=-1), live


def _shard_views(b):
    """Yield (keys, cref, flags, ids_pool, rows_pool) host views per shard
    of a ShardedCDBG or the single table of a ColoredDBG."""
    import jax
    if hasattr(b, "n_shards"):     # ShardedCDBG
        ns = np.asarray(jax.device_get(b.n))
        for s in range(b.n_shards):
            n_s = int(ns[s])
            if not n_s:
                continue
            sd_s = int(np.asarray(jax.device_get(b.sd))[s])
            dd_s = int(np.asarray(jax.device_get(b.dd))[s])
            yield (np.asarray(jax.device_get(b.keys[s, :n_s])),
                   np.asarray(jax.device_get(b.color_ref[s, :n_s])),
                   np.asarray(jax.device_get(b.flags[s, :n_s])),
                   np.asarray(jax.device_get(b.ids[s, :max(sd_s, 1)])),
                   np.asarray(jax.device_get(b.rows[s, :max(dd_s, 1)])))
    else:
        import jax
        n = b.nb_kmers
        if n:
            yield (np.asarray(jax.device_get(b.table.keys))[:n],
                   np.asarray(jax.device_get(b.table.color_ref))[:n],
                   np.asarray(jax.device_get(b.table.flags))[:n],
                   np.asarray(jax.device_get(b.colors.ids))[
                       :max(b._sd, 1)],
                   np.asarray(jax.device_get(b.colors.rows))[
                       :max(b._dd, 1)])


def _masks_fn(window: int):
    """Cached jit of the per-shard window-mask computation: a fresh jit per
    merge call would re-trace and re-load the program every time."""
    import functools

    import jax
    fn = _MASKS_FN_CACHE.get(window)
    if fn is None:
        fn = jax.jit(jax.vmap(
            functools.partial(_window_masks_impl, window=window),
            in_axes=(0, 0, 0, 0, None)))
        _MASKS_FN_CACHE[window] = fn
    return fn


_MASKS_FN_CACHE: dict = {}


def merge_into_sharded(a, b):
    """Union ``b`` into the ShardedCDBG ``a`` IN PLACE (component #23 at
    mesh scale — reference intent ``merging_BFT`` src/merge.c:3-400 /
    ``l_insert_kmer`` src/merge.c:402, here built on the live machinery).

    ``b`` may be a ShardedCDBG (ANY mesh size — rows re-route through a's
    all_to_all) or a single-device ColoredDBG.  b's genome ids append after
    a's; duplicate k-mers take the union of their color sets; 2-bit marks
    combine by max (as :func:`merge_cdbg`).  Implementation: per window of
    <= genome_window genomes, b's per-row window-genome MASKS are computed
    on device from its class pools (:func:`_window_masks_impl`) and b's
    distinct keys feed a's masked window flush
    (ShardedCDBG.insert_window_masked) straight from device memory — the
    color union IS the normal per-(class, mask) child-class update, and no
    (k-mer, genome) pair list ever exists on host or device.
    """
    import functools

    import jax
    import jax.numpy as jnp

    if a.k != b.k:
        raise ValueError("cannot merge indexes with different k")
    a.flush()
    b.flush()
    offset = a.nb_genomes
    names = list(b.genome_names)
    gb = len(names)
    a.genome_names.extend(names)
    a._ensure_colors(0, 0)
    prev_open = a._cur_gid
    a._cur_gid = offset + gb - 1 if gb else prev_open
    bwin = a.config.genome_window
    w = a.config.words

    # device views of b with a leading shard axis (single table => axis 1)
    if hasattr(b, "n_shards"):
        bkeys3, cref3 = b.keys, b.color_ref
        ids3, rows3, n3 = b.ids, b.rows, b.n
    else:
        bkeys3 = b.table.keys[None]
        cref3 = b.table.color_ref[None]
        ids3 = b.colors.ids[None]
        rows3 = b.colors.rows[None]
        n3 = b.table.n[None]

    masks_fn = _masks_fn(bwin)
    for wlo in range(0, gb, bwin):
        masks, valid = masks_fn(cref3, ids3, rows3, n3,
                                jnp.asarray(wlo, jnp.int32))
        a.insert_window_masked(
            jnp.reshape(bkeys3, (-1, w)),
            jnp.reshape(masks, (-1, bwin // 32)),
            jnp.reshape(valid, (-1,)), g0=offset + wlo)
    a._cur_gid = prev_open
    # marks: max-combine b's nonzero flags into a (merge_cdbg semantics;
    # host path — flags are a maintenance feature, not the bulk path)
    for keys, _cref, flags, _i, _r in _shard_views(b):
        if not (flags > 0).any():
            continue
        sel = flags > 0
        cur = a.get_flags_packed(keys[sel])
        new = np.maximum(cur, flags[sel])
        for v in (1, 2, 3):
            pick = new == v
            if pick.any():
                a.set_flags_packed(keys[sel][pick], int(v))
    a._genomes_since_compress += gb
    a.compress_colors()
    return a
