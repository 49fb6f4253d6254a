"""Compact color-class encodings — the reference's succinct annotation modes.

Reference: every k-mer annotation is stored in one of four byte encodings
picked greedily by minimum size (``compute_best_mode`` src/annotation.c:416;
decoders src/annotation.c:20-156):

  mode 0  presence bitmap
  mode 1  sorted [x, y] run list
  mode 2  sorted id list
  mode 3  pointer into a global dictionary of color sets

This engine IS mode 3 everywhere in memory: every k-mer's ``color_ref``
points into one deduplicated dictionary of classes, held in the hybrid
device form of models/table.py ``ColorStore`` — small classes as sorted id
rows (in-memory mode 2), large classes as fixed-width bitmaps (mode 0).
The reference's full best-mode selection reappears HERE, at the
serialization boundary: each dictionary class is written in its cheapest
of modes 0/1/2, so checkpoints keep the reference's succinctness.

Sizes (G genomes, c colors, r runs), mirroring the reference's accounting:
  mode 0: ceil(G/8) bytes          mode 2: sum(varint(delta ids)) bytes
  mode 1: sum(varint(delta run bounds)) bytes
Deltas make both list modes insensitive to absolute genome ids — the same
trick as the reference's dictionary delta compression (``comp_annotation``
src/annotation.c:1777,1828-1833).

All encode/decode paths are vectorized numpy (host side; runs once per
checkpoint, not per query).
"""

from __future__ import annotations

import numpy as np

MODE_BITMAP = 0
MODE_RUNS = 1
MODE_IDS = 2


def _varint_len(v: np.ndarray) -> np.ndarray:
    """Bytes needed per value in LEB128 varint (v >= 0)."""
    v = v.astype(np.int64)
    return np.select(
        [v < (1 << 7), v < (1 << 14), v < (1 << 21), v < (1 << 28)],
        [1, 2, 3, 4], 5).astype(np.int64)


def _varint_encode(values: np.ndarray) -> np.ndarray:
    """LEB128-encode a flat int array -> uint8 array (vectorized)."""
    v = values.astype(np.uint64)
    lens = _varint_len(values)
    offs = np.concatenate([[0], np.cumsum(lens)])
    out = np.zeros(int(offs[-1]), dtype=np.uint8)
    max_len = int(lens.max()) if len(lens) else 0
    for b in range(max_len):
        sel = lens > b
        byte = ((v[sel] >> np.uint64(7 * b)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (lens[sel] > b + 1).astype(np.uint8) << 7
        out[offs[:-1][sel] + b] = byte | cont
    return out


def _varint_decode_all(buf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Decode every varint in ``buf`` -> (values int64, start offset of each)."""
    cont = (buf & 0x80) != 0
    is_start = np.concatenate([[True], ~cont[:-1]])
    starts = np.flatnonzero(is_start)
    pos_in_v = np.arange(len(buf)) - np.repeat(
        starts, np.diff(np.concatenate([starts, [len(buf)]])))
    vals = np.zeros(len(starts), dtype=np.int64)
    vid = np.cumsum(is_start) - 1
    np.add.at(vals, vid, (buf & 0x7F).astype(np.int64) << (7 * pos_in_v))
    return vals, starts


def unpack_rows(rows: np.ndarray, nb_genomes: int) -> np.ndarray:
    """uint32 bitmap rows [D, cw] -> bool [D, nb_genomes]."""
    # ascontiguousarray: arrays exported from device buffers (or sliced)
    # can be strided, and .view() needs a contiguous last axis.
    rows = np.ascontiguousarray(rows, dtype=np.uint32)
    bits = np.unpackbits(rows.view(np.uint8).reshape(rows.shape[0], -1),
                         axis=1, bitorder="little")
    return bits[:, :nb_genomes].astype(bool)


def pack_rows(bits: np.ndarray, cw: int) -> np.ndarray:
    """bool [D, G] -> uint32 bitmap rows [D, cw]."""
    d, g = bits.shape
    padded = np.zeros((d, cw * 32), dtype=np.uint8)
    padded[:, :g] = bits
    return np.packbits(padded, axis=1, bitorder="little").view(np.uint32)


def encode_classes(rows: np.ndarray, nb_genomes: int):
    """Encode bitmap rows in their cheapest mode (reference best-mode pick).

    Returns dict of arrays: modes uint8[D], offsets int64[D+1], data uint8[:].
    """
    d = rows.shape[0]
    if d == 0:
        return {"modes": np.zeros(0, np.uint8),
                "offsets": np.zeros(1, np.int64),
                "data": np.zeros(0, np.uint8)}
    bits = unpack_rows(rows, nb_genomes)
    # per-class structure
    counts = bits.sum(axis=1).astype(np.int64)
    edges = np.diff(bits.astype(np.int8), axis=1)
    n_runs = (edges == 1).sum(axis=1) + bits[:, 0]

    # flat id list (CSR) per class, and flat run bounds per class
    cls_of_bit, gid = np.nonzero(bits)
    id_offs = np.concatenate([[0], np.cumsum(counts)])
    # delta-encode ids within each class (first id absolute)
    deltas = gid.astype(np.int64).copy()
    inner = np.ones(len(gid), dtype=bool)
    inner[id_offs[:-1][counts > 0]] = False
    deltas[inner] = gid[inner] - gid[np.flatnonzero(inner) - 1]
    id_bytes = np.zeros(d, np.int64)
    np.add.at(id_bytes, cls_of_bit, _varint_len(deltas))

    # runs: starts where bit rises, ends where it falls
    padded = np.zeros((d, nb_genomes + 2), dtype=np.int8)
    padded[:, 1:nb_genomes + 1] = bits
    ed = np.diff(padded, axis=1)
    r_cls, r_start = np.nonzero(ed == 1)
    _, r_end = np.nonzero(ed == -1)          # same per-class multiplicity
    run_offs = np.concatenate([[0], np.cumsum(n_runs)]).astype(np.int64)
    # interleave [start0, end0-1, start1, end1-1, ...], delta within class
    flat_runs = np.empty(2 * len(r_start), dtype=np.int64)
    flat_runs[0::2] = r_start
    flat_runs[1::2] = r_end - 1
    run_cls = np.repeat(r_cls, 2)
    rd = flat_runs.copy()
    inner = np.ones(len(flat_runs), dtype=bool)
    inner[2 * run_offs[:-1][n_runs > 0]] = False
    rd[inner] = flat_runs[inner] - flat_runs[np.flatnonzero(inner) - 1]
    run_bytes = np.zeros(d, np.int64)
    np.add.at(run_bytes, run_cls, _varint_len(rd))

    bitmap_bytes = np.full(d, (nb_genomes + 7) // 8, dtype=np.int64)
    sizes = np.stack([bitmap_bytes, run_bytes, id_bytes], axis=1)
    modes = sizes.argmin(axis=1).astype(np.uint8)   # greedy best mode
    best = sizes[np.arange(d), modes]
    offsets = np.concatenate([[0], np.cumsum(best)]).astype(np.int64)

    data = np.zeros(int(offsets[-1]), dtype=np.uint8)
    # mode 0: raw bitmap bytes
    m0 = modes == MODE_BITMAP
    if m0.any():
        bb = np.packbits(bits[m0], axis=1, bitorder="little")
        w = bb.shape[1]
        dest = offsets[:-1][m0][:, None] + np.arange(w)[None, :]
        data[dest.reshape(-1)] = bb.reshape(-1)

    def _emit(value_cls: np.ndarray, values: np.ndarray, mode_mask: np.ndarray):
        """Scatter the varint stream of the selected classes into ``data``.

        Values arrive grouped by class (ascending), so each class's bytes
        form one contiguous segment of the flat encoding; the destination is
        offsets[cls] + (position within segment) — pure cumsum arithmetic,
        one vectorized scatter.
        """
        sel = mode_mask[value_cls]
        c = value_cls[sel]
        vals = values[sel]
        if not len(vals):
            return
        enc = _varint_encode(vals)
        vlen = _varint_len(vals)
        per_cls_bytes = np.zeros(d, np.int64)
        np.add.at(per_cls_bytes, c, vlen)
        seg_start = np.concatenate([[0], np.cumsum(per_cls_bytes)])[:-1]
        byte_cls = np.repeat(c, vlen)
        byte_idx = np.arange(len(enc), dtype=np.int64)
        data[offsets[:-1][byte_cls] + byte_idx - seg_start[byte_cls]] = enc

    _emit(cls_of_bit, deltas, modes == MODE_IDS)
    _emit(run_cls, rd, modes == MODE_RUNS)
    return {"modes": modes, "offsets": offsets, "data": data}


EMPTY_ID = 2**31 - 1  # keep in sync with models/table.py


def ids_rows_to_bitmaps(ids: np.ndarray, cw: int) -> np.ndarray:
    """Small-pool id rows int32[d, S] (EMPTY_ID padded) -> uint32[d, cw]."""
    d = ids.shape[0]
    out = np.zeros((d, cw), dtype=np.uint32)
    cls, slot = np.nonzero(ids != EMPTY_ID)
    gid = ids[cls, slot]
    np.bitwise_or.at(out, (cls, gid >> 5), np.uint32(1) << (gid & 31))
    return out


def bitmaps_to_ids_rows(rows: np.ndarray, nb_genomes: int, s_w: int
                        ) -> np.ndarray:
    """Bitmap rows (each with <= s_w bits) -> small-pool id rows int32[d, S]."""
    d = rows.shape[0]
    out = np.full((d, s_w), EMPTY_ID, dtype=np.int32)
    bits = unpack_rows(rows, nb_genomes)
    cls, gid = np.nonzero(bits)
    # nonzero is row-major, so each class's slots appear in ascending gid
    # order; slot index = rank within class.
    counts = bits.sum(axis=1).astype(np.int64)
    offs = np.concatenate([[0], np.cumsum(counts)])[:-1]
    slot = np.arange(len(cls)) - offs[cls]
    out[cls, slot] = gid
    return out


def _concat_encodings(parts: list[dict]) -> dict:
    """Concatenate per-chunk encode_classes outputs, rebasing offsets."""
    if not parts:
        return {"modes": np.zeros(0, np.uint8),
                "offsets": np.zeros(1, np.int64),
                "data": np.zeros(0, np.uint8)}
    modes = np.concatenate([p["modes"] for p in parts])
    data = np.concatenate([p["data"] for p in parts])
    offs = [parts[0]["offsets"]]
    base = parts[0]["offsets"][-1]
    for p in parts[1:]:
        offs.append(p["offsets"][1:] + base)
        base += p["offsets"][-1]
    return {"modes": modes, "offsets": np.concatenate(offs), "data": data}


def encode_hybrid(ids: np.ndarray, dense_rows: np.ndarray, nb_genomes: int,
                  chunk: int = 1 << 15) -> dict:
    """Encode a hybrid ColorStore (small id rows + dense bitmap rows).

    Classes are serialized in unified order [small pool | dense pool], each
    in its cheapest mode (the reference's best-mode pick, annotation.c:416).
    Chunked so the dense [d, G] bit matrix is never materialized whole —
    bounded host memory at 1000-genome scale.
    """
    cw = max(1, (nb_genomes + 31) // 32)
    parts = []
    for off in range(0, ids.shape[0], chunk):
        parts.append(encode_classes(
            ids_rows_to_bitmaps(ids[off: off + chunk], cw), nb_genomes))
    for off in range(0, dense_rows.shape[0], chunk):
        parts.append(encode_classes(dense_rows[off: off + chunk], nb_genomes))
    return _concat_encodings(parts)


def pools_from_bitmap_rows(rows: np.ndarray, nb_genomes: int, s_w: int):
    """Split flat bitmap rows into hybrid pools by class size.

    Returns (ids int32[sd, S], dense uint32[dd, cw], remap int32[d]) with
    ``remap[j]`` the tagged in-memory ref of flat class j.
    """
    dense_tag = 1 << 30
    d = rows.shape[0]
    counts = unpack_rows(rows, nb_genomes).sum(axis=1) if d else \
        np.zeros(0, np.int64)
    small = counts <= s_w
    ids = bitmaps_to_ids_rows(rows[small], nb_genomes, s_w)
    dense = rows[~small]
    remap = np.empty(d, dtype=np.int32)
    remap[small] = np.arange(int(small.sum()), dtype=np.int32)
    remap[~small] = (np.arange(int((~small).sum()), dtype=np.int32)
                     | dense_tag)
    return ids, dense, remap


def decode_to_pools(enc: dict, nb_genomes: int, s_w: int, cw: int,
                    chunk: int = 1 << 15):
    """Decode a class encoding into hybrid pools.

    Returns (ids int32[sd, S], rows uint32[dd, cw], remap int32[d]) where
    ``remap[j]`` is the tagged in-memory class ref of serialized class j
    (small-pool index, or dense index | DENSE_TAG) — classes route to the
    pool their size dictates, independent of how they were stored on disk.
    """
    dense_tag = 1 << 30
    d = len(enc["modes"])
    ids_parts, rows_parts = [], []
    remap = np.empty(d, dtype=np.int32)
    sd = dd = 0
    offsets = enc["offsets"]
    for off in range(0, d, chunk):
        hi = min(off + chunk, d)
        sub = {"modes": enc["modes"][off:hi],
               "offsets": offsets[off:hi + 1] - offsets[off],
               "data": enc["data"][offsets[off]:offsets[hi]]}
        rows = decode_classes(sub, nb_genomes, cw)
        counts = unpack_rows(rows, nb_genomes).sum(axis=1)
        small = counts <= s_w
        n_small = int(small.sum())
        n_dense = int((~small).sum())
        if n_small:
            ids_parts.append(bitmaps_to_ids_rows(rows[small], nb_genomes, s_w))
        if n_dense:
            rows_parts.append(rows[~small])
        remap[off:hi][small] = sd + np.arange(n_small, dtype=np.int32)
        remap[off:hi][~small] = ((dd + np.arange(n_dense, dtype=np.int32))
                                 | dense_tag)
        sd += n_small
        dd += n_dense
    ids = (np.concatenate(ids_parts) if ids_parts
           else np.zeros((0, s_w), np.int32))
    rows = (np.concatenate(rows_parts) if rows_parts
            else np.zeros((0, cw), np.uint32))
    return ids, rows, remap


def decode_classes(enc: dict, nb_genomes: int, cw: int) -> np.ndarray:
    """Inverse of :func:`encode_classes` -> uint32 bitmap rows [D, cw].

    Fully vectorized (the batch inverse of the reference's per-annotation
    ``decomp_annotation`` src/annotation.c:1840): ONE wholesale varint
    decode of every non-bitmap byte, per-class delta cumsum by segment
    arithmetic, id scatter for mode 2, and a +1/-1 difference-array cumsum
    for mode-1 run expansion — no per-class Python loop, so million-class
    checkpoints decode in seconds instead of minutes.
    """
    modes = np.asarray(enc["modes"])
    offsets = np.asarray(enc["offsets"], dtype=np.int64)
    data = np.asarray(enc["data"])
    d = len(modes)
    g = nb_genomes
    bits = np.zeros((d, g), dtype=bool)
    if d == 0:
        return pack_rows(bits, cw)
    lens = np.diff(offsets)
    byte_cls = np.repeat(np.arange(d, dtype=np.int64), lens)

    # ---- mode 0: fixed ceil(G/8) raw bytes per class -> unpackbits ----
    m0 = modes == MODE_BITMAP
    if m0.any():
        w8 = (g + 7) // 8
        bmb = data[m0[byte_cls]].reshape(-1, w8)
        bits[m0] = np.unpackbits(bmb, axis=1, bitorder="little")[:, :g]

    # ---- modes 1/2: one wholesale varint decode of the rest ----
    vsel = ~m0[byte_cls]
    vbytes = data[vsel]
    if len(vbytes):
        vals, starts = _varint_decode_all(vbytes)
        vcls = byte_cls[vsel][starts]              # class of each value
        # per-class cumulative sum (deltas -> absolute ids / run bounds):
        # subtract the running total at each class's first value.
        c = np.cumsum(vals)
        first = np.concatenate([[True], vcls[1:] != vcls[:-1]])
        fidx = np.flatnonzero(first)
        nvals = np.diff(np.concatenate([fidx, [len(vals)]]))
        base = np.repeat(c[fidx] - vals[fidx], nvals)
        absval = c - base
        pos = np.arange(len(vals), dtype=np.int64) - np.repeat(fidx, nvals)

        # mode 2: absolute ids -> scatter
        i2 = modes[vcls] == MODE_IDS
        if i2.any():
            flat = bits.reshape(-1)
            flat[vcls[i2] * g + absval[i2]] = True

        # mode 1: [start, end] pairs -> +1/-1 difference array, cumsum.
        # Row-padded width g+1 keeps the -1 at end+1 inside its own row;
        # every run balances within its row, so one global cumsum is safe.
        i1 = modes[vcls] == MODE_RUNS
        if i1.any():
            rcls, rpos, rval = vcls[i1], pos[i1], absval[i1]
            s_i = (rpos & 1) == 0
            diff = np.zeros(d * (g + 1), dtype=np.int32)
            np.add.at(diff, rcls[s_i] * (g + 1) + rval[s_i], 1)
            np.add.at(diff, rcls[~s_i] * (g + 1) + rval[~s_i] + 1, -1)
            run_bits = (np.cumsum(diff).reshape(d, g + 1)[:, :g] > 0)
            m1 = modes == MODE_RUNS
            bits[m1] = run_bits[m1]
    return pack_rows(bits, cw)
