"""Compact color-class encodings (reference annotation modes 0/1/2)."""

import numpy as np
import pytest

from bloomfiltertrie_tpu.models import colors_codec as cc


def _random_rows(rng, d, g, style):
    bits = np.zeros((d, g), dtype=bool)
    for i in range(d):
        if style == "sparse":
            ids = rng.choice(g, size=rng.integers(0, max(g // 20, 2)),
                             replace=False)
            bits[i, ids] = True
        elif style == "runs":
            for _ in range(rng.integers(1, 4)):
                s = rng.integers(0, g)
                e = min(g, s + rng.integers(1, g // 2 + 1))
                bits[i, s:e] = True
        else:  # dense
            bits[i] = rng.random(g) < 0.7
    cw = max(1, -(-g // 32))
    return cc.pack_rows(bits, cw), bits


@pytest.mark.parametrize("g", [3, 31, 32, 33, 100, 1000])
@pytest.mark.parametrize("style", ["sparse", "runs", "dense"])
def test_roundtrip(g, style):
    rng = np.random.default_rng(g * 7 + len(style))
    cw = max(1, -(-g // 32))
    rows, bits = _random_rows(rng, 40, g, style)
    enc = cc.encode_classes(rows, g)
    back = cc.decode_classes(enc, g, cw)
    np.testing.assert_array_equal(rows, back)


def test_empty_and_full_classes():
    g = 70
    cw = 3
    bits = np.zeros((4, g), dtype=bool)
    bits[1] = True                      # full set -> 1 run, mode 1 wins
    bits[2, [0]] = True                 # singleton
    bits[3, [g - 1]] = True             # last id
    rows = cc.pack_rows(bits, cw)
    enc = cc.encode_classes(rows, g)
    back = cc.decode_classes(enc, g, cw)
    np.testing.assert_array_equal(rows, back)
    assert enc["modes"][1] == cc.MODE_RUNS
    assert enc["offsets"][2] - enc["offsets"][1] <= 2


def test_best_mode_is_minimal():
    """Chosen mode is never larger than any other encoding (greedy rule of
    reference compute_best_mode, annotation.c:416)."""
    rng = np.random.default_rng(5)
    g = 200
    cw = -(-g // 32)
    rows, bits = _random_rows(rng, 60, g, "sparse")
    enc = cc.encode_classes(rows, g)
    sizes = np.diff(enc["offsets"])
    assert (sizes <= (g + 7) // 8).all()   # never worse than the bitmap
    # sparse rows should pick the id list and beat the bitmap when tiny
    tiny = bits.sum(axis=1) <= 3
    assert (sizes[tiny] <= 1 + 3 * 2).all()


def test_zero_classes():
    enc = cc.encode_classes(np.zeros((0, 1), np.uint32), 5)
    back = cc.decode_classes(enc, 5, 1)
    assert back.shape == (0, 1)


def test_compression_wins_at_scale():
    """1000-genome sparse panel: compact encoding far below bitmap bytes."""
    rng = np.random.default_rng(11)
    g = 1000
    cw = -(-g // 32)
    rows, _ = _random_rows(rng, 500, g, "sparse")
    enc = cc.encode_classes(rows, g)
    compact = len(enc["data"])
    bitmap = rows.size * 4
    assert compact < bitmap * 0.5
