"""Configuration for the TPU-native colored de Bruijn graph engine.

The reference (BloomFilterTrie) hardcodes its format parameters in
``include/default_param.h`` (BF bits=1504, prefix length=9 chars, UC cap=255,
skip cell=128, transform threshold=3584) and serializes per-level parameters
with the index (``src/write_to_disk.c:78-86``).  Here all knobs live in one
dataclass which travels with every checkpoint manifest.

Reference parity notes:
  * k: the reference requires k % 9 == 0 and k <= 126 (``src/main.c:61-63``).
    We support any 4 <= k <= 126; equality tests against the reference are only
    meaningful at multiples of 9.
  * (r1, r2): the reference draws Bloom seeds from ``rand()`` without ``srand``
    (``src/CC.c:247-250``) and serializes them.  We make them explicit config.
"""

from __future__ import annotations

import dataclasses


MAX_K = 126          # reference: include/default_param.h:4 (KMER_LENGTH_MAX)
MAX_GENOMES = 100_000_000  # reference: include/default_param.h (NB_MAX_GENOMES)


def words_for_k(k: int) -> int:
    """Number of uint32 words holding a 2-bit-packed k-mer (16 bases/word)."""
    return (k + 15) // 16


@dataclasses.dataclass(frozen=True)
class BFTConfig:
    """All engine parameters.

    Attributes:
      k: k-mer length (4..126).  Reference constraint is k % 9 == 0.
      initial_capacity: starting k-mer table capacity per shard (power of two).
      initial_color_capacity: starting SMALL-pool color-class rows (power of
        2) — sorted id-list classes of <= color_small_width genomes
        (models/table.py ColorStore).
      initial_dense_color_capacity: starting DENSE-pool rows (power of 2) —
        bitmap classes of > color_small_width genomes.
      color_small_width: S, the id-list width of the small color pool.  A
        class of <= S genomes costs S*4 bytes instead of ceil(G/32)*4 — the
        in-memory analogue of the reference's per-annotation best-mode pick
        (src/annotation.c:416).  Raise for very diverse pan-genomes; lower
        to 4 to halve small-class memory.
      bloom_log2_bits: log2 of Bloom filter bits per shard.  The reference uses
        a 1504-bit filter *per CC* (``default_param.h:42``); ours is one flat
        per-shard bit plane probed with two hashes.
      bloom_seed1 / bloom_seed2: hash seeds (reference r1/r2 analogue).
      treshold_compression: genomes between color-dictionary compressions
        (reference ``BFT_Root.treshold_compression``, CLI uses 1).
      shard_bits: log2 of shard count used for prefix sharding; the shard key
        is the top ``shard_bits`` bits of the first packed word (the analogue
        of the reference trie's first 9-char prefix level as hash partition).
      batch_size: host->device ingestion batch size in k-mers.
      pending_runs: buffer depth of the window-buffered insert path — how
        many append-chunks worth of raw rows accumulate before a forced
        flush into the main table.  The TPU analogue of the reference's UC
        capacity before a burst (NB_KMERS_PER_UC=255,
        include/default_param.h:17-31).
      genome_window: how many CONSECUTIVE genomes may share one window
        flush (multiple of 32; the flush's per-k-mer genome-set masks are
        this many bits).  The reference pays its insert cost per k-mer
        (src/insertNode.c:18) so many small genomes cost the same as one
        big one; the batched design pays a fixed cost per FLUSH, and the
        window amortizes it over up to this many genomes — the decisive
        knob for pan-genome builds of many small strains.
      bloom_enabled: maintain the per-shard Bloom plane on insert.  Unlike
        the reference (whose pointer walk is gated by the BF probe,
        src/presenceNode.c:1335-1362), the sorted-table design answers exact
        membership via a streaming rank kernel that is CHEAPER than two
        random-gather Bloom probes, so the plane is a query-path OPTION
        (``use_bloom_prefilter``), not a requirement; disable to reclaim
        ~10-15%% of flush time.  Queries are exact either way.
    """

    k: int = 27
    initial_capacity: int = 1 << 16
    initial_color_capacity: int = 1 << 12
    initial_dense_color_capacity: int = 1 << 10
    color_small_width: int = 8
    bloom_log2_bits: int = 26
    bloom_seed1: int = 0x9E3779B1
    bloom_seed2: int = 0x85EBCA77
    treshold_compression: int = 1
    shard_bits: int = 0
    batch_size: int = 1 << 20
    pending_runs: int = 8
    genome_window: int = 256
    canonical: bool = False
    bloom_enabled: bool = True

    def __post_init__(self):
        if not (4 <= self.k <= MAX_K):
            raise ValueError(f"k must be in [4, {MAX_K}], got {self.k}")
        for name in ("initial_capacity", "initial_color_capacity",
                     "initial_dense_color_capacity"):
            v = getattr(self, name)
            if v & (v - 1):
                raise ValueError(f"{name} must be a power of two, got {v}")
        if not (1 <= self.color_small_width <= 256):
            raise ValueError("color_small_width must be in [1, 256]")
        if self.genome_window < 32 or self.genome_window % 32:
            raise ValueError("genome_window must be a positive multiple "
                             "of 32")

    @property
    def words(self) -> int:
        return words_for_k(self.k)

    @property
    def n_shards(self) -> int:
        return 1 << self.shard_bits

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "BFTConfig":
        return cls(**d)
