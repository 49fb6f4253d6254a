"""Pure-Python oracle implementing the reference BFT's observable semantics.

The reference binary cannot be built here (its Judy/jemalloc deps are absent
from the image), so golden tests compare the engine against this oracle, which
follows the behavior spec in SURVEY.md §3 exactly: colored k-mer sets, CSV
presence matrices, branching counts, sequence-query thresholds.  Only
observable outputs are modeled (SURVEY §3: internal encodings are never
compared, extraction is set-equality).
"""

from __future__ import annotations

import math

COMP = str.maketrans("ACGTacgt", "TGCATGCA")
VALID = set("ACGTacgt")
IUPAC = set("RYSWKMBDHVNryswkmbdhvn")


def revcomp(s: str) -> str:
    return s.translate(COMP)[::-1]


def is_valid_kmer(s: str) -> bool:
    return all(c in VALID for c in s)


class OracleBFT:
    """dict-of-sets colored de Bruijn graph with reference semantics."""

    def __init__(self, k: int):
        self.k = k
        self.genomes: list[str] = []
        self.kmers: dict[str, set[int]] = {}

    def insert_genome(self, name: str, kmers: list[str]):
        gid = len(self.genomes)
        self.genomes.append(name)
        for km in kmers:
            km = km[: self.k].upper()
            if not is_valid_kmer(km):
                continue  # parseKmerCount rejects IUPAC k-mers (fasta.c:3)
            self.kmers.setdefault(km, set()).add(gid)

    def contains(self, km: str) -> bool:
        return is_valid_kmer(km) and km.upper() in self.kmers

    def colors(self, km: str) -> set[int]:
        return self.kmers.get(km.upper(), set()) if is_valid_kmer(km) else set()

    def presence_row(self, km: str) -> list[int]:
        """query_kmers CSV row: 0/1 per genome; IUPAC row all-zero."""
        cs = self.colors(km)
        return [1 if g in cs else 0 for g in range(len(self.genomes))]

    def successors(self, km: str) -> list[str]:
        return [km[1:] + b for b in "ACGT" if km[1:] + b in self.kmers]

    def predecessors(self, km: str) -> list[str]:
        return [b + km[:-1] for b in "ACGT" if b + km[:-1] in self.kmers]

    def is_branching(self, km: str) -> bool:
        """file_io.c:943-948: >1 successors, or else >1 predecessors."""
        if len(self.successors(km)) > 1:
            return True
        return len(self.predecessors(km)) > 1

    def branching_count(self, query_kmers: list[str]) -> int:
        return sum(self.is_branching(km) for km in query_kmers
                   if is_valid_kmer(km))

    def query_sequence(self, seq: str, threshold: float,
                       canonical: bool) -> list[int]:
        """bft.c:1241-1351 semantics (early abort is observationally a no-op)."""
        n = len(seq) - self.k + 1
        if n <= 0:
            return []
        need = math.ceil(n * threshold)
        counts = [0] * len(self.genomes)
        for i in range(n):
            km = seq[i: i + self.k]
            if canonical:
                rc = revcomp(km)
                if km >= rc:   # strcmp(kmer, rc) >= 0 picks rc (bft.c:1287-1293)
                    km = rc
            if not is_valid_kmer(km):
                continue
            for g in self.kmers.get(km.upper(), ()):  # noqa: E501
                counts[g] += 1
        return [g for g in range(len(self.genomes)) if counts[g] >= need]

    def all_kmers(self) -> set[str]:
        return set(self.kmers)
