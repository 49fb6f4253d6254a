#!/usr/bin/env bash
# Build the ACTUAL reference `bft` binary in this container, reproducibly.
#
# The reference needs Judy and jemalloc, which are not in this image; this
# harness supplies a std::map-backed Judy shim (shim/Judy.h + judy_shim.cpp,
# preserving Judy(3) semantics) and a no-op jemalloc header, and applies two
# upstream bugfix patches to a COPY of src/main.c (the `load -add_genomes`
# path heap corruption at src/main.c:221 and the cleanup OOB free at
# src/main.c:329 — see patches/main.c.patch; /root/reference is never
# modified).  Flags mirror the reference configure (configure:3012):
# -O3 -std=c99 -msse4.1 -mpopcnt.
#
# Usage: scripts/refbuild/build.sh [ref_dir] [out_dir]
#   default ref_dir=/root/reference, out_dir=/tmp/refbuild
# Produces $out_dir/bft.
set -euo pipefail

REF_DIR="${1:-/root/reference}"
OUT_DIR="${2:-/tmp/refbuild}"
HERE="$(cd "$(dirname "$0")" && pwd)"

mkdir -p "$OUT_DIR/src"
cp "$REF_DIR"/src/*.c "$OUT_DIR/src/"
cp -r "$HERE/shim" "$OUT_DIR/shim"

# Apply the two main.c bugfixes to the copy.
patch -p1 -d "$OUT_DIR" < "$HERE/patches/main.c.patch"

CFLAGS="-O3 -Wall -std=c99 -msse4.1 -mpopcnt -I$REF_DIR/include -I$OUT_DIR/shim"
# Object list = reference Makefile.in:27-32 (xxhsum.c and compression.c are
# not part of the reference build either).
OBJS="getRSS annotation branchingNode popcnt log2 extract_kmers fasta file_io \
Node UC insertNode bft intersection list main useful_macros marking merge \
presenceNode printMemory quicksort CC replaceAnnotation retrieveAnnotation \
snippets write_to_disk xxhash"

cd "$OUT_DIR"
g++ -O2 -c shim/judy_shim.cpp -o judy_shim.o
for f in $OBJS; do
  # include/Node.h:24-25 namespaces the xxhash API as BFT_HASH_*; xxhash.c
  # includes xxhash.h directly, so it needs the same define on its command
  # line to emit the namespaced symbols.
  gcc $CFLAGS -DXXH_NAMESPACE=BFT_HASH_ -c "src/$f.c" -o "src/$f.o"
done
g++ -o bft src/*.o judy_shim.o -lm
echo "built: $OUT_DIR/bft"
"$OUT_DIR/bft" --version 2>&1 | head -1
