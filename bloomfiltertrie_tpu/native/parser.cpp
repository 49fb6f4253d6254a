// Native fast path for host-side sequence parsing (component #15 analogue:
// reference src/fasta.c / include/kseq.h).  The TPU compute path never sees
// ASCII; this library turns k-mer files and FASTA streams into the engine's
// order-preserving 2-bit packed uint32 words at memory bandwidth, so host
// parsing cannot bottleneck device ingest (SURVEY §7 "hard parts").
//
// Layout contract (must match bloomfiltertrie_tpu/ops/codec.py):
//   base j of a k-mer -> word j/16, bits (30 - 2*(j%16)); A=00 C=01 G=10 T=11.
// Invalid (non-ACGT) k-mers produce zeroed rows + valid=0, mirroring
// parseKmerCount (reference src/fasta.c:3-53).
//
// Build: g++ -O3 -march=native -shared -fPIC parser.cpp -o libbftparser.so

#include <cstdint>
#include <cstddef>
#include <cstring>

namespace {

// ASCII -> 2-bit code, 0xFF invalid.  Accepts upper+lower case.
struct Lut {
    uint8_t v[256];
    Lut() {
        memset(v, 0xFF, sizeof(v));
        v['A'] = v['a'] = 0; v['C'] = v['c'] = 1;
        v['G'] = v['g'] = 2; v['T'] = v['t'] = 3;
    }
};
const Lut LUT;

inline int words_for_k(int k) { return (k + 15) / 16; }

// Pack codes[0..k) into out[0..W); caller guarantees codes valid.
inline void pack_row(const uint8_t* codes, int k, uint32_t* out) {
    const int w = words_for_k(k);
    for (int i = 0; i < w; i++) out[i] = 0;
    for (int j = 0; j < k; j++)
        out[j >> 4] |= static_cast<uint32_t>(codes[j]) << (30 - 2 * (j & 15));
}

}  // namespace

extern "C" {

// Parse an ASCII k-mer file buffer: one k-mer per line (first k chars used;
// rest of line ignored — reference parseKmerCount reads only k chars).
// Lines shorter than k are skipped.  Returns number of rows written.
// out_words: [max_n * W] uint32;  out_valid: [max_n] uint8.
int64_t bft_parse_kmer_lines(const uint8_t* buf, int64_t len, int k,
                             uint32_t* out_words, uint8_t* out_valid,
                             int64_t max_n) {
    const int w = words_for_k(k);
    int64_t n = 0;
    int64_t i = 0;
    uint8_t codes[256];
    while (i < len && n < max_n) {
        // find end of line
        int64_t eol = i;
        while (eol < len && buf[eol] != '\n') eol++;
        int64_t linelen = eol - i;
        if (linelen > 0 && buf[i + linelen - 1] == '\r') linelen--;
        if (linelen >= k) {
            bool ok = true;
            for (int j = 0; j < k; j++) {
                uint8_t c = LUT.v[buf[i + j]];
                codes[j] = c;
                if (c == 0xFF) ok = false;
            }
            if (!ok) {
                for (int j = 0; j < w; j++) out_words[n * w + j] = 0;
                out_valid[n] = 0;
            } else {
                pack_row(codes, k, &out_words[n * w]);
                out_valid[n] = 1;
            }
            n++;
        }
        i = eol + 1;
    }
    return n;
}

// K-merize one raw sequence buffer (no headers/newlines) with a rolling
// encoder: emits len-k+1 rows; windows containing a non-ACGT char are
// invalid+zeroed.  Returns number of rows (>=0), or -1 if out buffers are
// too small.
int64_t bft_kmerize_sequence(const uint8_t* seq, int64_t len, int k,
                             uint32_t* out_words, uint8_t* out_valid,
                             int64_t max_n) {
    const int w = words_for_k(k);
    int64_t n_rows = len - k + 1;
    if (n_rows < 0) n_rows = 0;
    if (n_rows > max_n) return -1;

    // rolling window of packed words + validity counter
    uint32_t row[8] = {0};
    const int tail_bases = k - 16 * (w - 1);
    const uint32_t tail_mask =
        tail_bases == 16 ? 0xFFFFFFFFu : (0xFFFFFFFFu << (32 - 2 * tail_bases));
    int64_t invalid_run = 0;  // windows poisoned while > 0

    // Prime the first k-1 bases.
    int64_t pos = 0;
    for (; pos < len && pos < k - 1; pos++) {
        uint8_t c = LUT.v[seq[pos]];
        // shift row left by 2 bits across words
        for (int i = 0; i < w; i++) {
            uint32_t hi = row[i] << 2;
            uint32_t lo = (i + 1 < w) ? (row[i + 1] >> 30) : 0;
            row[i] = hi | lo;
        }
        if (c == 0xFF) { invalid_run = k; c = 0; } else if (invalid_run) invalid_run--;
        row[(k - 1) >> 4] |= static_cast<uint32_t>(c) << (30 - 2 * ((k - 1) & 15));
    }
    for (int64_t out = 0; pos < len; pos++, out++) {
        uint8_t c = LUT.v[seq[pos]];
        for (int i = 0; i < w; i++) {
            uint32_t hi = row[i] << 2;
            uint32_t lo = (i + 1 < w) ? (row[i + 1] >> 30) : 0;
            row[i] = hi | lo;
        }
        if (c == 0xFF) { invalid_run = k; c = 0; } else if (invalid_run) invalid_run--;
        row[(k - 1) >> 4] |= static_cast<uint32_t>(c) << (30 - 2 * ((k - 1) & 15));
        row[w - 1] &= tail_mask;
        if (invalid_run) {
            for (int i = 0; i < w; i++) out_words[out * w + i] = 0;
            out_valid[out] = 0;
        } else {
            for (int i = 0; i < w; i++) out_words[out * w + i] = row[i];
            out_valid[out] = 1;
        }
    }
    return n_rows;
}

// Extract sequences from a FASTA buffer: concatenates each record's lines.
// Writes sequence boundaries into out_offsets (n_seqs+1 entries) and the raw
// concatenated bases into out_seq.  Returns number of sequences, or -1 if
// out_seq too small.
int64_t bft_fasta_extract(const uint8_t* buf, int64_t len,
                          uint8_t* out_seq, int64_t max_seq,
                          int64_t* out_offsets, int64_t max_seqs) {
    int64_t n_seq = 0;
    int64_t w = 0;
    int64_t i = 0;
    bool in_seq = false;
    while (i < len) {
        if (buf[i] == '>') {
            if (in_seq) { if (n_seq + 1 >= max_seqs) return -1; out_offsets[n_seq++] = w; }
            while (i < len && buf[i] != '\n') i++;
            i++;
            if (!in_seq) {
                if (n_seq + 1 >= max_seqs) return -1;
                out_offsets[n_seq] = w;  // provisional start written at close
            }
            in_seq = true;
            if (n_seq == 0) { out_offsets[0] = 0; }
            continue;
        }
        int64_t eol = i;
        while (eol < len && buf[eol] != '\n') eol++;
        int64_t linelen = eol - i;
        if (linelen > 0 && buf[i + linelen - 1] == '\r') linelen--;
        if (w + linelen > max_seq) return -1;
        memcpy(out_seq + w, buf + i, linelen);
        w += linelen;
        i = eol + 1;
    }
    if (in_seq) out_offsets[n_seq++] = w;
    // convert "end offsets" into [0, end0, end1, ...] prefix form
    for (int64_t s = n_seq; s > 0; s--) out_offsets[s] = out_offsets[s - 1];
    out_offsets[0] = 0;
    return n_seq;
}

}  // extern "C"
