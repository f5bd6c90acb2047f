// snapio: native host-I/O runtime for the TPU-native SNAP-class aligner.
//
// Role model: the reference aligner's C++ I/O stack — FASTQReader
// (SNAPLib/FASTQ.cpp), the BGZF/gzip writer with parallel compression
// workers (SNAPLib/GzipDataWriter.cpp:233 ParallelCoworker), and the
// buffered DataWriter chain (SNAPLib/DataWriter.cpp). This library
// provides the throughput-critical host-side pieces as plain C entry
// points (loaded from Python via ctypes):
//
//   * snapio_parse_fastq: scan a FASTQ text buffer into dense
//     [n, max_len] base-code / quality tensors ready for H2D transfer.
//   * snapio_bgzf_compress: multi-threaded BGZF compression (64KB
//     blocks, zlib raw deflate, BC extra field), the BAM output hot path.
//   * snapio_encode_seq / snapio_reverse_complement: batch helpers for
//     SAM/BAM record assembly.
//
// Build: make -C native  (g++ -O3 -shared -fPIC, links -lz -lpthread)

#include <vector>
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <cstdio>
#include <pthread.h>
#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------------------
// Base encoding table (mirrors snap_tpu.constants.BASE_ENCODE: A/C/G/T ->
// 0..3 upper or lower case, 'n' -> 5 (pad), everything else -> 4 (N)).
// ---------------------------------------------------------------------------
static uint8_t BASE_CODE[256];
static bool base_code_init_done = false;

static void init_base_code() {
    if (base_code_init_done) return;
    for (int i = 0; i < 256; i++) BASE_CODE[i] = 4;
    BASE_CODE['A'] = 0; BASE_CODE['a'] = 0;
    BASE_CODE['C'] = 1; BASE_CODE['c'] = 1;
    BASE_CODE['G'] = 2; BASE_CODE['g'] = 2;
    BASE_CODE['T'] = 3; BASE_CODE['t'] = 3;
    BASE_CODE['n'] = 5;
    base_code_init_done = true;
}

// ---------------------------------------------------------------------------
// FASTQ batch scanner.
//
// Parses up to max_reads complete 4-line records from buf[0:len).
// Outputs:
//   bases  [max_reads * max_len] u8  (code 4 padding beyond each length)
//   quals  [max_reads * max_len] u8  (0 padding)
//   lens   [max_reads] i32           (clamped to max_len)
//   id_off [max_reads] i64           (offset of id text, after '@')
//   id_len [max_reads] i64
// Returns number of records parsed; *consumed is the byte offset of the
// first unparsed (incomplete) record, so the caller can carry the tail
// into the next buffer. Returns -1 on malformed input.
// ---------------------------------------------------------------------------
int64_t snapio_parse_fastq(
    const char* buf, int64_t len,
    int64_t max_reads, int32_t max_len,
    uint8_t* bases, uint8_t* quals, int32_t* lens,
    int64_t* id_off, int64_t* id_len,
    int64_t* consumed)
{
    init_base_code();
    int64_t pos = 0;
    int64_t n = 0;
    *consumed = 0;
    while (n < max_reads) {
        int64_t rec_start = pos;
        // skip blank lines
        while (pos < len && (buf[pos] == '\n' || buf[pos] == '\r')) pos++;
        if (pos >= len) { *consumed = len; break; }
        rec_start = pos;
        if (buf[pos] != '@') return -1;
        // id line
        int64_t id_start = pos + 1;
        while (pos < len && buf[pos] != '\n') pos++;
        if (pos >= len) break;  // incomplete
        int64_t id_end = pos;
        if (id_end > id_start && buf[id_end - 1] == '\r') id_end--;
        pos++;
        // sequence line
        int64_t seq_start = pos;
        while (pos < len && buf[pos] != '\n') pos++;
        if (pos >= len) break;
        int64_t seq_end = pos;
        if (seq_end > seq_start && buf[seq_end - 1] == '\r') seq_end--;
        pos++;
        // plus line
        if (pos >= len) break;
        if (buf[pos] != '+') return -1;
        while (pos < len && buf[pos] != '\n') pos++;
        if (pos >= len) break;
        pos++;
        // quality line
        int64_t q_start = pos;
        while (pos < len && buf[pos] != '\n') pos++;
        int64_t q_end = pos;
        bool at_eof = (pos >= len);
        if (q_end > q_start && buf[q_end - 1] == '\r') q_end--;
        if (!at_eof) pos++;
        int64_t seq_len = seq_end - seq_start;
        int64_t q_len = q_end - q_start;
        if (at_eof && q_len < seq_len) break;  // incomplete final record
        if (q_len != seq_len) return -1;

        int32_t L = (int32_t)(seq_len < max_len ? seq_len : max_len);
        uint8_t* brow = bases + n * (int64_t)max_len;
        uint8_t* qrow = quals + n * (int64_t)max_len;
        for (int32_t i = 0; i < L; i++) {
            brow[i] = BASE_CODE[(uint8_t)buf[seq_start + i]];
            qrow[i] = (uint8_t)buf[q_start + i];
        }
        for (int32_t i = L; i < max_len; i++) { brow[i] = 4; qrow[i] = 0; }
        lens[n] = L;
        id_off[n] = id_start;
        id_len[n] = id_end - id_start;
        n++;
        *consumed = pos;
        (void)rec_start;
    }
    return n;
}

// ---------------------------------------------------------------------------
// BGZF compression (BAM output path).
//
// Mirrors GzipDataWriter's chunked BGZF emission with parallel
// compression workers (GzipDataWriter.cpp:233-340): input is split into
// <= 65280-byte blocks, each deflated raw (windowBits=-15) and wrapped
// in a gzip member with the 6-byte BC extra field carrying BSIZE.
// ---------------------------------------------------------------------------
static const int64_t BGZF_BLOCK = 65280;            // uncompressed block size
static const int64_t BGZF_MAX_OUT = 65536 + 1024;   // worst-case per block

struct BgzfJob {
    const uint8_t* data;
    int64_t len;
    int level;
    int64_t n_blocks;
    int64_t next_block;          // work queue cursor
    pthread_mutex_t lock;
    uint8_t* out;                // n_blocks * BGZF_MAX_OUT scratch
    int64_t* out_sizes;          // per-block compressed size
    int error;
};

static int bgzf_compress_block(
    const uint8_t* in, int64_t in_len, uint8_t* out, int64_t* out_len,
    int level)
{
    // gzip member header with BC extra field (SAM spec section 4.1)
    static const uint8_t hdr[18] = {
        0x1f, 0x8b, 8, 4, 0, 0, 0, 0, 0, 0xff,
        6, 0, 'B', 'C', 2, 0, 0, 0  // XLEN=6, SI1 SI2, SLEN=2, BSIZE(lo,hi)
    };
    memcpy(out, hdr, 18);

    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    if (deflateInit2(&zs, level, Z_DEFLATED, -15, 8,
                     Z_DEFAULT_STRATEGY) != Z_OK) return -1;
    zs.next_in = (Bytef*)in;
    zs.avail_in = (uInt)in_len;
    zs.next_out = out + 18;
    zs.avail_out = (uInt)(BGZF_MAX_OUT - 18 - 8);
    int ret = deflate(&zs, Z_FINISH);
    if (ret != Z_STREAM_END) { deflateEnd(&zs); return -1; }
    int64_t csize = (int64_t)zs.total_out;
    deflateEnd(&zs);

    int64_t bsize = 18 + csize + 8;  // total member size
    if (bsize > 65536) return -1;
    out[16] = (uint8_t)((bsize - 1) & 0xff);
    out[17] = (uint8_t)(((bsize - 1) >> 8) & 0xff);
    uint32_t crc = crc32(0, in, (uInt)in_len);
    uint8_t* tail = out + 18 + csize;
    tail[0] = crc & 0xff; tail[1] = (crc >> 8) & 0xff;
    tail[2] = (crc >> 16) & 0xff; tail[3] = (crc >> 24) & 0xff;
    uint32_t isize = (uint32_t)in_len;
    tail[4] = isize & 0xff; tail[5] = (isize >> 8) & 0xff;
    tail[6] = (isize >> 16) & 0xff; tail[7] = (isize >> 24) & 0xff;
    *out_len = bsize;
    return 0;
}

static void* bgzf_worker(void* arg) {
    BgzfJob* job = (BgzfJob*)arg;
    for (;;) {
        pthread_mutex_lock(&job->lock);
        int64_t b = job->next_block++;
        pthread_mutex_unlock(&job->lock);
        if (b >= job->n_blocks || job->error) return nullptr;
        int64_t off = b * BGZF_BLOCK;
        int64_t blen = job->len - off;
        if (blen > BGZF_BLOCK) blen = BGZF_BLOCK;
        int64_t osz = 0;
        if (bgzf_compress_block(job->data + off, blen,
                                job->out + b * BGZF_MAX_OUT, &osz,
                                job->level) != 0) {
            job->error = 1;
            return nullptr;
        }
        job->out_sizes[b] = osz;
    }
}

// Compress data into BGZF members. Returns total output bytes, or -1.
// out must have room for ceil(len/BGZF_BLOCK)*BGZF_MAX_OUT bytes (+28 if
// add_eof). add_eof appends the standard 28-byte BGZF EOF marker.
int64_t snapio_bgzf_compress(
    const uint8_t* data, int64_t len, int level, int n_threads,
    uint8_t* out, int add_eof)
{
    static const uint8_t EOF_BLOCK[28] = {
        0x1f, 0x8b, 0x08, 0x04, 0, 0, 0, 0, 0, 0xff, 0x06, 0x00,
        0x42, 0x43, 0x02, 0x00, 0x1b, 0x00, 0x03, 0x00, 0, 0, 0, 0,
        0, 0, 0, 0
    };
    int64_t n_blocks = (len + BGZF_BLOCK - 1) / BGZF_BLOCK;
    if (n_blocks == 0) {
        if (add_eof) { memcpy(out, EOF_BLOCK, 28); return 28; }
        return 0;
    }
    uint8_t* scratch = (uint8_t*)malloc(n_blocks * BGZF_MAX_OUT);
    int64_t* sizes = (int64_t*)calloc(n_blocks, sizeof(int64_t));
    if (!scratch || !sizes) { free(scratch); free(sizes); return -1; }

    BgzfJob job;
    job.data = data; job.len = len; job.level = level;
    job.n_blocks = n_blocks; job.next_block = 0;
    pthread_mutex_init(&job.lock, nullptr);
    job.out = scratch; job.out_sizes = sizes; job.error = 0;

    if (n_threads < 1) n_threads = 1;
    if (n_threads > n_blocks) n_threads = (int)n_blocks;
    pthread_t threads[64];
    if (n_threads > 64) n_threads = 64;
    int spawned = 0;
    for (int t = 1; t < n_threads; t++) {
        if (pthread_create(&threads[t], nullptr, bgzf_worker, &job) == 0) {
            spawned = t;
        } else break;
    }
    bgzf_worker(&job);
    for (int t = 1; t <= spawned; t++) pthread_join(threads[t], nullptr);
    pthread_mutex_destroy(&job.lock);

    int64_t total = -1;
    if (!job.error) {
        total = 0;
        for (int64_t b = 0; b < n_blocks; b++) {
            memcpy(out + total, scratch + b * BGZF_MAX_OUT, sizes[b]);
            total += sizes[b];
        }
        if (add_eof) { memcpy(out + total, EOF_BLOCK, 28); total += 28; }
    }
    free(scratch);
    free(sizes);
    return total;
}

// Worst-case output size for snapio_bgzf_compress.
int64_t snapio_bgzf_bound(int64_t len) {
    int64_t n_blocks = (len + BGZF_BLOCK - 1) / BGZF_BLOCK;
    return n_blocks * BGZF_MAX_OUT + 28;
}

// ---------------------------------------------------------------------------
// Sequence helpers for SAM/BAM assembly.
// ---------------------------------------------------------------------------

// codes (0..5) -> ASCII bases, in place batch
void snapio_decode_seq(const uint8_t* codes, int64_t n, char* out) {
    static const char DEC[6] = {'A', 'C', 'G', 'T', 'N', 'n'};
    for (int64_t i = 0; i < n; i++) out[i] = DEC[codes[i] > 5 ? 4 : codes[i]];
}

// ASCII -> reverse complement ASCII
void snapio_reverse_complement(const char* seq, int64_t n, char* out) {
    static char RC[256];
    static bool done = false;
    if (!done) {
        for (int i = 0; i < 256; i++) RC[i] = 'N';
        RC['A'] = 'T'; RC['C'] = 'G'; RC['G'] = 'C'; RC['T'] = 'A';
        RC['a'] = 't'; RC['c'] = 'g'; RC['g'] = 'c'; RC['t'] = 'a';
        RC['N'] = 'N'; RC['n'] = 'n';
        done = true;
    }
    for (int64_t i = 0; i < n; i++) out[i] = RC[(uint8_t)seq[n - 1 - i]];
}

}  // extern "C"

// ---------------------------------------------------------------------
// Affine-gap global-in-pattern DP + traceback (scalar). Semantics are
// an exact mirror of align/agcigar.py ag_global_alignment (itself the
// AffineGapVectorizedWithCigar::computeGlobalScore equivalent,
// AffineGapVectorized.h:1377-1460): gaps open from M only, best global
// readout at the last pattern column with ties preferring the later
// text row, and the same traceback tie rules. Emits run-length ops in
// traceback (reverse-alignment) order. Returns the number of runs, or
// -1 on overflow/no-alignment; *text_used_out = rows consumed.
static int32_t ag_tb_core(
    const uint8_t* text, int64_t tlen,
    const uint8_t* pattern, int64_t plen,
    int32_t open_cost, int32_t ext_cost,
    int32_t match_sc, int32_t sub_sc,
    uint8_t* ops_out, int32_t* counts_out, int32_t max_ops,
    int32_t* text_used_out) {
    const int32_t NEG = -10000000;
    if (plen <= 0 || tlen <= 0) return -1;
    const int64_t T = tlen, L = plen;
    // thread-local scratch: emission calls this per escalated winner,
    // so per-call malloc+page-touch of 3 T*L matrices dominated the
    // kernel at short-read sizes
    static thread_local std::vector<int32_t> Mm, Ee, Ff, h_prev, e;
    Mm.resize(T * L); Ee.resize(T * L); Ff.resize(T * L);
    h_prev.resize(L);
    e.assign(L, NEG);
    for (int64_t j = 0; j < L; j++)
        h_prev[j] = -(open_cost + (int32_t)j * ext_cost);
    int32_t best = NEG;
    int64_t best_row = -1;
    for (int64_t i = 0; i < T; i++) {
        int32_t h_init =
            (i == 0) ? 0 : -(open_cost + (int32_t)(i - 1) * ext_cost);
        int32_t* mrow = &Mm[i * L];
        int32_t* erow = &Ee[i * L];
        int32_t* frow = &Ff[i * L];
        uint8_t tb = text[i];
        // m from the diagonal
        int32_t prev_diag = h_init;
        int32_t pmax = NEG;  // running max of m[l] - open + l*ext
        int32_t hj;
        for (int64_t j = 0; j < L; j++) {
            uint8_t pb = pattern[j];
            int32_t s = (tb >= 4 || pb >= 4)
                            ? -1
                            : (tb == pb ? match_sc : -sub_sc);
            int32_t m = prev_diag + s;
            int32_t f = (j == 0)
                            ? NEG
                            : pmax - (int32_t)(j - 1) * ext_cost;
            mrow[j] = m;
            erow[j] = e[j];
            frow[j] = f;
            hj = m;
            if (e[j] > hj) hj = e[j];
            if (f > hj) hj = f;
            int32_t cand = m - open_cost + (int32_t)j * ext_cost;
            if (cand > pmax) pmax = cand;
            int32_t e_new = e[j] - ext_cost;
            int32_t e_alt = m - open_cost;
            e[j] = e_new > e_alt ? e_new : e_alt;
            prev_diag = h_prev[j];
            h_prev[j] = hj;
        }
        if (h_prev[L - 1] >= best) {
            best = h_prev[L - 1];
            best_row = i;
        }
    }
    if (best_row < 0) return -1;
    *text_used_out = (int32_t)(best_row + 1);

    // traceback
    int64_t i = best_row, j = L - 1;
    int32_t n_runs = 0;
    char state = 'H';
    auto push = [&](char a) -> bool {
        if (n_runs > 0 && (char)ops_out[n_runs - 1] == a) {
            counts_out[n_runs - 1]++;
            return true;
        }
        if (n_runs >= max_ops) return false;
        ops_out[n_runs] = (uint8_t)a;
        counts_out[n_runs] = 1;
        n_runs++;
        return true;
    };
    while (i >= 0 && j >= 0) {
        if (state == 'H') {
            int32_t m = Mm[i * L + j], ev = Ee[i * L + j],
                    fv = Ff[i * L + j];
            if (fv > (m > ev ? m : ev)) {
                state = 'I';
            } else if (ev > m) {
                state = 'D';
            } else {
                if (!push('M')) return -1;
                i--;
                j--;
            }
        } else if (state == 'D') {
            if (!push('D')) return -1;
            bool cont =
                i >= 1 && (Ee[(i - 1) * L + j] - ext_cost >
                           Mm[(i - 1) * L + j] - open_cost);
            i--;
            state = cont ? 'D' : 'H';
        } else {  // I
            if (!push('I')) return -1;
            bool cont =
                j >= 1 && (Ff[i * L + j - 1] - ext_cost >
                           Mm[i * L + j - 1] - open_cost);
            j--;
            state = cont ? 'I' : 'H';
        }
    }
    for (; i >= 0; i--)
        if (!push('D')) return -1;
    for (; j >= 0; j--)
        if (!push('I')) return -1;
    return n_runs;
}

extern "C" int32_t snapio_ag_traceback(
    const uint8_t* text, int64_t tlen,
    const uint8_t* pattern, int64_t plen,
    int32_t open_cost, int32_t ext_cost,
    int32_t match_sc, int32_t sub_sc,
    uint8_t* ops_out, int32_t* counts_out, int32_t max_ops,
    int32_t* text_used_out) {
    return ag_tb_core(text, tlen, pattern, plen, open_cost, ext_cost,
                      match_sc, sub_sc, ops_out, counts_out, max_ops,
                      text_used_out);
}

// ---------------------------------------------------------------------------
// Batched writer-side affine-gap CIGAR (the emission hot path for
// escalated winners). Mirrors snap_tpu.align.agcigar.compute_ag_cigar_at
// exactly: per row, the addFrontClipping fixup loop (SAM.cpp:1659-1712
// semantics) around the affine DP + traceback, the two
// insertion-normalization passes (AffineGapVectorized.cpp:459-509), the
// trailing-deletion strip, and clip-composed CIGAR rendering (M or =/X
// style). One call replaces ~0.3 ms/row of Python glue per escalated
// winner (~4% of reads at 1% error).
//
// Returns n on success; -2 when cigar_buf overflows (caller retries
// bigger). Per-row failure to stabilize -> out_loc[i] = -1.
// ---------------------------------------------------------------------------
extern "C" int64_t snapio_ag_cigar_batch(
    const uint8_t* genome, int64_t glen,
    const uint8_t* pat_buf, const uint8_t* qual_buf,
    const int64_t* pat_off,          // [n+1] row i = pat_buf[off[i]:off[i+1]]
    const int64_t* locs,             // [n] starting genome location
    const int32_t* fclips, const int32_t* bclips,  // [n]
    const int32_t* margins,          // [n] extra text beyond pattern span
    int64_t n,
    int32_t open_cost, int32_t ext_cost,
    int32_t match_sc, int32_t sub_sc,
    int32_t use_m,
    int64_t* out_loc, int32_t* out_nm,
    uint8_t* cigar_buf, int64_t cigar_cap, int64_t* cigar_end) {
    static thread_local std::vector<uint8_t> ops;
    static thread_local std::vector<int32_t> counts;
    char* out = (char*)cigar_buf;
    char* oend = (char*)cigar_buf + cigar_cap;
    char* p = out;

    auto put_u32 = [&](uint32_t v) {
        char tmp[12];
        int k = 0;
        if (v == 0) tmp[k++] = '0';
        while (v) { tmp[k++] = (char)('0' + v % 10); v /= 10; }
        if (p + k > oend) return false;
        while (k) *p++ = tmp[--k];
        return true;
    };

    for (int64_t r = 0; r < n; r++) {
        out_loc[r] = -1;
        out_nm[r] = 0;
        int64_t loc = locs[r];
        const uint8_t* pattern = pat_buf + pat_off[r];
        const uint8_t* quality = qual_buf + pat_off[r];
        int64_t plen = pat_off[r + 1] - pat_off[r];
        int32_t fclip = fclips[r], bclip = bclips[r];
        int64_t margin = margins[r];
        char* rec_start = p;
        bool done = false;
        for (int iter = 0; iter < 8 && !done; iter++) {
            if (plen <= 0 || loc < 0 || loc >= glen) break;
            int64_t tlen = plen + margin;
            if (loc + tlen > glen) tlen = glen - loc;
            if (tlen <= 0) break;
            const uint8_t* text = genome + loc;
            int64_t max_ops = tlen + plen + 4;
            if ((int64_t)ops.size() < max_ops) {
                ops.resize(max_ops);
                counts.resize(max_ops);
            }
            int32_t text_used = 0;
            int32_t nr = ag_tb_core(text, tlen, pattern, plen,
                                    open_cost, ext_cost, match_sc, sub_sc,
                                    ops.data(), counts.data(),
                                    (int32_t)max_ops, &text_used);
            if (nr <= 0) break;
            // runs are in traceback (reverse) order; runs[0] = END.
            int32_t min_i = 0, tail_ins = 0;
            if (ops[0] == 'I') { min_i = 1; tail_ins = counts[0]; }

            // normalization pass 1: flip insertion-before-substitution
            // (AffineGapVectorized.cpp:459-482)
            {
                int64_t row = 0, col = 0;
                for (int32_t i = nr - 1; i >= min_i; i--) {
                    char a = (char)ops[i];
                    int32_t c = counts[i];
                    if (a == 'M') { row += c; col += c; }
                    else if (a == 'D') { row += c; }
                    else {
                        if (i > 0 && row < text_used - 1 &&
                            col < plen - 1) {
                            if (pattern[col + 1] == pattern[col] &&
                                pattern[col + 1] != text[row] &&
                                quality[col] < 65) {
                                if (i + 1 <= nr - 1 && ops[i + 1] == 'M' &&
                                    counts[i - 1] > 1) {
                                    counts[i + 1] += 1; row += 1; col += 1;
                                }
                                if (ops[i - 1] == 'M' && counts[i - 1] > 1)
                                    counts[i - 1] -= 1;
                            }
                        }
                        col += c;
                    }
                }
            }
            // normalization pass 2 (AffineGapVectorized.cpp:485-509)
            {
                int64_t row = 0, col = 0;
                for (int32_t i = nr - 1; i >= min_i; i--) {
                    char a = (char)ops[i];
                    int32_t c = counts[i];
                    if (a == 'M') { row += c; col += c; }
                    else if (a == 'D') { row += c; }
                    else {
                        if (i > 0 && row + 1 < text_used - 1 &&
                            col + c < plen - 1) {
                            if (pattern[col + c] == pattern[col] &&
                                pattern[col + c + 1] != text[row + 1] &&
                                quality[col] < 65) {
                                if (i + 1 <= nr - 1 && ops[i + 1] == 'M' &&
                                    counts[i - 1] > 2) {
                                    counts[i + 1] += 2; row += 2; col += 2;
                                }
                                if (ops[i - 1] == 'M' && counts[i - 1] > 2)
                                    counts[i - 1] -= 2;
                            }
                        }
                        col += c;
                    }
                }
            }
            // final: reverse to alignment order, merge adjacent, count
            // edits and net deletion
            static thread_local std::vector<char> fa;
            static thread_local std::vector<int64_t> fc;
            fa.clear(); fc.clear();
            int64_t n_edits = 0, row = 0, col = 0;
            for (int32_t i = nr - 1; i >= min_i; i--) {
                char a = (char)ops[i];
                int64_t c = counts[i];
                if (a == 'D') { row += c; n_edits += c; }
                else if (a == 'I') { col += c; n_edits += c; }
                else {
                    for (int64_t q = 0; q < c; q++)
                        if (text[row + q] != pattern[col + q]) n_edits++;
                    row += c; col += c;
                }
                if (!fa.empty() && fa.back() == a) fc.back() += c;
                else { fa.push_back(a); fc.push_back(c); }
            }
            if (fa.empty()) break;
            int64_t add_front = 0;
            if (fa[0] == 'D') add_front = fc[0];
            else if (fa[0] == 'I') add_front = -fc[0];
            if (add_front > 0) { loc += add_front; continue; }
            if (add_front < 0) {
                int64_t k = -add_front;
                pattern += k; quality += k; plen -= k; fclip += (int32_t)k;
                continue;
            }
            int64_t bclip2 = bclip + tail_ins;
            // strip trailing deletions (never emitted)
            while (!fa.empty() && fa.back() == 'D') {
                n_edits -= fc.back();
                fa.pop_back(); fc.pop_back();
            }
            if (fa.empty()) break;
            // render: [fclip S] body [bclip S]
            bool ok = true;
            if (fclip) { ok = ok && put_u32((uint32_t)fclip);
                         if (ok && p < oend) *p++ = 'S'; else ok = false; }
            if (use_m) {
                for (size_t q = 0; ok && q < fa.size(); q++) {
                    ok = put_u32((uint32_t)fc[q]);
                    if (ok && p < oend) *p++ = fa[q]; else ok = false;
                }
            } else {
                // '=' / 'X' style for M segments
                int64_t rr = 0, cc = 0;
                for (size_t q = 0; ok && q < fa.size(); q++) {
                    char a = fa[q]; int64_t c = fc[q];
                    if (a == 'D') {
                        ok = put_u32((uint32_t)c);
                        if (ok && p < oend) *p++ = 'D'; else ok = false;
                        rr += c;
                    } else if (a == 'I') {
                        ok = put_u32((uint32_t)c);
                        if (ok && p < oend) *p++ = 'I'; else ok = false;
                        cc += c;
                    } else {
                        int64_t run = 0; int run_x = -1;
                        for (int64_t j2 = 0; ok && j2 < c; j2++) {
                            int x = text[rr + j2] != pattern[cc + j2];
                            if (run_x == -1 || x == run_x) { run_x = x; run++; }
                            else {
                                ok = put_u32((uint32_t)run);
                                if (ok && p < oend)
                                    *p++ = run_x ? 'X' : '=';
                                else ok = false;
                                run_x = x; run = 1;
                            }
                        }
                        if (ok && run) {
                            ok = put_u32((uint32_t)run);
                            if (ok && p < oend) *p++ = run_x ? 'X' : '=';
                            else ok = false;
                        }
                        rr += c; cc += c;
                    }
                }
            }
            if (ok && bclip2) {
                ok = put_u32((uint32_t)bclip2);
                if (ok && p < oend) *p++ = 'S'; else ok = false;
            }
            if (!ok) return -2;  // buffer overflow: caller retries bigger
            out_loc[r] = loc;
            out_nm[r] = (int32_t)n_edits;
            done = true;
        }
        if (!done) p = rec_start;  // failed row emits nothing
        cigar_end[r] = p - out;
    }
    return n;
}

// ---------------------------------------------------------------------------
// Batched SAM record formatter — the unsorted-SAM emission hot path.
//
// The reference assembles SAM text per record in C++ (SAM.cpp:1740-1900,
// SAMFormat::writeRead); our Python driver's per-read f-string loop was
// the end-to-end bottleneck (~hundreds of microseconds/read).  This
// formats every "simple" record of a batch (primary, gapless CIGAR
// fS/mM/bS, constant tag tail) into one output buffer in a single call.
//
// SEQ is decoded from base codes (0..3 ACGT, 4 N, 5 n); records with
// FLAG 0x10 emit the reverse complement and reversed qualities, matching
// OutputWriter._oriented.  QNAME is truncated at the first space or tab
// (SAM.cpp:1750-1753).  Tags are "PG\tNM:i:<nm><tag_tail>".
//
// rec_end[i] receives the cumulative end offset of record i so the
// caller can slice runs of records out of the buffer without copies.
// Returns total bytes written, or -1 if out_cap would overflow.
// ---------------------------------------------------------------------------
extern "C" {

static const char DECODE_FWD[8] = {'A', 'C', 'G', 'T', 'N', 'n', 'N', 'N'};
static const char DECODE_RC[8]  = {'T', 'G', 'C', 'A', 'N', 'n', 'N', 'N'};

static inline char* put_u64(char* p, uint64_t v) {
    char tmp[20];
    int k = 0;
    do { tmp[k++] = (char)('0' + v % 10); v /= 10; } while (v);
    while (k) *p++ = tmp[--k];
    return p;
}

static inline char* put_i64(char* p, int64_t v) {
    if (v < 0) { *p++ = '-'; return put_u64(p, (uint64_t)(-v)); }
    return put_u64(p, (uint64_t)v);
}

int64_t snapio_format_sam_simple(
    const uint8_t* bases, const uint8_t* quals, int64_t stride,
    const uint8_t* qname_buf, const int64_t* qname_off,   // per batch row
    const uint8_t* rname_buf, const int64_t* rname_off,   // contig names
    const int32_t* rows, int64_t n,
    const int32_t* flag, const int32_t* rname_id, const int64_t* pos,
    const int32_t* mapq, const int32_t* fs, const int32_t* mlen,
    const int32_t* bs, const int32_t* nm, const int32_t* rlen,
    const uint8_t* tag_pg, int64_t tag_pg_len,
    const uint8_t* tag_tail, int64_t tag_tail_len,
    uint8_t* out, int64_t out_cap, int64_t* rec_end)
{
    char* p = (char*)out;
    char* lim = (char*)out + out_cap;
    for (int64_t i = 0; i < n; i++) {
        int64_t r = rows[i];
        int64_t qn0 = qname_off[r], qn1 = qname_off[r + 1];
        int64_t L = rlen[i];
        // worst case: qname + 11 tabs + flag/pos/mapq/cigar digits +
        // seq + qual + tags
        if (p + (qn1 - qn0) + 2 * L + tag_pg_len + tag_tail_len + 96 > lim)
            return -1;
        for (int64_t q = qn0; q < qn1; q++) {
            uint8_t c = qname_buf[q];
            if (c == ' ' || c == '\t') break;
            *p++ = (char)c;
        }
        *p++ = '\t';
        p = put_u64(p, (uint64_t)flag[i]);
        *p++ = '\t';
        int64_t rn0 = rname_off[rname_id[i]], rn1 = rname_off[rname_id[i] + 1];
        memcpy(p, rname_buf + rn0, rn1 - rn0);
        p += rn1 - rn0;
        *p++ = '\t';
        p = put_i64(p, pos[i]);
        *p++ = '\t';
        p = put_u64(p, (uint64_t)mapq[i]);
        *p++ = '\t';
        if (fs[i]) { p = put_u64(p, (uint64_t)fs[i]); *p++ = 'S'; }
        p = put_u64(p, (uint64_t)mlen[i]);
        *p++ = 'M';
        if (bs[i]) { p = put_u64(p, (uint64_t)bs[i]); *p++ = 'S'; }
        memcpy(p, "\t*\t0\t0\t", 7);
        p += 7;
        const uint8_t* b = bases + r * stride;
        const uint8_t* q8 = quals + r * stride;
        if (flag[i] & 0x10) {
            for (int64_t j = L - 1; j >= 0; j--) *p++ = DECODE_RC[b[j] & 7];
            *p++ = '\t';
            for (int64_t j = L - 1; j >= 0; j--) *p++ = (char)q8[j];
        } else {
            for (int64_t j = 0; j < L; j++) *p++ = DECODE_FWD[b[j] & 7];
            *p++ = '\t';
            memcpy(p, q8, L);
            p += L;
        }
        *p++ = '\t';
        memcpy(p, tag_pg, tag_pg_len);
        p += tag_pg_len;
        memcpy(p, "\tNM:i:", 6);
        p += 6;
        p = put_i64(p, nm[i]);
        memcpy(p, tag_tail, tag_tail_len);
        p += tag_tail_len;
        *p++ = '\n';
        rec_end[i] = p - (char*)out;
    }
    return p - (char*)out;
}

// Paired variant of the simple-record formatter: full FLAG, RNEXT is
// always "=" (fast-path pairs are same-contig by construction), PNEXT
// and TLEN columns, and the per-record QS:i: mate-quality-sum tag the
// paired driver always attaches (the streaming dup-marker input,
// reference SAM.cpp:1826-1837). Everything else matches
// snapio_format_sam_simple.
int64_t snapio_format_sam_paired(
    const uint8_t* bases, const uint8_t* quals, int64_t stride,
    const uint8_t* qname_buf, const int64_t* qname_off,   // per batch row
    const uint8_t* rname_buf, const int64_t* rname_off,   // contig names
    const int32_t* rows, int64_t n,
    const int32_t* flag, const int32_t* rname_id, const int64_t* pos,
    const int32_t* mapq, const int32_t* fs, const int32_t* mlen,
    const int32_t* bs, const int32_t* nm, const int32_t* rlen,
    const int64_t* pnext, const int64_t* tlen, const int32_t* qs,
    const uint8_t* tag_pg, int64_t tag_pg_len,
    const uint8_t* tag_tail, int64_t tag_tail_len,
    uint8_t* out, int64_t out_cap, int64_t* rec_end)
{
    char* p = (char*)out;
    char* lim = (char*)out + out_cap;
    for (int64_t i = 0; i < n; i++) {
        int64_t r = rows[i];
        int64_t qn0 = qname_off[r], qn1 = qname_off[r + 1];
        int64_t L = rlen[i];
        if (p + (qn1 - qn0) + 2 * L + tag_pg_len + tag_tail_len + 128 > lim)
            return -1;
        for (int64_t q = qn0; q < qn1; q++) {
            uint8_t c = qname_buf[q];
            if (c == ' ' || c == '\t') break;
            *p++ = (char)c;
        }
        *p++ = '\t';
        p = put_u64(p, (uint64_t)flag[i]);
        *p++ = '\t';
        int64_t rn0 = rname_off[rname_id[i]], rn1 = rname_off[rname_id[i] + 1];
        memcpy(p, rname_buf + rn0, rn1 - rn0);
        p += rn1 - rn0;
        *p++ = '\t';
        p = put_i64(p, pos[i]);
        *p++ = '\t';
        p = put_u64(p, (uint64_t)mapq[i]);
        *p++ = '\t';
        if (fs[i]) { p = put_u64(p, (uint64_t)fs[i]); *p++ = 'S'; }
        p = put_u64(p, (uint64_t)mlen[i]);
        *p++ = 'M';
        if (bs[i]) { p = put_u64(p, (uint64_t)bs[i]); *p++ = 'S'; }
        *p++ = '\t';
        *p++ = '=';
        *p++ = '\t';
        p = put_i64(p, pnext[i]);
        *p++ = '\t';
        p = put_i64(p, tlen[i]);
        *p++ = '\t';
        const uint8_t* b = bases + r * stride;
        const uint8_t* q8 = quals + r * stride;
        if (flag[i] & 0x10) {
            for (int64_t j = L - 1; j >= 0; j--) *p++ = DECODE_RC[b[j] & 7];
            *p++ = '\t';
            for (int64_t j = L - 1; j >= 0; j--) *p++ = (char)q8[j];
        } else {
            for (int64_t j = 0; j < L; j++) *p++ = DECODE_FWD[b[j] & 7];
            *p++ = '\t';
            memcpy(p, q8, L);
            p += L;
        }
        *p++ = '\t';
        memcpy(p, tag_pg, tag_pg_len);
        p += tag_pg_len;
        memcpy(p, "\tNM:i:", 6);
        p += 6;
        p = put_i64(p, nm[i]);
        // tag order matches OutputWriter._tags: PG, NM, RG block
        // (tag_tail), then the trailing QS:i: extra
        memcpy(p, tag_tail, tag_tail_len);
        p += tag_tail_len;
        memcpy(p, "\tQS:i:", 6);
        p += 6;
        p = put_i64(p, qs[i]);
        *p++ = '\n';
        rec_end[i] = p - (char*)out;
    }
    return p - (char*)out;
}

}  // extern "C"
