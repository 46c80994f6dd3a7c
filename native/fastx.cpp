// Native FASTA/FASTQ parser + 2-bit encoder feeding the device input
// pipeline.  Fills the role of the reference's needletail-based ingest
// (/root/reference/src/io.rs:12-72) as compiled host code: scans records,
// drops reads containing any non-ACGT base (io.rs:41-48 policy), 2-bit
// encodes survivors (A=0 C=1 G=2 T=3, alphabet.rs:119-127), and reports the
// same counters (n_bases, bad_bases, bad_reads).
//
// C ABI for ctypes:
//   void* ktp_open(const char* path)        — NULL on failure (gz supported)
//   long  ktp_next_block(h, codes_buf, cap, offsets, max_reads, stats[4])
//         — fills codes_buf with concatenated 2-bit codes (one byte per
//           base), offsets[0..n] with read boundaries; returns n_reads
//           (0 = EOF, -1 = error / buffer too small for one read).
//           stats accumulates {n_bases, bad_bases, bad_reads, n_records}.
//   long  ktp_next_block_packed(h, words_buf, cap_words, word_offsets,
//                               lengths, max_reads, stats, n_threads)
//         — same record scan, but emits device-layout packed words:
//           16 bases per uint32, first base in the TOP 2 bits (the
//           ReadBatch word layout of base/sequence.py); each read starts
//           at a fresh word, tail zero-padded.  Encoding runs across
//           n_threads.  Reads with any non-ACGT base are dropped.
//   void  ktp_close(h)
//
// Build: make -C native  (g++ -O3 -shared; zlib for .gz)

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <condition_variable>
#include <mutex>
#include <thread>
#include <vector>
#include <zlib.h>

namespace {

constexpr size_t CHUNK = 1 << 20;

// Background decompressor: a reader thread pulls CHUNK slabs through
// gzread (zlib inflate / plain read) into a small ring while the caller's
// thread parses and encodes — the double-buffering the ingest pipeline
// needs to keep the encoder fed (the reference reads synchronously on the
// parse thread, io.rs:12-72; kmercount.rs's producer/consumer channels
// play this role for counting).
struct Reader {
    gzFile gz = nullptr;
    std::thread th;
    std::mutex mu;
    std::condition_variable cv_prod, cv_cons;
    static constexpr int NBUF = 4;
    struct Slab {
        std::vector<char> data;
        size_t len = 0;
    };
    Slab slabs[NBUF];
    int produced = 0, consumed = 0;
    bool done = false, stop = false;

    void start(gzFile f) {
        gz = f;
        th = std::thread([this] { loop(); });
    }

    void loop() {
        for (;;) {
            {
                std::unique_lock<std::mutex> lk(mu);
                cv_prod.wait(lk, [&] {
                    return stop || produced - consumed < NBUF;
                });
                if (stop) return;
            }
            Slab &s = slabs[produced % NBUF];
            s.data.resize(CHUNK);
            int n = gzread(gz, s.data.data(), static_cast<unsigned>(CHUNK));
            {
                std::lock_guard<std::mutex> lk(mu);
                s.len = n > 0 ? static_cast<size_t>(n) : 0;
                ++produced;
                if (n <= 0) done = true;
            }
            cv_cons.notify_all();
            if (n <= 0) return;
        }
    }

    // Blocks until a slab is available; false at EOF.  The pointer stays
    // valid until advance() (the producer never reuses an unconsumed slab).
    bool next(const char **p, size_t *n) {
        std::unique_lock<std::mutex> lk(mu);
        cv_cons.wait(lk, [&] { return produced > consumed || done; });
        while (produced > consumed) {
            Slab &s = slabs[consumed % NBUF];
            if (s.len == 0) {       // terminal empty slab
                ++consumed;
                cv_prod.notify_all();
                continue;
            }
            *p = s.data.data();
            *n = s.len;
            return true;
        }
        return false;
    }

    void advance() {
        {
            std::lock_guard<std::mutex> lk(mu);
            ++consumed;
        }
        cv_prod.notify_all();
    }

    void shutdown() {
        {
            std::lock_guard<std::mutex> lk(mu);
            stop = true;
        }
        cv_prod.notify_all();
        if (th.joinable()) th.join();
    }
};

struct Parser {
    gzFile gz = nullptr;           // zlib handles plain files transparently
    Reader reader;                 // background decompress thread
    char *buf = nullptr;           // carry buffer for partial lines
    size_t buf_len = 0, buf_cap = 0;
    size_t pos = 0;                // scan position in buf
    size_t last_consumed = 0;      // bytes consumed by the last next_line
    bool eof = false;
    bool fastq = false;
    bool format_known = false;

    // packed-path staging: record bytes copied out of the carry buffer so
    // encoding can run after further next_line calls (which may refill)
    std::vector<char> stage;
    std::vector<size_t> rec_off, rec_len;
    // one record that did not fit the caller's word budget, kept for the
    // next call
    std::vector<char> pending;
    bool has_pending = false;

    bool fill() {
        if (eof) return buf_len > pos;
        if (pos > 0) {  // compact consumed prefix
            memmove(buf, buf + pos, buf_len - pos);
            buf_len -= pos;
            pos = 0;
        }
        if (buf_cap - buf_len < CHUNK) {
            buf_cap = buf_cap ? buf_cap * 2 : (CHUNK * 2);
            buf = static_cast<char *>(realloc(buf, buf_cap));
        }
        const char *slab;
        size_t n;
        if (!reader.next(&slab, &n)) {
            eof = true;
            return buf_len > pos;
        }
        memcpy(buf + buf_len, slab, n);
        reader.advance();
        buf_len += n;
        return true;
    }

    // returns pointer to next line (in buf) and its length, or nullptr at EOF.
    // The line stays valid until the next fill(); callers consume immediately.
    char *next_line(size_t *len) {
        for (;;) {
            char *nl = static_cast<char *>(
                memchr(buf + pos, '\n', buf_len - pos));
            if (nl) {
                *len = static_cast<size_t>(nl - (buf + pos));
                char *line = buf + pos;
                last_consumed = *len + 1;
                pos += *len + 1;
                if (*len && line[*len - 1] == '\r') --*len;
                return line;
            }
            if (eof) {
                if (buf_len > pos) {  // last line without newline
                    *len = buf_len - pos;
                    char *line = buf + pos;
                    last_consumed = *len;
                    pos = buf_len;
                    return line;
                }
                return nullptr;
            }
            if (!fill()) {
                continue;  // loop re-checks eof
            }
        }
    }
};

// ASCII -> 2-bit code, 0xFF invalid (upper+lower case)
const uint8_t *encode_table() {
    static uint8_t t[256];
    static bool init = false;
    if (!init) {
        memset(t, 0xFF, sizeof(t));
        t['A'] = t['a'] = 0; t['C'] = t['c'] = 1;
        t['G'] = t['g'] = 2; t['T'] = t['t'] = 3;
        init = true;
    }
    return t;
}

}  // namespace

extern "C" {

void *ktp_open(const char *path) {
    gzFile f = gzopen(path, "rb");
    if (!f) return nullptr;
    gzbuffer(f, 1 << 20);
    Parser *p = new Parser();
    p->gz = f;
    p->reader.start(f);     // decompress-ahead thread (double buffering)
    return p;
}

void ktp_close(void *h) {
    Parser *p = static_cast<Parser *>(h);
    if (!p) return;
    p->reader.shutdown();
    gzclose(p->gz);
    free(p->buf);
    delete p;
}

long ktp_next_block(void *h, uint8_t *codes_buf, long cap,
                    int64_t *offsets, long max_reads, int64_t *stats) {
    Parser *p = static_cast<Parser *>(h);
    const uint8_t *enc = encode_table();
    long n_reads = 0;
    int64_t used = 0;
    offsets[0] = 0;

    while (n_reads < max_reads) {
        size_t len;
        char *line = p->next_line(&len);
        if (!line) break;
        if (len == 0) continue;

        if (!p->format_known) {
            if (line[0] == '@') p->fastq = true;
            else if (line[0] == '>') p->fastq = false;
            else return -1;
            p->format_known = true;
        }

        if (p->fastq) {
            if (line[0] != '@') return -1;
            size_t slen;
            char *seq = p->next_line(&slen);
            if (!seq) break;
            // encode immediately: seq points into the carry buffer and the
            // two next_line calls below may trigger a refill
            if (used + static_cast<int64_t>(slen) > cap) return -1;
            int64_t bad = 0;
            for (size_t i = 0; i < slen; ++i) {
                uint8_t c = enc[static_cast<uint8_t>(seq[i])];
                bad += (c == 0xFF);
                codes_buf[used + static_cast<int64_t>(i)] = c;
            }
            size_t l2, l3;
            char *plus = p->next_line(&l2);     // '+' separator
            // a wrapped (multi-line) record would put sequence here —
            // fail fast so the python fallback parser takes over
            if (!plus || l2 == 0 || plus[0] != '+') return -1;
            p->next_line(&l3);          // quality (skipped)
            stats[0] += static_cast<int64_t>(slen);
            stats[3] += 1;
            if (bad) {
                stats[1] += bad;
                stats[2] += 1;
                continue;               // drop whole read
            }
            used += static_cast<int64_t>(slen);
            offsets[++n_reads] = used;
        } else {
            if (line[0] != '>') return -1;
            // multi-line FASTA: accumulate until next '>' or EOF
            int64_t start = used;
            int64_t bad = 0;
            for (;;) {
                // peek: if next line starts with '>' push it back
                size_t save_pos = p->pos;
                size_t slen;
                char *seq = p->next_line(&slen);
                if (!seq) break;
                if (slen && seq[0] == '>') {
                    // push the header line back for the outer loop; pos and
                    // last_consumed are consistent with the *current* buffer
                    // state even if next_line compacted/refilled.
                    p->pos -= p->last_consumed;
                    break;
                }
                (void)save_pos;
                if (used + static_cast<int64_t>(slen) > cap) return -1;
                for (size_t i = 0; i < slen; ++i) {
                    uint8_t c = enc[static_cast<uint8_t>(seq[i])];
                    bad += (c == 0xFF);
                    codes_buf[used++] = c;
                }
            }
            int64_t slen = used - start;
            stats[0] += slen;
            stats[3] += 1;
            if (bad) {
                stats[1] += bad;
                stats[2] += 1;
                used = start;           // drop whole read
                continue;
            }
            if (slen > 0) offsets[++n_reads] = used;
        }
    }
    return n_reads;
}

long ktp_next_block_packed(void *h, uint32_t *words_buf, long cap_words,
                           int64_t *word_offsets, int32_t *lengths,
                           long max_reads, int64_t *stats,
                           int32_t n_threads) {
    Parser *p = static_cast<Parser *>(h);
    const uint8_t *enc = encode_table();
  restart:
    p->stage.clear();
    p->rec_off.clear();
    p->rec_len.clear();
    int64_t words_needed = 0;
    auto words_of = [](size_t n) { return (int64_t)((n + 15) / 16); };

    // ---- pass 1: gather raw records into the staging buffer -------------
    if (p->has_pending) {
        if (words_of(p->pending.size()) > cap_words) return -1;
        p->rec_off.push_back(0);
        p->rec_len.push_back(p->pending.size());
        p->stage.assign(p->pending.begin(), p->pending.end());
        words_needed += words_of(p->pending.size());
        p->has_pending = false;
    }
    while ((long)p->rec_len.size() < max_reads) {
        size_t len;
        char *line = p->next_line(&len);
        if (!line) break;
        if (len == 0) continue;
        if (!p->format_known) {
            if (line[0] == '@') p->fastq = true;
            else if (line[0] == '>') p->fastq = false;
            else return -1;
            p->format_known = true;
        }
        size_t start = p->stage.size();
        size_t slen = 0;
        if (p->fastq) {
            if (line[0] != '@') return -1;
            char *seq = p->next_line(&slen);
            if (!seq) break;
            p->stage.insert(p->stage.end(), seq, seq + slen);
            size_t l2, l3;
            char *plus = p->next_line(&l2);     // '+' separator
            if (!plus || l2 == 0 || plus[0] != '+') return -1;
            p->next_line(&l3);          // quality (skipped)
        } else {
            if (line[0] != '>') return -1;
            for (;;) {
                size_t l;
                char *seq = p->next_line(&l);
                if (!seq) break;
                if (l && seq[0] == '>') { p->pos -= p->last_consumed; break; }
                p->stage.insert(p->stage.end(), seq, seq + l);
            }
            slen = p->stage.size() - start;
            if (slen == 0) continue;
        }
        if (words_needed + words_of(slen) > cap_words) {
            // keep for the next call
            p->pending.assign(p->stage.begin() + start, p->stage.end());
            p->stage.resize(start);
            p->has_pending = true;
            if (p->rec_len.empty()) return -1;  // single read over budget
            break;
        }
        p->rec_off.push_back(start);
        p->rec_len.push_back(slen);
        words_needed += words_of(slen);
    }
    long n_rec = (long)p->rec_len.size();
    if (n_rec == 0) return 0;

    // ---- pass 2: parallel encode into device word layout -----------------
    word_offsets[0] = 0;
    for (long r = 0; r < n_rec; ++r)
        word_offsets[r + 1] = word_offsets[r] + words_of(p->rec_len[r]);
    std::vector<int64_t> badc(n_rec);
    std::atomic<long> next{0};
    auto worker = [&]() {
        for (;;) {
            long r = next.fetch_add(1);
            if (r >= n_rec) break;
            const char *s = p->stage.data() + p->rec_off[r];
            size_t n = p->rec_len[r];
            uint32_t *out = words_buf + word_offsets[r];
            int64_t bad = 0;
            size_t full = n / 16;
            for (size_t w = 0; w < full; ++w) {
                uint32_t u = 0;
                const char *b = s + w * 16;
                for (int j = 0; j < 16; ++j) {
                    uint8_t c = enc[(uint8_t)b[j]];
                    bad += (c == 0xFF);
                    u = (u << 2) | (c & 3);
                }
                out[w] = u;
            }
            size_t rem = n - full * 16;
            if (rem) {
                uint32_t u = 0;
                const char *b = s + full * 16;
                for (size_t j = 0; j < rem; ++j) {
                    uint8_t c = enc[(uint8_t)b[j]];
                    bad += (c == 0xFF);
                    u |= (uint32_t)(c & 3) << (30 - 2 * (int)j);
                }
                out[full] = u;
            }
            badc[r] = bad;
        }
    };
    if (n_threads < 1) n_threads = 1;
    if (n_threads == 1) {
        worker();
    } else {
        std::vector<std::thread> ts;
        for (int32_t t = 0; t < n_threads; ++t) ts.emplace_back(worker);
        for (auto &t : ts) t.join();
    }

    // ---- pass 3: drop bad reads, compact, update stats -------------------
    long kept = 0;
    int64_t out_words = 0;
    for (long r = 0; r < n_rec; ++r) {
        int64_t w = words_of(p->rec_len[r]);
        stats[0] += (int64_t)p->rec_len[r];
        stats[3] += 1;
        if (badc[r]) {
            stats[1] += badc[r];
            stats[2] += 1;
            continue;
        }
        if (out_words != word_offsets[r])
            memmove(words_buf + out_words, words_buf + word_offsets[r],
                    (size_t)w * 4);
        lengths[kept] = (int32_t)p->rec_len[r];
        word_offsets[kept] = out_words;   // rewrite in place (kept <= r)
        out_words += w;
        ++kept;
    }
    word_offsets[kept] = out_words;
    if (kept == 0) goto restart;   // whole block dropped: 0 must mean EOF
    return kept;
}

// Quality-only block reader for the quality subsystem (qualityloader,
// quality.rs:157-210 role): copies EVERY read's raw quality bytes —
// no non-ACGT dropping, so read numbering matches a full-file scan.
// Returns #reads (0 = EOF, -1 = error/overflow); offsets[r] delimit read
// r's quality bytes in qual_buf.  FASTQ only (FASTA has no qualities).
long ktp_next_block_qual(void *h, uint8_t *qual_buf, long cap,
                         int64_t *offsets, long max_reads) {
    Parser *p = static_cast<Parser *>(h);
    long n_reads = 0;
    int64_t used = 0;
    offsets[0] = 0;
    if (p->has_pending) {       // record carried from a full prior block
        int64_t qlen = static_cast<int64_t>(p->pending.size());
        if (qlen > cap) return -1;
        memcpy(qual_buf, p->pending.data(), p->pending.size());
        used = qlen;
        offsets[++n_reads] = used;
        p->has_pending = false;
        p->pending.clear();
    }
    while (n_reads < max_reads) {
        size_t len;
        char *line = p->next_line(&len);
        if (!line) break;
        if (len == 0) continue;
        if (line[0] != '@') return -1;
        size_t slen;
        if (!p->next_line(&slen)) break;      // sequence (skipped)
        size_t l2;
        char *plus = p->next_line(&l2);       // '+' separator
        // wrapped records put sequence here — fail fast (python fallback)
        if (!plus || l2 == 0 || plus[0] != '+') return -1;
        size_t qlen;
        char *qual = p->next_line(&qlen);
        if (!qual) break;
        if (used + static_cast<int64_t>(qlen) > cap) {
            // block full: the record is already consumed from the stream,
            // so stash its quality for the NEXT call instead of losing it
            if (n_reads == 0) return -1;      // cap too small for one read
            p->pending.assign(qual, qual + qlen);
            p->has_pending = true;
            return n_reads;
        }
        memcpy(qual_buf + used, qual, qlen);
        used += static_cast<int64_t>(qlen);
        offsets[++n_reads] = used;
    }
    return n_reads;
}

}  // extern "C"
