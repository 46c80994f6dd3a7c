// Native HNSW (Hierarchical Navigable Small World) approximate
// nearest-neighbor index over sketch signatures.
//
// Role twin of the hnsw_rs dependency the reference feeds signatures into
// (/root/reference/src/bin/datasketcher.rs:156-195: Hnsw<u32, DistHamming>,
// parallel_insert, file_dump).  Implemented from scratch after
// Malkov & Yashunin (2016): geometric level sampling, greedy descent on the
// upper layers, ef-bounded best-first search on layer 0, and the
// "select-neighbors" pruning heuristic (algorithm 4 of the paper).
//
// Distances:
//   0 = HAMMING_U32 : fraction of unequal u32 slots (DistHamming on
//                     signatures; also the Probability-Jaccard distance of
//                     DistBlockSketched, seqblocksketch.rs:417-440)
//   1 = L2_F32      : squared euclidean on f32 vectors
//
// Exposed through a C ABI consumed by ctypes (kmerutils_tpu/hnsw.py).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <random>
#include <thread>
#include <vector>

namespace {

enum DistKind : int32_t { HAMMING_U32 = 0, L2_F32 = 1 };

struct Hnsw {
    int32_t dist_kind = HAMMING_U32;
    int32_t dim = 0;
    int64_t capacity = 0;
    int32_t M = 16;              // max degree on upper layers
    int32_t M0 = 32;             // max degree on layer 0 (2*M)
    int32_t ef_construction = 200;
    uint64_t seed = 0;
    double level_mult = 0.0;     // 1 / ln(M)

    std::atomic<int64_t> count{0};
    // (entry, max_level) packed into ONE atomic word so concurrent readers
    // always observe a consistent pair: publishing them as two separate
    // atomics let an inserter see a raised max_level with the OLD entry
    // node and walk layer_links above that node's level (OOB read).
    // Layout: high 16 bits = max_level + 1, low 48 bits = entry + 1
    // (zero value = "empty": entry -1 / level -1).
    std::atomic<uint64_t> ep_state{0};

    static uint64_t pack_ep(int64_t entry, int32_t max_level) {
        return ((uint64_t)(uint32_t)(max_level + 1) << 48) |
               ((uint64_t)(entry + 1) & 0xFFFFFFFFFFFFULL);
    }
    static void unpack_ep(uint64_t s, int64_t &entry, int32_t &max_level) {
        entry = (int64_t)(s & 0xFFFFFFFFFFFFULL) - 1;
        max_level = (int32_t)(s >> 48) - 1;
    }

    // storage: vectors row-major (u32 or f32 share 4-byte cells)
    std::vector<uint32_t> data;          // capacity * dim
    std::vector<int32_t> levels;         // per node
    // links[node] = one flat array: layer0 (M0+1 slots: count + ids) then
    // per upper layer (M+1 slots each), levels[node] upper layers
    std::vector<std::vector<int32_t>> links;
    std::vector<std::mutex> *locks = nullptr;
    std::mutex global;

    ~Hnsw() { delete locks; }

    const uint32_t *vec(int64_t i) const { return data.data() + (size_t)i * dim; }

    float distance(const uint32_t *a, const uint32_t *b) const {
        if (dist_kind == HAMMING_U32) {
            int32_t diff = 0;
            for (int32_t j = 0; j < dim; ++j) diff += (a[j] != b[j]);
            return (float)diff / (float)dim;
        }
        const float *fa = (const float *)a, *fb = (const float *)b;
        float s = 0.f;
        for (int32_t j = 0; j < dim; ++j) { float d = fa[j] - fb[j]; s += d * d; }
        return s;
    }

    int32_t *layer_links(int64_t node, int32_t layer) {
        // layer 0 block first, then upper layers
        int32_t *base = links[node].data();
        if (layer == 0) return base;
        return base + (M0 + 1) + (size_t)(layer - 1) * (M + 1);
    }

    int32_t sample_level(uint64_t key) {
        // splitmix64 -> uniform(0,1) -> geometric level
        uint64_t z = key + 0x9E3779B97F4A7C15ULL;
        z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
        z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
        z ^= z >> 31;
        double u = ((z >> 11) + 1.0) * (1.0 / 9007199254740993.0);  // (0,1)
        int lvl = (int)(-std::log(u) * level_mult);
        return lvl < 63 ? lvl : 63;
    }
};

struct Cand { float d; int64_t id; };
struct CandCloser {   // min-heap on distance
    bool operator()(const Cand &a, const Cand &b) const { return a.d > b.d; }
};
struct CandFarther {  // max-heap on distance
    bool operator()(const Cand &a, const Cand &b) const { return a.d < b.d; }
};

// ef-bounded best-first search on one layer; returns up to ef closest as a
// max-heap (farthest on top).
static void search_layer(Hnsw &h, const uint32_t *q, int64_t entry,
                         int32_t layer, int32_t ef,
                         std::priority_queue<Cand, std::vector<Cand>, CandFarther> &result,
                         std::vector<uint8_t> &visited, uint8_t mark) {
    std::priority_queue<Cand, std::vector<Cand>, CandCloser> frontier;
    float d0 = h.distance(q, h.vec(entry));
    frontier.push({d0, entry});
    result.push({d0, entry});
    visited[entry] = mark;
    while (!frontier.empty()) {
        Cand c = frontier.top();
        if ((int32_t)result.size() >= ef && c.d > result.top().d) break;
        frontier.pop();
        // copy neighbor ids under the lock (concurrent inserts may prune)
        int32_t ids[257];  // M0 <= 256
        int32_t n_nb;
        {
            std::lock_guard<std::mutex> lk((*h.locks)[c.id]);
            const int32_t *ll = h.layer_links(c.id, layer);
            n_nb = ll[0];
            for (int32_t i = 0; i < n_nb; ++i) ids[i] = ll[1 + i];
        }
        for (int32_t i = 0; i < n_nb; ++i) {
            int64_t nb = ids[i];
            if (visited[nb] == mark) continue;
            visited[nb] = mark;
            float d = h.distance(q, h.vec(nb));
            if ((int32_t)result.size() < ef || d < result.top().d) {
                frontier.push({d, nb});
                result.push({d, nb});
                if ((int32_t)result.size() > ef) result.pop();
            }
        }
    }
}

// Select-neighbors pruning heuristic (keeps diverse close neighbors).
static void select_neighbors(Hnsw &h, std::vector<Cand> &cands, int32_t M_out,
                             std::vector<int32_t> &out) {
    std::sort(cands.begin(), cands.end(),
              [](const Cand &a, const Cand &b) { return a.d < b.d; });
    out.clear();
    for (const Cand &c : cands) {
        if ((int32_t)out.size() >= M_out) break;
        bool keep = true;
        for (int32_t sel : out) {
            float d_cs = h.distance(h.vec(c.id), h.vec(sel));
            if (d_cs < c.d) { keep = false; break; }  // dominated
        }
        if (keep) out.push_back((int32_t)c.id);
    }
    // backfill with closest dominated candidates if underfull
    if ((int32_t)out.size() < M_out) {
        for (const Cand &c : cands) {
            if ((int32_t)out.size() >= M_out) break;
            if (std::find(out.begin(), out.end(), (int32_t)c.id) == out.end())
                out.push_back((int32_t)c.id);
        }
    }
}

static void link_nodes(Hnsw &h, int64_t node, int32_t layer,
                       std::vector<Cand> &cands) {
    int32_t cap = layer == 0 ? h.M0 : h.M;
    std::vector<int32_t> sel;
    select_neighbors(h, cands, cap, sel);
    {
        std::lock_guard<std::mutex> lk((*h.locks)[node]);
        int32_t *ll = h.layer_links(node, layer);
        ll[0] = (int32_t)sel.size();
        for (size_t i = 0; i < sel.size(); ++i) ll[1 + i] = sel[i];
    }
    // back-links with pruning when overfull
    for (int32_t nb : sel) {
        std::lock_guard<std::mutex> lk((*h.locks)[nb]);
        int32_t *ll = h.layer_links(nb, layer);
        if (ll[0] < cap) {
            ll[1 + ll[0]] = (int32_t)node;
            ll[0] += 1;
        } else {
            // prune: rerun the heuristic over existing + new
            std::vector<Cand> all;
            all.reserve(ll[0] + 1);
            const uint32_t *nbv = h.vec(nb);
            for (int32_t i = 0; i < ll[0]; ++i)
                all.push_back({h.distance(nbv, h.vec(ll[1 + i])), ll[1 + i]});
            all.push_back({h.distance(nbv, h.vec(node)), node});
            std::vector<int32_t> kept;
            select_neighbors(h, all, cap, kept);
            ll[0] = (int32_t)kept.size();
            for (size_t i = 0; i < kept.size(); ++i) ll[1 + i] = kept[i];
        }
    }
}

static void insert_one(Hnsw &h, int64_t node, std::vector<uint8_t> &visited,
                       uint8_t &mark) {
    int32_t lvl = h.levels[node];
    const uint32_t *q = h.vec(node);
    int64_t ep;
    int32_t top;
    Hnsw::unpack_ep(h.ep_state.load(), ep, top);
    if (ep < 0) {
        std::lock_guard<std::mutex> lk(h.global);
        Hnsw::unpack_ep(h.ep_state.load(), ep, top);
        if (ep < 0) {                   // first node
            h.ep_state.store(Hnsw::pack_ep(node, lvl));
            return;
        }
    }
    // greedy descent through layers above lvl
    float d_ep = h.distance(q, h.vec(ep));
    for (int32_t layer = top; layer > lvl; --layer) {
        bool moved = true;
        while (moved) {
            moved = false;
            std::lock_guard<std::mutex> lk((*h.locks)[ep]);
            int32_t *ll = h.layer_links(ep, layer);
            for (int32_t i = 0; i < ll[0]; ++i) {
                float d = h.distance(q, h.vec(ll[1 + i]));
                if (d < d_ep) { d_ep = d; ep = ll[1 + i]; moved = true; break; }
            }
        }
    }
    // ef-construction search + linking on layers min(lvl, top) .. 0
    for (int32_t layer = std::min(lvl, top); layer >= 0; --layer) {
        std::priority_queue<Cand, std::vector<Cand>, CandFarther> res;
        if (++mark == 0) { std::fill(visited.begin(), visited.end(), 0); mark = 1; }
        search_layer(h, q, ep, layer, h.ef_construction, res, visited, mark);
        std::vector<Cand> cands;
        cands.reserve(res.size());
        while (!res.empty()) { cands.push_back(res.top()); res.pop(); }
        link_nodes(h, node, layer, cands);
        // best candidate becomes next layer's entry
        float best = 1e30f;
        for (const Cand &c : cands)
            if (c.d < best) { best = c.d; ep = c.id; }
    }
    int64_t cur_e;
    int32_t cur_l;
    Hnsw::unpack_ep(h.ep_state.load(), cur_e, cur_l);
    if (lvl > cur_l) {
        std::lock_guard<std::mutex> lk(h.global);
        Hnsw::unpack_ep(h.ep_state.load(), cur_e, cur_l);
        if (lvl > cur_l)
            h.ep_state.store(Hnsw::pack_ep(node, lvl));
    }
}

}  // namespace

extern "C" {

void *hnsw_create(int32_t dist_kind, int32_t dim, int64_t capacity,
                  int32_t M, int32_t ef_construction, uint64_t seed) {
    if (dim <= 0 || capacity <= 0 || M <= 1 || M > 128) return nullptr;
    Hnsw *h = new Hnsw();
    h->dist_kind = dist_kind;
    h->dim = dim;
    h->capacity = capacity;
    h->M = M;
    h->M0 = 2 * M;
    h->ef_construction = ef_construction;
    h->seed = seed;
    h->level_mult = 1.0 / std::log((double)M);
    h->data.resize((size_t)capacity * dim);
    h->levels.resize(capacity);
    h->links.resize(capacity);
    h->locks = new std::vector<std::mutex>(capacity);
    return h;
}

void hnsw_free(void *p) { delete (Hnsw *)p; }

int64_t hnsw_size(void *p) { return ((Hnsw *)p)->count.load(); }

// Insert n vectors (rows of `vecs`), parallel over n_threads.
// Returns the new element count, or -1 on capacity overflow.
int64_t hnsw_insert_batch(void *p, const uint32_t *vecs, int64_t n,
                          int32_t n_threads) {
    Hnsw &h = *(Hnsw *)p;
    int64_t base = h.count.load();
    if (base + n > h.capacity) return -1;
    // copy data + assign levels + allocate links first (single-threaded)
    for (int64_t i = 0; i < n; ++i) {
        int64_t node = base + i;
        std::memcpy(h.data.data() + (size_t)node * h.dim,
                    vecs + (size_t)i * h.dim, (size_t)h.dim * 4);
        int32_t lvl = h.sample_level(h.seed * 0x2545F4914F6CDD1DULL + node);
        h.levels[node] = lvl;
        h.links[node].assign((h.M0 + 1) + (size_t)lvl * (h.M + 1), 0);
    }
    if (n_threads < 1) n_threads = 1;
    std::atomic<int64_t> next{0};
    auto worker = [&]() {
        std::vector<uint8_t> visited(h.capacity, 0);
        uint8_t mark = 0;
        for (;;) {
            int64_t i = next.fetch_add(1);
            if (i >= n) break;
            insert_one(h, base + i, visited, mark);
            h.count.fetch_add(1);
        }
    };
    if (n_threads == 1) {
        worker();
    } else {
        std::vector<std::thread> ts;
        for (int32_t t = 0; t < n_threads; ++t) ts.emplace_back(worker);
        for (auto &t : ts) t.join();
    }
    return h.count.load();
}

// k-NN search for nq queries; out_ids i64[nq*k] (-1 pad), out_d f32[nq*k].
void hnsw_search(void *p, const uint32_t *queries, int64_t nq, int32_t k,
                 int32_t ef_search, int64_t *out_ids, float *out_d,
                 int32_t n_threads) {
    Hnsw &h = *(Hnsw *)p;
    int64_t total = h.count.load();
    if (total == 0) {
        for (int64_t i = 0; i < nq * k; ++i) { out_ids[i] = -1; out_d[i] = 0.f; }
        return;
    }
    int32_t ef = std::max(ef_search, k);
    if (n_threads < 1) n_threads = 1;
    std::atomic<int64_t> next{0};
    auto worker = [&]() {
        std::vector<uint8_t> visited(h.capacity, 0);
        uint8_t mark = 0;
        for (;;) {
            int64_t qi = next.fetch_add(1);
            if (qi >= nq) break;
            const uint32_t *q = queries + (size_t)qi * h.dim;
            int64_t ep;
            int32_t toplvl;
            Hnsw::unpack_ep(h.ep_state.load(), ep, toplvl);
            float d_ep = h.distance(q, h.vec(ep));
            for (int32_t layer = toplvl; layer > 0; --layer) {
                bool moved = true;
                while (moved) {
                    moved = false;
                    int32_t *ll = h.layer_links(ep, layer);
                    for (int32_t i = 0; i < ll[0]; ++i) {
                        float d = h.distance(q, h.vec(ll[1 + i]));
                        if (d < d_ep) { d_ep = d; ep = ll[1 + i]; moved = true; break; }
                    }
                }
            }
            std::priority_queue<Cand, std::vector<Cand>, CandFarther> res;
            if (++mark == 0) { std::fill(visited.begin(), visited.end(), 0); mark = 1; }
            search_layer(h, q, ep, 0, ef, res, visited, mark);
            std::vector<Cand> top;
            while (!res.empty()) { top.push_back(res.top()); res.pop(); }
            std::reverse(top.begin(), top.end());  // closest first
            for (int32_t j = 0; j < k; ++j) {
                if (j < (int32_t)top.size()) {
                    out_ids[qi * k + j] = top[j].id;
                    out_d[qi * k + j] = top[j].d;
                } else {
                    out_ids[qi * k + j] = -1;
                    out_d[qi * k + j] = 0.f;
                }
            }
        }
    };
    if (n_threads == 1) {
        worker();
    } else {
        std::vector<std::thread> ts;
        for (int32_t t = 0; t < n_threads; ++t) ts.emplace_back(worker);
        for (auto &t : ts) t.join();
    }
}

// File dump (role of hnsw_rs file_dump, datasketcher.rs:336-347).
// Format: magic u32, version u32, dist u32, dim u32, M u32, M0 u32,
// efc u32, seed u64, capacity i64, count i64, entry i64, max_level i32,
// levels i32[count], data u32[count*dim], per node: links blob
// (u32 len, i32[len]).
static const uint32_t HNSW_MAGIC = 0xCEA7B15Fu;

int32_t hnsw_save(void *p, const char *path) {
    Hnsw &h = *(Hnsw *)p;
    FILE *f = fopen(path, "wb");
    if (!f) return -1;
    int64_t count = h.count.load();
    int64_t entry;
    int32_t maxl;
    Hnsw::unpack_ep(h.ep_state.load(), entry, maxl);
    uint32_t head32[7] = {HNSW_MAGIC, 1u, (uint32_t)h.dist_kind,
                          (uint32_t)h.dim, (uint32_t)h.M, (uint32_t)h.M0,
                          (uint32_t)h.ef_construction};
    fwrite(head32, 4, 7, f);
    fwrite(&h.seed, 8, 1, f);
    fwrite(&h.capacity, 8, 1, f);
    fwrite(&count, 8, 1, f);
    fwrite(&entry, 8, 1, f);
    fwrite(&maxl, 4, 1, f);
    fwrite(h.levels.data(), 4, count, f);
    fwrite(h.data.data(), 4, (size_t)count * h.dim, f);
    for (int64_t i = 0; i < count; ++i) {
        uint32_t len = (uint32_t)h.links[i].size();
        fwrite(&len, 4, 1, f);
        fwrite(h.links[i].data(), 4, len, f);
    }
    fclose(f);
    return 0;
}

void *hnsw_load(const char *path) {
    FILE *f = fopen(path, "rb");
    if (!f) return nullptr;
    uint32_t head32[7];
    if (fread(head32, 4, 7, f) != 7 || head32[0] != HNSW_MAGIC) {
        fclose(f);
        return nullptr;
    }
    uint64_t seed;
    int64_t capacity, count, entry;
    int32_t maxl;
    if (fread(&seed, 8, 1, f) != 1 || fread(&capacity, 8, 1, f) != 1 ||
        fread(&count, 8, 1, f) != 1 || fread(&entry, 8, 1, f) != 1 ||
        fread(&maxl, 4, 1, f) != 1) { fclose(f); return nullptr; }
    Hnsw *h = (Hnsw *)hnsw_create((int32_t)head32[2], (int32_t)head32[3],
                                  capacity, (int32_t)head32[4],
                                  (int32_t)head32[6], seed);
    if (!h) { fclose(f); return nullptr; }
    bool ok = (int32_t)head32[5] == h->M0;
    ok = ok && fread(h->levels.data(), 4, count, f) == (size_t)count;
    ok = ok && fread(h->data.data(), 4, (size_t)count * h->dim, f)
                   == (size_t)count * h->dim;
    for (int64_t i = 0; ok && i < count; ++i) {
        uint32_t len;
        ok = fread(&len, 4, 1, f) == 1;
        if (!ok) break;
        h->links[i].resize(len);
        ok = fread(h->links[i].data(), 4, len, f) == len;
    }
    fclose(f);
    if (!ok) { delete h; return nullptr; }
    h->count.store(count);
    h->ep_state.store(Hnsw::pack_ep(entry, maxl));
    return h;
}

}  // extern "C"
