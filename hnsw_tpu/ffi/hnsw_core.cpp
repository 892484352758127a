// Native HNSW core: multithreaded graph builder + C ABI.
//
// This is the framework's native runtime tier — the capability analog of the
// reference's Rust core (hnsw.rs) and its C FFI surface (libext.rs), re-designed
// around the same dense flat-array layout the TPU path uses, so graphs built here
// are handed to JAX zero-copy via the export_* functions.
//
// Semantics reproduced from the reference (behavior, not code):
//   * level sampling law  (src/hnsw.rs:317-386)  — floor(-ln(U)/ln(M)), seeded
//   * search_layer        (src/hnsw.rs:922-1064) — ef-capped best-first with visited set
//   * insert              (src/hnsw.rs:1066-1215)— ef=1 upper descent with projection
//                          links, per-layer construction with select_neighbours
//   * select_neighbours   (src/hnsw.rs:1299-1421)— diversity prune + keep_pruned refill
//   * reverse update      (src/hnsw.rs:1241-1289)— backlinks at l_n = new point level,
//                          dedup, sort, shrink to 2M/M
//   * search_filter       (src/hnsw.rs:1487-1599)— one-scan greedy descent + layer-0 beam
//   * parallel insert     (src/hnsw.rs:1224-1238)— thread pool over inserts with
//                          per-point locks (same benign-race contract)
//
// Build: g++ -O3 -march=native -shared -fPIC -pthread -o libhnsw_core.so hnsw_core.cpp

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <queue>
#include <random>
#include <shared_mutex>
#include <string>
#include <thread>
#include <unordered_set>
#include <vector>

namespace {

using std::size_t;

// ----------------------------------------------------------------- distances --------

enum class Dist : int32_t {
  L1 = 0, L2 = 1, Cosine = 2, Dot = 3, Hamming = 4, Jaccard = 5,
  Hellinger = 6, Jeffreys = 7, JensenShannon = 8, Ptr = 100,
};

using DistFn = float (*)(const float*, const float*, uint64_t);

static float d_l1(const float* a, const float* b, uint64_t n) {
  float s = 0;
  for (uint64_t i = 0; i < n; ++i) s += std::fabs(a[i] - b[i]);
  return s;
}
static float d_l2(const float* a, const float* b, uint64_t n) {
  float s = 0;
  for (uint64_t i = 0; i < n; ++i) { float d = a[i] - b[i]; s += d * d; }
  return std::sqrt(s);
}
static float d_dot(const float* a, const float* b, uint64_t n) {
  float s = 0;
  for (uint64_t i = 0; i < n; ++i) s += a[i] * b[i];
  return 1.0f - s;
}
static float d_cos(const float* a, const float* b, uint64_t n) {
  float s = 0, na = 0, nb = 0;
  for (uint64_t i = 0; i < n; ++i) { s += a[i] * b[i]; na += a[i] * a[i]; nb += b[i] * b[i]; }
  float d = std::sqrt(na) * std::sqrt(nb);
  return d > 0 ? 1.0f - s / std::max(d, 1e-10f) : 1.0f;
}
static float d_ham(const float* a, const float* b, uint64_t n) {
  uint64_t c = 0;
  for (uint64_t i = 0; i < n; ++i) c += (a[i] != b[i]);
  return float(c) / float(n);
}
static float d_jac(const float* a, const float* b, uint64_t n) {
  float mn = 0, mx = 0;
  for (uint64_t i = 0; i < n; ++i) { mn += std::min(a[i], b[i]); mx += std::max(a[i], b[i]); }
  return mx > 0 ? 1.0f - mn / std::max(mx, 1e-10f) : 0.0f;
}
static float d_hel(const float* a, const float* b, uint64_t n) {
  float s = 0;
  for (uint64_t i = 0; i < n; ++i) {
    float d = std::sqrt(std::max(a[i], 0.0f)) - std::sqrt(std::max(b[i], 0.0f));
    s += d * d;
  }
  return std::sqrt(std::max(0.5f * s, 0.0f));
}
static float d_jef(const float* a, const float* b, uint64_t n) {
  float s = 0;
  for (uint64_t i = 0; i < n; ++i) {
    float x = std::max(a[i], 1e-10f), y = std::max(b[i], 1e-10f);
    s += (x - y) * (std::log(x) - std::log(y));
  }
  return s;
}
static float d_js(const float* a, const float* b, uint64_t n) {
  float s = 0;
  for (uint64_t i = 0; i < n; ++i) {
    float m = 0.5f * (a[i] + b[i]);
    if (a[i] > 0) s += a[i] * (std::log(std::max(a[i], 1e-10f)) - std::log(std::max(m, 1e-10f)));
    if (b[i] > 0) s += b[i] * (std::log(std::max(b[i], 1e-10f)) - std::log(std::max(m, 1e-10f)));
  }
  return std::sqrt(std::max(0.5f * s, 0.0f));
}

static DistFn dist_table(Dist d) {
  switch (d) {
    case Dist::L1: return d_l1;
    case Dist::L2: return d_l2;
    case Dist::Cosine: return d_cos;
    case Dist::Dot: return d_dot;
    case Dist::Hamming: return d_ham;
    case Dist::Jaccard: return d_jac;
    case Dist::Hellinger: return d_hel;
    case Dist::Jeffreys: return d_jef;
    case Dist::JensenShannon: return d_js;
    default: return d_l2;
  }
}

// -------------------------------------------------------------------- index ---------

struct Link { float dist; int32_t id; };
static bool link_lt(const Link& a, const Link& b) { return a.dist < b.dist; }

// Stamped visited set: O(1) insert/query with no hashing or per-search allocation
// (epoch bump invalidates the whole table). One per thread.
struct Visited {
  std::vector<uint32_t> stamp;
  uint32_t epoch = 0;
  void begin(size_t need) {
    if (stamp.size() < need) stamp.resize(need, 0);
    if (++epoch == 0) { std::fill(stamp.begin(), stamp.end(), 0); epoch = 1; }
  }
  bool insert(int32_t i) {
    if (stamp[i] == epoch) return false;
    stamp[i] = epoch;
    return true;
  }
};
static thread_local Visited tl_visited;
static thread_local Visited tl_visited2;

struct Point {
  std::vector<std::vector<Link>> nbrs;  // one list per layer 0..max_layer-1
  mutable std::mutex lock;
};

struct Index {
  // config
  uint64_t M, efc, max_layer;
  Dist dist_kind;
  DistFn dist;
  uint64_t dim = 0;
  bool extend_candidates = false, keep_pruned = false;
  // storage
  std::vector<float> data;       // [n, dim]
  std::vector<int64_t> origin;   // external ids
  std::vector<int32_t> level;
  std::vector<int32_t> rank;
  std::deque<Point> points;      // deque: rows never relocate (they hold mutexes)
  std::vector<int64_t> layer_counts;  // points with level == l
  std::atomic<int64_t> entry{-1};
  std::atomic<int64_t> n{0};
  size_t capacity;
  // level sampling (deterministic, seed 397 like the reference's LayerGenerator)
  std::mt19937_64 rng{397};
  double scale;
  std::mutex alloc_lock;
  mutable std::shared_mutex entry_lock;

  Index(uint64_t M_, uint64_t efc_, uint64_t cap, uint64_t max_layer_, Dist dk)
      : M(M_), efc(efc_), max_layer(std::min<uint64_t>(max_layer_, 16)),
        dist_kind(dk), dist(dist_table(dk)), capacity(std::max<uint64_t>(cap, 16)) {
    scale = 1.0 / std::log(double(std::max<uint64_t>(M, 2)));
    points.resize(capacity);
    layer_counts.assign(max_layer, 0);
  }

  const float* vec(int64_t i) const { return data.data() + uint64_t(i) * dim; }
  uint64_t width(uint64_t l) const { return l == 0 ? 2 * M : M; }

  int sample_level() {
    std::uniform_real_distribution<double> u(0.0, 1.0);
    double x = u(rng);
    auto lv = uint64_t(std::floor(-std::log(std::max(x, 1e-300)) * scale));
    if (lv >= max_layer) lv = std::uniform_int_distribution<uint64_t>(0, max_layer - 1)(rng);
    return int(lv);
  }

  void grow(size_t need) {
    if (need <= capacity) return;
    // deque::resize leaves existing elements in place (rows hold mutexes). Growth
    // only happens under alloc_lock; like the reference, concurrent search during a
    // growing insert is the caller's responsibility (searching-mode flag contract,
    // reference src/hnsw.rs:759-760).
    size_t nc = capacity;
    while (nc < need) nc *= 2;
    points.resize(nc);
    capacity = nc;
  }

  int64_t allocate(const float* v, uint64_t d_, int64_t oid, int forced_level) {
    std::lock_guard<std::mutex> g(alloc_lock);
    if (dim == 0) dim = d_;
    int64_t i = n.load();
    grow(size_t(i) + 1);
    data.resize(size_t(i + 1) * dim);
    std::memcpy(data.data() + size_t(i) * dim, v, dim * sizeof(float));
    int lv = forced_level >= 0 ? forced_level : sample_level();
    origin.push_back(oid);
    level.push_back(lv);
    rank.push_back(int32_t(layer_counts[lv]));
    layer_counts[lv] += 1;
    points[i].nbrs.resize(max_layer);
    n.store(i + 1);
    return i;
  }

  // ---------------------------------------------------------------- search_layer ----
  // ef-capped best-first search in one layer; mirrors reference src/hnsw.rs:922-1064.
  void search_layer(const float* q, int64_t ep, uint64_t ef, uint64_t layer,
                    std::vector<Link>& out) const {
    out.clear();
    if (layer >= max_layer || layer_counts[layer] == 0 || ep < 0) return;
    float d0 = dist(q, vec(ep), dim);
    Visited& visited = tl_visited;
    visited.begin(capacity);
    visited.insert(int32_t(ep));
    // candidates: min-heap by dist; results: max-heap by dist capped at ef
    using QC = std::priority_queue<Link, std::vector<Link>,
                                   bool (*)(const Link&, const Link&)>;
    auto gt = +[](const Link& a, const Link& b) { return a.dist > b.dist; };
    auto lt = +[](const Link& a, const Link& b) { return a.dist < b.dist; };
    QC cand(gt);
    QC res(lt);
    cand.push({d0, int32_t(ep)});
    res.push({d0, int32_t(ep)});
    std::vector<int32_t> fresh;
    while (!cand.empty()) {
      Link c = cand.top();
      cand.pop();
      if (c.dist > res.top().dist) break;
      fresh.clear();
      {
        std::lock_guard<std::mutex> g(points[c.id].lock);
        const auto& row = points[c.id].nbrs[layer];
        for (const auto& e : row)
          if (visited.insert(e.id)) fresh.push_back(e.id);
      }
      for (int32_t e : fresh) {
        float de = dist(q, vec(e), dim);
        if (de < res.top().dist || res.size() < ef) {
          cand.push({de, e});
          res.push({de, e});
          if (res.size() > ef) res.pop();
        }
      }
    }
    out.reserve(res.size());
    while (!res.empty()) { out.push_back(res.top()); res.pop(); }
    std::sort(out.begin(), out.end(), link_lt);
  }

  // ------------------------------------------------------------ select_neighbours ---
  void select_neighbours(const float* q, std::vector<Link>& cand, uint64_t nb_asked,
                         bool extend, uint64_t layer, std::vector<Link>& kept) const {
    kept.clear();
    std::sort(cand.begin(), cand.end(), link_lt);
    if (cand.size() <= nb_asked && !extend) { kept = cand; return; }
    if (cand.size() <= nb_asked && extend) {
      std::unordered_set<int32_t> seen;
      for (auto& c : cand) seen.insert(c.id);
      std::vector<int32_t> extra;
      for (auto& c : cand) {
        std::lock_guard<std::mutex> g(points[c.id].lock);
        for (auto& e : points[c.id].nbrs[layer])
          if (seen.insert(e.id).second) extra.push_back(e.id);
      }
      for (int32_t e : extra) cand.push_back({dist(q, vec(e), dim), e});
      std::sort(cand.begin(), cand.end(), link_lt);
    }
    std::vector<Link> discarded;
    for (const auto& e : cand) {
      if (kept.size() >= nb_asked) break;
      bool ok = true;
      for (const auto& d : kept)
        if (dist(vec(e.id), vec(d.id), dim) <= e.dist) { ok = false; break; }
      if (ok) kept.push_back(e);
      else if (keep_pruned) discarded.push_back(e);
    }
    if (keep_pruned && kept.size() < nb_asked) {
      std::sort(discarded.begin(), discarded.end(), link_lt);
      for (const auto& d : discarded) {
        if (kept.size() >= nb_asked) break;
        kept.push_back(d);
      }
    }
  }

  // ------------------------------------------------------------------- insert -------
  void insert(const float* v, uint64_t d_, int64_t oid, int forced_level = -1) {
    int64_t idx = allocate(v, d_, oid, forced_level);
    int lv = level[idx];
    int64_t ep;
    {
      std::shared_lock<std::shared_mutex> g(entry_lock);
      ep = entry.load();
    }
    if (ep < 0) {
      std::unique_lock<std::shared_mutex> g(entry_lock);
      if (entry.load() < 0) { entry.store(idx); return; }
      ep = entry.load();
    }
    const float* q = vec(idx);
    int max_obs = level[ep];
    float d_entry = dist(q, vec(ep), dim);
    std::vector<Link> res, cand, kept;
    // upper-layer ef=1 descent with projection links (src/hnsw.rs:1114-1155)
    for (int l = max_obs; l > lv; --l) {
      search_layer(q, ep, 1, uint64_t(l), res);
      if (!res.empty()) {
        Link best = res.front();
        {
          std::lock_guard<std::mutex> g(points[idx].lock);
          if (points[idx].nbrs[l].size() < M) points[idx].nbrs[l].push_back(best);
        }
        if (best.dist < d_entry) { ep = best.id; d_entry = best.dist; }
      }
    }
    // construction loop (src/hnsw.rs:1156-1205)
    for (int l = lv; l >= 0; --l) {
      search_layer(q, ep, efc, uint64_t(l), res);
      if (res.empty()) continue;
      cand = res;
      uint64_t nb_conn = (l == 0) ? 2 * M : M;
      bool ext = (l == 0) && extend_candidates;
      select_neighbours(q, cand, nb_conn, ext, uint64_t(l), kept);
      std::sort(kept.begin(), kept.end(), link_lt);
      {
        std::lock_guard<std::mutex> g(points[idx].lock);
        points[idx].nbrs[l] = kept;
      }
      if (!kept.empty()) ep = kept.front().id;
    }
    // reverse update at l_n = new point's level (src/hnsw.rs:1241-1289)
    uint64_t l_n = uint64_t(lv);
    uint64_t thr = width(l_n);
    for (int l = lv; l >= 0; --l) {
      std::vector<Link> row;
      {
        std::lock_guard<std::mutex> g(points[idx].lock);
        row = points[idx].nbrs[l];
      }
      for (const auto& qlnk : row) {
        if (qlnk.id == idx) continue;
        std::lock_guard<std::mutex> g(points[qlnk.id].lock);
        auto& tgt = points[qlnk.id].nbrs[l_n];
        bool already = false;
        for (const auto& o : tgt)
          if (o.id == int32_t(idx)) { already = true; break; }
        if (already) continue;
        tgt.push_back({qlnk.dist, int32_t(idx)});
        std::sort(tgt.begin(), tgt.end(), link_lt);
        if (tgt.size() > thr) tgt.pop_back();
      }
    }
    // entry promotion (src/hnsw.rs:534-557)
    {
      std::unique_lock<std::shared_mutex> g(entry_lock);
      int64_t e = entry.load();
      if (e < 0 || lv > level[e]) entry.store(idx);
    }
  }

  void parallel_insert(const float* vs, uint64_t count, uint64_t d_,
                       const int64_t* oids, int n_threads) {
    if (n_threads <= 0) n_threads = int(std::thread::hardware_concurrency());
    // pre-sample levels under one lock so the stream stays deterministic in order
    std::vector<int> lvls(count);
    {
      std::lock_guard<std::mutex> g(alloc_lock);
      for (uint64_t i = 0; i < count; ++i) lvls[i] = sample_level();
      // pre-grow so no reallocation happens under concurrency
      grow(size_t(n.load()) + count);
      if (dim == 0) dim = d_;
      data.reserve((size_t(n.load()) + count) * dim);
      origin.reserve(origin.size() + count);
      level.reserve(level.size() + count);
      rank.reserve(rank.size() + count);
    }
    std::atomic<uint64_t> next{0};
    auto worker = [&]() {
      for (;;) {
        uint64_t i = next.fetch_add(1);
        if (i >= count) break;
        insert(vs + i * d_, d_, oids[i], lvls[i]);
      }
    };
    std::vector<std::thread> pool;
    for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
    for (auto& t : pool) t.join();
  }

  // ------------------------------------------------------------------- search -------
  // production path: one-scan greedy descent + layer search (src/hnsw.rs:1487-1599)
  uint64_t search(const float* q, uint64_t knbn, uint64_t ef_arg,
                  int (*filter)(int64_t), std::vector<Link>& out) const {
    out.clear();
    int64_t ep = entry.load();
    if (ep < 0) return 0;
    float d_ep = dist(q, vec(ep), dim);
    int64_t pivot = ep;
    for (int layer = level[ep]; layer >= 1; --layer) {
      std::vector<Link> row;
      {
        std::lock_guard<std::mutex> g(points[pivot].lock);
        row = points[pivot].nbrs[layer];
      }
      int64_t best = -1;
      for (const auto& nl : row) {
        float dd = dist(q, vec(nl.id), dim);
        if (dd < d_ep) { d_ep = dd; best = nl.id; }
      }
      if (best >= 0) pivot = best;
    }
    uint64_t ef = std::max(ef_arg, knbn);
    uint64_t l0 = 0;
    while (l0 < max_layer && layer_counts[l0] == 0) ++l0;
    std::vector<Link> res;
    search_layer_filtered(q, pivot, ef, l0, filter, res);
    uint64_t last = std::min<uint64_t>({knbn, ef, res.size()});
    for (uint64_t i = 0; i < last; ++i) {
      if (!filter || filter(origin[res[i].id])) out.push_back(res[i]);
    }
    return out.size();
  }

  // search_layer with in-search filtering (reference filter semantics,
  // src/hnsw.rs:992-1050): no early return with a filter; results admit only
  // filter-passing points; traversal uses all points.
  void search_layer_filtered(const float* q, int64_t ep, uint64_t ef, uint64_t layer,
                             int (*filter)(int64_t), std::vector<Link>& out) const {
    if (!filter) { search_layer(q, ep, ef, layer, out); return; }
    out.clear();
    if (layer >= max_layer || layer_counts[layer] == 0 || ep < 0) return;
    float d0 = dist(q, vec(ep), dim);
    Visited& visited = tl_visited2;
    visited.begin(capacity);
    visited.insert(int32_t(ep));
    auto gt = +[](const Link& a, const Link& b) { return a.dist > b.dist; };
    auto lt = +[](const Link& a, const Link& b) { return a.dist < b.dist; };
    std::priority_queue<Link, std::vector<Link>, bool (*)(const Link&, const Link&)>
        cand(gt), trav(lt), res(lt);
    cand.push({d0, int32_t(ep)});
    trav.push({d0, int32_t(ep)});
    if (filter(origin[ep])) res.push({d0, int32_t(ep)});
    std::vector<int32_t> fresh;
    while (!cand.empty()) {
      Link c = cand.top();
      cand.pop();
      if (!trav.empty() && c.dist > trav.top().dist && trav.size() >= ef) continue;
      fresh.clear();
      {
        std::lock_guard<std::mutex> g(points[c.id].lock);
        for (const auto& e : points[c.id].nbrs[layer])
          if (visited.insert(e.id)) fresh.push_back(e.id);
      }
      for (int32_t e : fresh) {
        float de = dist(q, vec(e), dim);
        if (trav.size() < ef || de < trav.top().dist) {
          cand.push({de, e});
          trav.push({de, e});
          if (trav.size() > ef) trav.pop();
          if (filter(origin[e])) {
            res.push({de, e});
            if (res.size() > ef) res.pop();
          }
        }
      }
    }
    out.reserve(res.size());
    while (!res.empty()) { out.push_back(res.top()); res.pop(); }
    std::sort(out.begin(), out.end(), link_lt);
  }

  void parallel_search(const float* qs, uint64_t nq, uint64_t knbn, uint64_t ef,
                       int n_threads, int64_t* out_ids, float* out_d) const {
    if (n_threads <= 0) n_threads = int(std::thread::hardware_concurrency());
    std::atomic<uint64_t> next{0};
    auto worker = [&]() {
      std::vector<Link> res;
      for (;;) {
        uint64_t i = next.fetch_add(1);
        if (i >= nq) break;
        search(qs + i * dim, knbn, ef, nullptr, res);
        for (uint64_t j = 0; j < knbn; ++j) {
          if (j < res.size()) {
            out_ids[i * knbn + j] = origin[res[j].id];
            out_d[i * knbn + j] = res[j].dist;
          } else {
            out_ids[i * knbn + j] = -1;
            out_d[i * knbn + j] = INFINITY;
          }
        }
      }
    };
    std::vector<std::thread> pool;
    for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
    for (auto& t : pool) t.join();
  }
};

static Dist dist_from_name(const char* name) {
  std::string s(name);
  if (s.rfind("Dist", 0) == 0) s = s.substr(4);
  if (s == "L1") return Dist::L1;
  if (s == "L2") return Dist::L2;
  if (s == "Cosine") return Dist::Cosine;
  if (s == "Dot") return Dist::Dot;
  if (s == "Hamming") return Dist::Hamming;
  if (s == "Jaccard") return Dist::Jaccard;
  if (s == "Hellinger") return Dist::Hellinger;
  if (s == "Jeffreys") return Dist::Jeffreys;
  if (s == "JensenShannon") return Dist::JensenShannon;
  return Dist::L2;
}

}  // namespace

// ------------------------------------------------------------------- C ABI ----------
// Mirrors the shape of the reference's libext.rs surface (init/insert/search/
// parallel variants/drop), plus flat-array exports for zero-copy TPU handoff.

extern "C" {

void* hnsw_init(uint64_t max_nb_conn, uint64_t ef_c, uint64_t max_elements,
                uint64_t max_layer, const char* distname) {
  if (max_nb_conn == 0 || max_nb_conn > 256) return nullptr;
  return new Index(max_nb_conn, ef_c, max_elements, max_layer ? max_layer : 16,
                   dist_from_name(distname));
}

void* hnsw_init_ptrdist(uint64_t max_nb_conn, uint64_t ef_c, uint64_t max_elements,
                        uint64_t max_layer, DistFn fn) {
  auto* ix = new Index(max_nb_conn, ef_c, max_elements, max_layer ? max_layer : 16,
                       Dist::Ptr);
  ix->dist = fn;
  return ix;
}

void hnsw_drop(void* h) { delete static_cast<Index*>(h); }

void hnsw_set_extend_candidates(void* h, int flag) {
  static_cast<Index*>(h)->extend_candidates = flag != 0;
}
void hnsw_set_keeping_pruned(void* h, int flag) {
  static_cast<Index*>(h)->keep_pruned = flag != 0;
}
void hnsw_modify_level_scale(void* h, double factor) {
  auto* ix = static_cast<Index*>(h);
  factor = std::min(1.0, std::max(0.2, factor));
  ix->scale = factor / std::log(double(std::max<uint64_t>(ix->M, 2)));
}

void hnsw_insert(void* h, const float* v, uint64_t dim, int64_t id) {
  static_cast<Index*>(h)->insert(v, dim, id);
}

void hnsw_parallel_insert(void* h, const float* vs, uint64_t n, uint64_t dim,
                          const int64_t* ids, int n_threads) {
  static_cast<Index*>(h)->parallel_insert(vs, n, dim, ids, n_threads);
}

uint64_t hnsw_search(void* h, const float* q, uint64_t knbn, uint64_t ef,
                     int64_t* out_ids, float* out_d) {
  std::vector<Link> res;
  auto* ix = static_cast<Index*>(h);
  ix->search(q, knbn, ef, nullptr, res);
  for (size_t i = 0; i < res.size(); ++i) {
    out_ids[i] = ix->origin[res[i].id];
    out_d[i] = res[i].dist;
  }
  return res.size();
}

uint64_t hnsw_search_filter(void* h, const float* q, uint64_t knbn, uint64_t ef,
                            int (*filter)(int64_t), int64_t* out_ids, float* out_d) {
  std::vector<Link> res;
  auto* ix = static_cast<Index*>(h);
  ix->search(q, knbn, ef, filter, res);
  for (size_t i = 0; i < res.size(); ++i) {
    out_ids[i] = ix->origin[res[i].id];
    out_d[i] = res[i].dist;
  }
  return res.size();
}

void hnsw_parallel_search(void* h, const float* qs, uint64_t nq, uint64_t knbn,
                          uint64_t ef, int n_threads, int64_t* out_ids,
                          float* out_d) {
  static_cast<Index*>(h)->parallel_search(qs, nq, knbn, ef, n_threads, out_ids, out_d);
}

// ----- introspection + flat-array export (zero-copy handoff to the TPU path) -----

uint64_t hnsw_nb_points(void* h) { return uint64_t(static_cast<Index*>(h)->n.load()); }
uint64_t hnsw_dim(void* h) { return static_cast<Index*>(h)->dim; }
int64_t hnsw_entry_point(void* h) { return static_cast<Index*>(h)->entry.load(); }
int32_t hnsw_max_level_used(void* h) {
  auto* ix = static_cast<Index*>(h);
  int64_t e = ix->entry.load();
  return e >= 0 ? ix->level[e] : 0;
}
int64_t hnsw_layer_count(void* h, int32_t l) {
  auto* ix = static_cast<Index*>(h);
  return (l >= 0 && uint64_t(l) < ix->max_layer) ? ix->layer_counts[l] : 0;
}
double hnsw_level_scale(void* h) { return static_cast<Index*>(h)->scale; }

void hnsw_export_meta(void* h, int64_t* origin, int32_t* level, int32_t* rank) {
  auto* ix = static_cast<Index*>(h);
  int64_t cnt = ix->n.load();
  std::memcpy(origin, ix->origin.data(), size_t(cnt) * sizeof(int64_t));
  std::memcpy(level, ix->level.data(), size_t(cnt) * sizeof(int32_t));
  std::memcpy(rank, ix->rank.data(), size_t(cnt) * sizeof(int32_t));
}

void hnsw_export_data(void* h, float* out) {
  auto* ix = static_cast<Index*>(h);
  std::memcpy(out, ix->data.data(), size_t(ix->n.load()) * ix->dim * sizeof(float));
}

// rows padded with -1/inf into caller buffers of shape [n, width(l)]
void hnsw_export_layer(void* h, int32_t l, int32_t* ids, float* dists) {
  auto* ix = static_cast<Index*>(h);
  int64_t cnt = ix->n.load();
  uint64_t w = ix->width(uint64_t(l));
  for (int64_t i = 0; i < cnt; ++i) {
    const auto& row = ix->points[i].nbrs[l];
    uint64_t m = std::min<uint64_t>(row.size(), w);
    for (uint64_t j = 0; j < m; ++j) {
      ids[uint64_t(i) * w + j] = row[j].id;
      dists[uint64_t(i) * w + j] = row[j].dist;
    }
    for (uint64_t j = m; j < w; ++j) {
      ids[uint64_t(i) * w + j] = -1;
      dists[uint64_t(i) * w + j] = INFINITY;
    }
  }
}

}  // extern "C"
