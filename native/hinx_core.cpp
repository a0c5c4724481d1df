// hinx_core: native host-side graph-builder runtime.
//
// The reference offloads its hot host paths to native code only through pip
// dependencies (torch-scatter/-sparse C++/CUDA, SURVEY.md section 2.4); the
// build-time analogue here is the HIN compilation pipeline: sorting
// multi-million-edge lists by destination, CSR construction, leave-one-out
// splitting and per-user seen-table construction.  These run once per
// dataset build but dominate wall-clock for ML-25M-scale graphs when done
// with generic pandas/numpy code; this translation unit provides O(E)
// counting-sort implementations exposed through a plain C ABI consumed via
// ctypes (graph_recsys_benchmark_tpu/native.py), with numpy fallbacks when
// the shared object has not been built.
//
// Build: make -C native        (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// Stable counting-sort of edges by destination (then source within equal
// destinations).  out_order receives the permutation; O(E + N).
void sort_edges_by_dst(const int64_t* src, const int64_t* dst, int64_t num_edges,
                       int64_t num_nodes, int64_t* out_order) {
  std::vector<int64_t> count(static_cast<size_t>(num_nodes) + 2, 0);
  for (int64_t e = 0; e < num_edges; ++e) count[dst[e] + 1]++;
  std::partial_sum(count.begin(), count.end(), count.begin());
  // first pass: bucket by dst (stable)
  std::vector<int64_t> by_dst(num_edges);
  {
    std::vector<int64_t> cur(count.begin(), count.end());
    for (int64_t e = 0; e < num_edges; ++e) by_dst[cur[dst[e]]++] = e;
  }
  // second pass: within each dst bucket, order by src for determinism
  for (int64_t n = 0; n < num_nodes; ++n) {
    int64_t lo = count[n], hi = count[n + 1];
    std::sort(by_dst.begin() + lo, by_dst.begin() + hi,
              [&](int64_t a, int64_t b) {
                return src[a] != src[b] ? src[a] < src[b] : a < b;
              });
  }
  std::memcpy(out_order, by_dst.data(), sizeof(int64_t) * num_edges);
}

// Stable counting-sort of edges by (dst / block, src): the "block order"
// the TPU kernels want — dst/block non-decreasing (bounds each 128-row
// output block's edge chunks) with src ascending within a block (makes
// every edge chunk's sources window-local for the gather/scatter MXU
// kernels).  out_order receives the permutation; O(E + N).
void sort_edges_block(const int64_t* src, const int64_t* dst, int64_t num_edges,
                      int64_t num_nodes, int64_t block, int64_t* out_order) {
  const int64_t num_blocks = (num_nodes + block - 1) / block + 1;
  std::vector<int64_t> count(static_cast<size_t>(num_blocks) + 1, 0);
  for (int64_t e = 0; e < num_edges; ++e) count[dst[e] / block + 1]++;
  std::partial_sum(count.begin(), count.end(), count.begin());
  std::vector<int64_t> by_blk(num_edges);
  {
    std::vector<int64_t> cur(count.begin(), count.end());
    for (int64_t e = 0; e < num_edges; ++e) by_blk[cur[dst[e] / block]++] = e;
  }
  // within each block bucket: order by (src, dst, e) for determinism
  for (int64_t b = 0; b < num_blocks; ++b) {
    int64_t lo = count[b], hi = count[b + 1];
    std::sort(by_blk.begin() + lo, by_blk.begin() + hi,
              [&](int64_t a, int64_t c) {
                if (src[a] != src[c]) return src[a] < src[c];
                if (dst[a] != dst[c]) return dst[a] < dst[c];
                return a < c;
              });
  }
  std::memcpy(out_order, by_blk.data(), sizeof(int64_t) * num_edges);
}

// CSR over source: rowptr[num_src+1], col[num_edges] (counting sort, O(E+N)).
void build_csr(const int64_t* src, const int64_t* dst, int64_t num_edges,
               int64_t num_src, int64_t* rowptr, int64_t* col) {
  std::vector<int64_t> count(static_cast<size_t>(num_src) + 1, 0);
  for (int64_t e = 0; e < num_edges; ++e) count[src[e] + 1]++;
  std::partial_sum(count.begin(), count.end(), count.begin());
  std::memcpy(rowptr, count.data(), sizeof(int64_t) * (num_src + 1));
  std::vector<int64_t> cur(count.begin(), count.end());
  for (int64_t e = 0; e < num_edges; ++e) col[cur[src[e]]++] = dst[e];
}

// Leave-one-out split over (uid, sort_key) interaction arrays: marks the
// row with the maximum key per user as test (ties -> later row, matching a
// stable ascending sort taking the last row, movielens.py:299-308).
// Returns the number of test rows.
int64_t leave_one_out(const int64_t* uid, const int64_t* key, int64_t n,
                      int64_t num_users, uint8_t* is_test) {
  std::vector<int64_t> best(static_cast<size_t>(num_users), -1);
  for (int64_t r = 0; r < n; ++r) {
    int64_t u = uid[r];
    if (best[u] < 0 || key[r] >= key[best[u]]) best[u] = r;
  }
  std::memset(is_test, 0, n);
  int64_t cnt = 0;
  for (int64_t u = 0; u < num_users; ++u)
    if (best[u] >= 0) { is_test[best[u]] = 1; ++cnt; }
  return cnt;
}

// Per-user sorted unique seen-item lists (local ids), padded with pad_value.
// seen_out is [num_users, width]; counts_out is [num_users].  Returns the
// maximum seen count (callers can re-run with a larger width if needed).
int64_t build_seen_table(const int64_t* uid, const int64_t* iid, int64_t n,
                         int64_t num_users, int64_t width, int64_t pad_value,
                         int64_t* seen_out, int64_t* counts_out) {
  std::vector<std::vector<int64_t>> per_user(num_users);
  for (int64_t r = 0; r < n; ++r) per_user[uid[r]].push_back(iid[r]);
  int64_t max_cnt = 0;
  for (int64_t u = 0; u < num_users; ++u) {
    auto& v = per_user[u];
    std::sort(v.begin(), v.end());
    v.erase(std::unique(v.begin(), v.end()), v.end());
    int64_t cnt = static_cast<int64_t>(v.size());
    max_cnt = std::max(max_cnt, cnt);
    counts_out[u] = cnt;
    int64_t* row = seen_out + u * width;
    int64_t keep = std::min(cnt, width);
    std::memcpy(row, v.data(), sizeof(int64_t) * keep);
    for (int64_t k = keep; k < width; ++k) row[k] = pad_value;
  }
  return max_cnt;
}

// Metapath random-walk batch on host CSR (the torch-sparse
// adj.sample analogue, models/metapath2vec.py:101-121): walks[n_walks,
// walk_len+1] local ids per step type; rel_offsets give each step's CSR.
// rowptrs/cols are the concatenated CSR arrays; rp_off[s] indexes the
// rowptr start of step s (s in [0, num_steps)), col_off[s] its col start.
// rng_state: xorshift64 seed (mutated).
void metapath_walk(const int64_t* rowptrs, const int64_t* rp_off,
                   const int64_t* cols, const int64_t* col_off,
                   int64_t num_steps, const int64_t* starts, int64_t n_walks,
                   int64_t walk_len, uint64_t* rng_state, int64_t* out) {
  uint64_t s = *rng_state;
  auto next = [&s]() {
    s ^= s << 13; s ^= s >> 7; s ^= s << 17; return s;
  };
  for (int64_t w = 0; w < n_walks; ++w) {
    int64_t cur = starts[w];
    out[w * (walk_len + 1)] = cur;
    for (int64_t t = 0; t < walk_len; ++t) {
      int64_t step = t % num_steps;
      const int64_t* rp = rowptrs + rp_off[step];
      const int64_t* cl = cols + col_off[step];
      int64_t lo = rp[cur], hi = rp[cur + 1];
      int64_t deg = hi - lo;
      // zero-degree rows read cl[lo] exactly like torch_sparse's sampler
      int64_t pick = deg > 0 ? lo + static_cast<int64_t>(next() % static_cast<uint64_t>(deg)) : lo;
      cur = cl[pick];
      out[w * (walk_len + 1) + t + 1] = cur;
    }
  }
  *rng_state = s;
}

}  // extern "C"
