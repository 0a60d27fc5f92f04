// graphcore — native host-side graph preprocessing for bliss_gnn_tpu.
//
// The reference delegates its graph substrate to DGL's C++ core (CSC/CSR
// construction, subgraph ops, dataloading).  On TPU the per-step structure
// ops moved on-device (sampling/frontier.py), but the one-time host
// preprocessing — canonical CSC/CSR construction and the banded SpMM edge
// layout (ops/spmm_pallas.py) — is O(E) pointer-chasing that numpy does
// 10-30x slower than straight C++ bucket sorts.  This module provides those
// builders behind a plain C ABI consumed via ctypes
// (bliss_gnn_tpu/graph/native.py); every entry point has a numpy fallback.
//
// Build: cc -O3 -shared -fPIC -o libgraphcore.so graphcore.cpp (see
// native/build.sh); no external dependencies.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <atomic>
#include <thread>
#include <vector>

extern "C" {

// Counting-sort edges by dst: fills indptr[n_nodes+1], csc_src[E] and
// perm[E] (canonical position -> input edge index; stable within a dst).
void build_csc(int64_t n_nodes, int64_t n_edges, const int64_t* src,
               const int64_t* dst, int64_t* indptr, int64_t* csc_src,
               int64_t* perm) {
  std::memset(indptr, 0, sizeof(int64_t) * (n_nodes + 1));
  for (int64_t e = 0; e < n_edges; ++e) indptr[dst[e] + 1]++;
  for (int64_t i = 0; i < n_nodes; ++i) indptr[i + 1] += indptr[i];
  std::vector<int64_t> cursor(indptr, indptr + n_nodes);
  for (int64_t e = 0; e < n_edges; ++e) {
    int64_t p = cursor[dst[e]]++;
    csc_src[p] = src[e];
    perm[p] = e;
  }
}

// CSR (grouped by src) from canonical CSC, with csr_eid mapping back to
// canonical edge ids.
void build_csr_from_csc(int64_t n_nodes, int64_t n_edges,
                        const int64_t* csc_indptr, const int64_t* csc_src,
                        int64_t* csr_indptr, int64_t* csr_dst,
                        int64_t* csr_eid) {
  std::memset(csr_indptr, 0, sizeof(int64_t) * (n_nodes + 1));
  for (int64_t e = 0; e < n_edges; ++e) csr_indptr[csc_src[e] + 1]++;
  for (int64_t i = 0; i < n_nodes; ++i) csr_indptr[i + 1] += csr_indptr[i];
  std::vector<int64_t> cursor(csr_indptr, csr_indptr + n_nodes);
  // walk edges in canonical (dst-grouped) order so csr rows are dst-sorted
  int64_t d = 0;
  for (int64_t e = 0; e < n_edges; ++e) {
    while (e >= csc_indptr[d + 1]) ++d;
    int64_t p = cursor[csc_src[e]]++;
    csr_dst[p] = d;
    csr_eid[p] = e;
  }
}

// Banded layout: sort canonical edges by (src/band, dst/wr) — dst order is
// already canonical, so a stable bucket sort by band then window suffices.
// Phase 1 returns the number of tiles; phase 2 fills the tile arrays.
//
// sorted_eid[E] is scratch shared between the phases (the caller allocates
// and passes the same buffer to both).
int64_t banded_count_tiles(int64_t n_nodes, int64_t n_edges,
                           const int64_t* csc_indptr, const int64_t* csc_src,
                           int64_t band, int64_t wr, int64_t et,
                           int64_t* sorted_eid) {
  const int64_t n_bands = (n_nodes + band - 1) / band;
  const int64_t n_wins = (n_nodes + wr - 1) / wr;
  // bucket = band_id * n_wins + win_id; dst-grouped input order makes the
  // within-bucket order dst-sorted automatically under a stable sort
  std::vector<int64_t> bucket_count((size_t)n_bands * n_wins + 1, 0);
  std::vector<int32_t> bucket_of(n_edges);
  int64_t d = 0;
  for (int64_t e = 0; e < n_edges; ++e) {
    while (e >= csc_indptr[d + 1]) ++d;
    int64_t b = csc_src[e] / band;
    int64_t w = d / wr;
    int64_t k = b * n_wins + w;
    bucket_of[e] = (int32_t)k;
    bucket_count[k + 1]++;
  }
  for (size_t i = 1; i < bucket_count.size(); ++i)
    bucket_count[i] += bucket_count[i - 1];
  std::vector<int64_t> cursor(bucket_count.begin(), bucket_count.end() - 1);
  for (int64_t e = 0; e < n_edges; ++e)
    sorted_eid[cursor[bucket_of[e]]++] = e;
  // tiles: each nonempty bucket contributes ceil(count/et)
  int64_t n_tiles = 0;
  for (int64_t k = 0; k < n_bands * n_wins; ++k) {
    int64_t c = bucket_count[k + 1] - bucket_count[k];
    n_tiles += (c + et - 1) / et;
  }
  return n_tiles;
}

// Phase 2: fill per-tile arrays from the sorted_eid scratch of phase 1.
// edge_vals may be null (unit weights).
void banded_fill_tiles(int64_t n_nodes, int64_t n_edges,
                       const int64_t* csc_indptr, const int64_t* csc_src,
                       const float* edge_vals, int64_t band, int64_t wr,
                       int64_t et, const int64_t* sorted_eid,
                       int64_t n_tiles, int32_t* tile_win,
                       int32_t* tile_first, int32_t* src_rel,
                       int32_t* dst_rel, float* edge_w, int64_t* edge_perm,
                       int32_t* tile_band) {
  // dst per canonical eid via indptr walk (O(E))
  std::vector<int32_t> dst_of(n_edges);
  {
    int64_t d = 0;
    for (int64_t e = 0; e < n_edges; ++e) {
      while (e >= csc_indptr[d + 1]) ++d;
      dst_of[e] = (int32_t)d;
    }
  }
  std::memset(src_rel, 0, sizeof(int32_t) * n_tiles * et);
  std::memset(dst_rel, 0, sizeof(int32_t) * n_tiles * et);
  std::memset(edge_w, 0, sizeof(float) * n_tiles * et);
  for (int64_t i = 0; i < n_tiles * et; ++i) edge_perm[i] = -1;

  int64_t t = -1;
  int64_t slot = et;  // force new tile at first edge
  int64_t cur_band = -1, cur_win = -1;
  for (int64_t i = 0; i < n_edges; ++i) {
    int64_t e = sorted_eid[i];
    int64_t b = csc_src[e] / band;
    int64_t w = dst_of[e] / wr;
    bool new_bucket = (b != cur_band) || (w != cur_win);
    if (new_bucket || slot == et) {
      ++t;
      slot = 0;
      tile_band[t] = (int32_t)b;
      tile_win[t] = (int32_t)w;
      tile_first[t] = new_bucket ? 1 : 0;
      cur_band = b;
      cur_win = w;
    }
    src_rel[t * et + slot] = (int32_t)(csc_src[e] - b * band);
    dst_rel[t * et + slot] = (int32_t)(dst_of[e] - w * wr);
    edge_w[t * et + slot] = edge_vals ? edge_vals[e] : 1.0f;
    edge_perm[t * et + slot] = e;
    ++slot;
  }
}

// Per-dst-normalized edge weights (normalized_edata, bandit_sampler.py:20-27)
void normalized_edata_c(int64_t n_nodes, int64_t n_edges,
                        const int64_t* csc_indptr, const float* weights,
                        float* out) {
  for (int64_t d = 0; d < n_nodes; ++d) {
    double s = 0;
    for (int64_t e = csc_indptr[d]; e < csc_indptr[d + 1]; ++e)
      s += weights ? weights[e] : 1.0;
    for (int64_t e = csc_indptr[d]; e < csc_indptr[d + 1]; ++e)
      out[e] = s > 0 ? (float)((weights ? weights[e] : 1.0) / s) : 0.0f;
  }
}

}  // extern "C"
