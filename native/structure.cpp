// Native structure engine: the host-side symbolic layer of the framework.
//
// The reference's performance-critical native code is CHOLMOD/Pardiso
// (SURVEY.md §2.0): sparse direct factorization *numeric* phases (which on
// TPU become XLA/MXU block kernels) plus the *symbolic* analyze phase
// (fill-reducing orderings, elimination structure). This library is the
// TPU-native equivalent of that symbolic phase: it runs on the host, once
// per sparsity pattern, and produces the static index structures the JAX
// programs consume:
//
//  * reverse Cuthill-McKee bandwidth-reducing ordering (replaces CHOLMOD's
//    AMD fill-reducing permutation: on banded/block-tridiagonal storage the
//    right objective is bandwidth, not fill)
//  * COO -> block-tridiagonal flat scatter indices (the pattern behind
//    BTDPattern.scatter; ~1e8 entries for production Darcy A^T A patterns,
//    where NumPy temporaries become the bottleneck)
//  * per-row column-union (CSR) structure for cell-assembled operators
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this toolchain).

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <queue>
#include <vector>

extern "C" {

// Reverse Cuthill-McKee ordering of a symmetric sparsity pattern in CSR.
// perm[i] = old index of new row i. Returns 0 on success.
int rcm_ordering(int64_t n, const int64_t* indptr, const int64_t* indices,
                 int64_t* perm) {
  std::vector<int64_t> degree(n);
  for (int64_t i = 0; i < n; ++i) degree[i] = indptr[i + 1] - indptr[i];
  std::vector<char> visited(n, 0);
  std::vector<int64_t> order;
  order.reserve(n);
  std::vector<int64_t> nbrs;

  for (;;) {
    // find unvisited vertex of minimum degree (new component seed)
    int64_t seed = -1, best = INT64_MAX;
    for (int64_t i = 0; i < n; ++i)
      if (!visited[i] && degree[i] < best) { best = degree[i]; seed = i; }
    if (seed < 0) break;
    std::queue<int64_t> q;
    q.push(seed);
    visited[seed] = 1;
    while (!q.empty()) {
      int64_t v = q.front(); q.pop();
      order.push_back(v);
      nbrs.clear();
      for (int64_t k = indptr[v]; k < indptr[v + 1]; ++k) {
        int64_t u = indices[k];
        if (u >= 0 && u < n && !visited[u]) { visited[u] = 1; nbrs.push_back(u); }
      }
      std::sort(nbrs.begin(), nbrs.end(),
                [&](int64_t a, int64_t b) { return degree[a] < degree[b]; });
      for (int64_t u : nbrs) q.push(u);
    }
  }
  // reverse
  for (int64_t i = 0; i < n; ++i) perm[i] = order[n - 1 - i];
  return 0;
}

// COO -> BTD flat scatter index (see BTDPattern in ops/btd.py).
// flat[k] addresses [N*bs*bs diag | (N-1)*bs*bs lower]; dropped (upper
// mirror) entries get total_size. Returns the number of out-of-band entries
// (must be 0 for a valid pattern; caller raises otherwise).
int64_t btd_flat_index(int64_t nnz, const int64_t* rows, const int64_t* cols,
                       int64_t n, int64_t bs, int64_t N, int64_t* flat) {
  const int64_t diag_size = N * bs * bs;
  const int64_t total = diag_size + (N > 1 ? (N - 1) * bs * bs : 0);
  int64_t bad = 0;
  for (int64_t k = 0; k < nnz; ++k) {
    const int64_t i = rows[k], j = cols[k];
    const int64_t bi = i / bs, bj = j / bs;
    const int64_t d = bi - bj;
    if (d == 0) {
      flat[k] = bi * bs * bs + (i % bs) * bs + (j % bs);
    } else if (d == 1) {
      flat[k] = diag_size + bj * bs * bs + (i % bs) * bs + (j % bs);
    } else if (d == -1) {
      flat[k] = total;  // mirrored by the lower entry
    } else {
      flat[k] = total;
      ++bad;
    }
  }
  return bad;
}

// Per-row column-union structure of a cell-assembled operator:
// given cell_dofs [nc, nd], produce padded per-row sorted unique columns
// [ndofs, K] and, per COO entry (c, i, j), the slot of column cell_dofs[c,j]
// within row cell_dofs[c,i]'s list. Two-pass: call with cols=nullptr to get
// K (the max row degree); then with buffers allocated.
int64_t row_structure(int64_t nc, int64_t nd, const int32_t* cell_dofs,
                      int64_t ndofs, int64_t K, int64_t* cols_out,
                      int64_t* slot_out) {
  std::vector<std::vector<int64_t>> row_cols(ndofs);
  for (int64_t c = 0; c < nc; ++c)
    for (int64_t i = 0; i < nd; ++i) {
      int64_t r = cell_dofs[c * nd + i];
      for (int64_t j = 0; j < nd; ++j)
        row_cols[r].push_back(cell_dofs[c * nd + j]);
    }
  int64_t maxK = 0;
  for (int64_t r = 0; r < ndofs; ++r) {
    auto& v = row_cols[r];
    std::sort(v.begin(), v.end());
    v.erase(std::unique(v.begin(), v.end()), v.end());
    maxK = std::max<int64_t>(maxK, (int64_t)v.size());
  }
  if (cols_out == nullptr) return maxK;
  for (int64_t r = 0; r < ndofs; ++r) {
    const auto& v = row_cols[r];
    for (int64_t k = 0; k < K; ++k)
      cols_out[r * K + k] =
          k < (int64_t)v.size() ? v[k] : (v.empty() ? r : v[0]);
  }
  for (int64_t c = 0; c < nc; ++c)
    for (int64_t i = 0; i < nd; ++i) {
      const int64_t r = cell_dofs[c * nd + i];
      const auto& v = row_cols[r];
      for (int64_t j = 0; j < nd; ++j) {
        const int64_t col = cell_dofs[c * nd + j];
        const int64_t s =
            std::lower_bound(v.begin(), v.end(), col) - v.begin();
        slot_out[(c * nd + i) * nd + j] = s;
      }
    }
  return maxK;
}

// Bandwidth of a COO pattern.
int64_t coo_bandwidth(int64_t nnz, const int64_t* rows, const int64_t* cols) {
  int64_t bw = 0;
  for (int64_t k = 0; k < nnz; ++k)
    bw = std::max(bw, rows[k] > cols[k] ? rows[k] - cols[k] : cols[k] - rows[k]);
  return bw;
}

}  // extern "C"
