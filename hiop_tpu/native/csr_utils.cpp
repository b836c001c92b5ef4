// Host-side sparse symbolic utilities.
//
// Native equivalent of the reference's host-side sparse analysis phase
// (triplet handling in hiopMatrixSparseTriplet.cpp, the CSR
// symbolic/numeric split of hiopMatrixSparseCSRSeq, and the fill-reducing
// ordering selection of hiopLinSolverCholCuSparse —
// /root/reference/src/LinAlg/). These run once per problem at
// construction time on the host (the TPU never sees sparse formats; the
// symbolic phase produces the static index maps that the jitted
// scatter/gather kernels close over), so C++ is the right tool — exactly
// where the reference keeps its KLU/analysis phase.
//
// Exposed as a plain C ABI for ctypes; built with:  g++ -O3 -shared -fPIC
//
// Functions:
//   coo_to_csr_index  — sort triplets row-major (stable by column),
//                       merge duplicates; returns permutation + merge map
//   csr_transpose_index — column-wise permutation for CSR^T
//   rcm_ordering      — reverse Cuthill-McKee fill-reducing ordering of a
//                       symmetric sparsity pattern

#include <algorithm>
#include <cstdint>
#include <queue>
#include <vector>

extern "C" {

// Sort COO triplets (rows, cols) of length nnz into CSR order and merge
// duplicates. Outputs:
//   perm[nnz]      — for each sorted slot, the original triplet index
//   merge_to[nnz]  — for each sorted slot, the output (deduped) slot
//   out_rows/out_cols[<=nnz] — deduped structure
//   row_ptr[m+1]   — CSR row pointers over the deduped structure
// Returns the deduped nnz (or -1 on bad input).
int64_t coo_to_csr_index(int64_t m, int64_t /*n*/, int64_t nnz,
                         const int64_t* rows, const int64_t* cols,
                         int64_t* perm, int64_t* merge_to,
                         int64_t* out_rows, int64_t* out_cols,
                         int64_t* row_ptr) {
  std::vector<int64_t> idx(nnz);
  for (int64_t i = 0; i < nnz; ++i) idx[i] = i;
  std::stable_sort(idx.begin(), idx.end(), [&](int64_t a, int64_t b) {
    if (rows[a] != rows[b]) return rows[a] < rows[b];
    return cols[a] < cols[b];
  });
  int64_t out = -1;
  int64_t prev_r = -1, prev_c = -1;
  for (int64_t k = 0; k < nnz; ++k) {
    const int64_t i = idx[k];
    if (rows[i] < 0 || rows[i] >= m) return -1;
    perm[k] = i;
    if (rows[i] != prev_r || cols[i] != prev_c) {
      ++out;
      out_rows[out] = rows[i];
      out_cols[out] = cols[i];
      prev_r = rows[i];
      prev_c = cols[i];
    }
    merge_to[k] = out;
  }
  const int64_t nnz_out = out + 1;
  for (int64_t r = 0; r <= m; ++r) row_ptr[r] = 0;
  for (int64_t k = 0; k < nnz_out; ++k) row_ptr[out_rows[k] + 1]++;
  for (int64_t r = 0; r < m; ++r) row_ptr[r + 1] += row_ptr[r];
  return nnz_out;
}

// Permutation taking CSR values to CSR^T (CSC) order.
// row_ptr[m+1], cols[nnz] describe the CSR matrix with n columns.
void csr_transpose_index(int64_t m, int64_t n, int64_t nnz,
                         const int64_t* row_ptr, const int64_t* cols,
                         int64_t* t_row_ptr, int64_t* t_cols,
                         int64_t* perm) {
  std::vector<int64_t> cnt(n + 1, 0);
  for (int64_t k = 0; k < nnz; ++k) cnt[cols[k] + 1]++;
  for (int64_t c = 0; c < n; ++c) cnt[c + 1] += cnt[c];
  for (int64_t c = 0; c <= n; ++c) t_row_ptr[c] = cnt[c];
  std::vector<int64_t> next(cnt.begin(), cnt.end() - 1);
  for (int64_t r = 0; r < m; ++r) {
    for (int64_t k = row_ptr[r]; k < row_ptr[r + 1]; ++k) {
      const int64_t c = cols[k];
      const int64_t slot = next[c]++;
      t_cols[slot] = r;
      perm[slot] = k;
    }
  }
}

// Reverse Cuthill-McKee ordering of a symmetric pattern given in CSR
// (pattern of A + A^T expected). Writes the permutation (new -> old).
void rcm_ordering(int64_t n, const int64_t* row_ptr, const int64_t* cols,
                  int64_t* order) {
  std::vector<int64_t> degree(n);
  for (int64_t i = 0; i < n; ++i) degree[i] = row_ptr[i + 1] - row_ptr[i];
  std::vector<char> visited(n, 0);
  int64_t pos = 0;
  for (;;) {
    // pick the unvisited node of minimum degree as the next component seed
    int64_t seed = -1, best = INT64_MAX;
    for (int64_t i = 0; i < n; ++i)
      if (!visited[i] && degree[i] < best) { best = degree[i]; seed = i; }
    if (seed < 0) break;
    std::queue<int64_t> q;
    q.push(seed);
    visited[seed] = 1;
    while (!q.empty()) {
      const int64_t u = q.front();
      q.pop();
      order[pos++] = u;
      std::vector<int64_t> nbrs;
      for (int64_t k = row_ptr[u]; k < row_ptr[u + 1]; ++k) {
        const int64_t v = cols[k];
        if (v >= 0 && v < n && !visited[v]) {
          visited[v] = 1;
          nbrs.push_back(v);
        }
      }
      std::sort(nbrs.begin(), nbrs.end(),
                [&](int64_t a, int64_t b) { return degree[a] < degree[b]; });
      for (int64_t v : nbrs) q.push(v);
    }
  }
  // reverse for RCM
  for (int64_t i = 0; i < n / 2; ++i) std::swap(order[i], order[n - 1 - i]);
}

}  // extern "C"
