/* Example C problem for the hiop_tpu C interface: the Sparse Ex1 NLP
 * (see examples/sparse_ex1.py and the reference NlpSparseEx1) with n=50:
 *
 *   min sum 1/4 (x_i-1)^4
 *   s.t. 4x_1 + 2x_2 == 10;  5 <= 2x_1 + x_3;  1 <= 2x_1 + 0.5x_i <= 2n
 *   x_1 free; x_2 >= 0; 1.5 <= x_3 <= 10; x_i >= 0.5 (i >= 4)
 *
 * Build:  gcc -O2 -shared -fPIC c_problem_example.c -o c_problem_example.so
 */

#include "../../hiop_tpu/capi/hiop_tpu_c.h"

#include <math.h>

#define N 50
#define M (N - 1)
#define NNZ_JAC (4 + 2 * (N - 3))
#define INF 1e20

static int get_vars_info(int64_t n, double* xl, double* xu) {
  for (int64_t i = 0; i < n; ++i) { xl[i] = 0.5; xu[i] = INF; }
  xl[0] = -INF;
  xl[1] = 0.0;
  xl[2] = 1.5; xu[2] = 10.0;
  return 0;
}

static int get_cons_info(int64_t m, double* cl, double* cu) {
  cl[0] = 10.0; cu[0] = 10.0;
  cl[1] = 5.0;  cu[1] = INF;
  for (int64_t i = 2; i < m; ++i) { cl[i] = 1.0; cu[i] = 2.0 * N; }
  return 0;
}

static int get_starting_point(int64_t n, double* x0) {
  for (int64_t i = 0; i < n; ++i) x0[i] = 0.0;
  return 0;
}

static int eval_f(int64_t n, const double* x, double* obj) {
  double v = 0.0;
  for (int64_t i = 0; i < n; ++i) v += 0.25 * pow(x[i] - 1.0, 4);
  *obj = v;
  return 0;
}

static int eval_grad_f(int64_t n, const double* x, double* g) {
  for (int64_t i = 0; i < n; ++i) g[i] = pow(x[i] - 1.0, 3);
  return 0;
}

static int eval_cons(int64_t n, int64_t m, const double* x, double* c) {
  c[0] = 4 * x[0] + 2 * x[1];
  c[1] = 2 * x[0] + x[2];
  for (int64_t i = 3; i < n; ++i) c[i - 1] = 2 * x[0] + 0.5 * x[i];
  return 0;
}

static int get_jac_structure(int64_t nnz, int64_t* iJ, int64_t* jJ) {
  int64_t k = 0;
  iJ[k] = 0; jJ[k++] = 0;
  iJ[k] = 0; jJ[k++] = 1;
  iJ[k] = 1; jJ[k++] = 0;
  iJ[k] = 1; jJ[k++] = 2;
  for (int64_t i = 3; i < N; ++i) {
    iJ[k] = i - 1; jJ[k++] = 0;
    iJ[k] = i - 1; jJ[k++] = i;
  }
  return k == nnz ? 0 : 1;
}

static int get_hess_structure(int64_t nnz, int64_t* iH, int64_t* jH) {
  for (int64_t i = 0; i < nnz; ++i) { iH[i] = i; jH[i] = i; }
  return 0;
}

static int eval_jac(int64_t n, const double* x, int64_t nnz, double* v) {
  int64_t k = 0;
  v[k++] = 4.0; v[k++] = 2.0;
  v[k++] = 2.0; v[k++] = 1.0;
  for (int64_t i = 3; i < N; ++i) { v[k++] = 2.0; v[k++] = 0.5; }
  return k == nnz ? 0 : 1;
}

static int eval_hess(int64_t n, const double* x, double obj_factor,
                     int64_t m, const double* lambda, int64_t nnz, double* v) {
  for (int64_t i = 0; i < n; ++i)
    v[i] = obj_factor * 3.0 * (x[i] - 1.0) * (x[i] - 1.0);
  return 0;
}

static const hiop_tpu_sparse_problem kProblem = {
    N, M, NNZ_JAC, N,
    get_vars_info, get_cons_info, get_starting_point,
    eval_f, eval_grad_f, eval_cons,
    get_jac_structure, get_hess_structure,
    eval_jac, eval_hess,
};

const hiop_tpu_sparse_problem* hiop_tpu_get_problem(void) { return &kProblem; }
