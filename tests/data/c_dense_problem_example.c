/* Dense-constrained C problem example (reference parity:
 * src/Drivers/Dense style problem over the C ABI, hiopInterface.h:150).
 *
 *   min  sum 0.5*(x_i - 1)^2
 *   s.t. sum x_i = n/2,   0 <= x <= 2
 *
 * Analytic optimum: x_i = 1/2, obj = n/8.
 *
 * Build:  cc -O2 -shared -fPIC c_dense_problem_example.c -o libdense.so -lm
 */

#include <stdint.h>
#include <stddef.h>

#include "../../hiop_tpu/capi/hiop_tpu_c.h"

#define N 20
#define M 1

static int get_vars_info(int64_t n, double* xlow, double* xupp) {
  for (int64_t i = 0; i < n; ++i) {
    xlow[i] = 0.0;
    xupp[i] = 2.0;
  }
  return 0;
}

static int get_cons_info(int64_t m, double* clow, double* cupp) {
  clow[0] = 0.5 * N;
  cupp[0] = 0.5 * N;
  return 0;
}

static int get_starting_point(int64_t n, double* x0) {
  for (int64_t i = 0; i < n; ++i) x0[i] = 1.0;
  return 0;
}

static int eval_f(int64_t n, const double* x, double* obj) {
  double s = 0.0;
  for (int64_t i = 0; i < n; ++i) s += 0.5 * (x[i] - 1.0) * (x[i] - 1.0);
  *obj = s;
  return 0;
}

static int eval_grad_f(int64_t n, const double* x, double* grad) {
  for (int64_t i = 0; i < n; ++i) grad[i] = x[i] - 1.0;
  return 0;
}

static int eval_cons(int64_t n, int64_t m, const double* x, double* cons) {
  double s = 0.0;
  for (int64_t i = 0; i < n; ++i) s += x[i];
  cons[0] = s;
  return 0;
}

static int eval_jac_cons(int64_t n, int64_t m, const double* x, double* jac) {
  /* row-major (m x n): single all-ones row */
  for (int64_t i = 0; i < n; ++i) jac[i] = 1.0;
  return 0;
}

static const hiop_tpu_dense_problem PROBLEM = {
    N, M,
    get_vars_info, get_cons_info, get_starting_point,
    eval_f, eval_grad_f, eval_cons, eval_jac_cons,
};

const hiop_tpu_dense_problem* hiop_tpu_get_dense_problem(void) {
  return &PROBLEM;
}
