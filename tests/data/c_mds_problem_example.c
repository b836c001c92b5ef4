/* Mixed dense-sparse C problem example (reference parity: the MDS C
 * interface, hiopInterface.h:63 and src/Drivers/MDS/NlpMdsEx1.c style).
 *
 * Variables: x in R^NS (sparse block), y in R^ND (dense block), ordered
 * [x, y].
 *
 *   min  sum 0.5*(x_i - 1)^2 + 0.5*y'Qy,   Q = I + 0.1*ones
 *   s.t. x_0 + sum y       = 1      (equality)
 *        x_1 - y_0        >= 0      (inequality)
 *        -2 <= x <= 2, -2 <= y <= 2
 *
 * Hessian blocks: hss = diag(1), hdd = Q (both times obj_factor).
 * The test cross-checks the converged objective against an autodiff dense
 * solve of the same problem.
 *
 * Build:  cc -O2 -shared -fPIC c_mds_problem_example.c -o libmds.so -lm
 */

#include <stdint.h>
#include <stddef.h>

#include "../../hiop_tpu/capi/hiop_tpu_c.h"

#define NS 6
#define ND 4
#define M 2
#define NNZ 2 /* x_0 in row 0; x_1 in row 1 */

static int get_vars_info(int64_t n, double* xlow, double* xupp) {
  for (int64_t i = 0; i < n; ++i) {
    xlow[i] = -2.0;
    xupp[i] = 2.0;
  }
  return 0;
}

static int get_cons_info(int64_t m, double* clow, double* cupp) {
  clow[0] = 1.0;
  cupp[0] = 1.0;
  clow[1] = 0.0;
  cupp[1] = 1e20;
  return 0;
}

static int get_starting_point(int64_t n, double* x0) {
  for (int64_t i = 0; i < n; ++i) x0[i] = 0.0;
  return 0;
}

static int eval_f(int64_t n, const double* x, double* obj) {
  double s = 0.0;
  for (int64_t i = 0; i < NS; ++i) s += 0.5 * (x[i] - 1.0) * (x[i] - 1.0);
  const double* y = x + NS;
  double ysum = 0.0;
  for (int64_t i = 0; i < ND; ++i) ysum += y[i];
  for (int64_t i = 0; i < ND; ++i) s += 0.5 * y[i] * (y[i] + 0.1 * ysum);
  *obj = s;
  return 0;
}

static int eval_grad_f(int64_t n, const double* x, double* grad) {
  for (int64_t i = 0; i < NS; ++i) grad[i] = x[i] - 1.0;
  const double* y = x + NS;
  double ysum = 0.0;
  for (int64_t i = 0; i < ND; ++i) ysum += y[i];
  for (int64_t i = 0; i < ND; ++i) grad[NS + i] = y[i] + 0.1 * ysum;
  return 0;
}

static int eval_cons(int64_t n, int64_t m, const double* x, double* cons) {
  const double* y = x + NS;
  double ysum = 0.0;
  for (int64_t i = 0; i < ND; ++i) ysum += y[i];
  cons[0] = x[0] + ysum;
  cons[1] = x[1] - y[0];
  return 0;
}

static int get_jac_sparse_structure(int64_t nnz, int64_t* iJac, int64_t* jJac) {
  iJac[0] = 0;
  jJac[0] = 0;
  iJac[1] = 1;
  jJac[1] = 1;
  return 0;
}

static int eval_jac_blocks(int64_t n, const double* x, int64_t nnz,
                           double* sparse_values, double* dense_block) {
  sparse_values[0] = 1.0;
  sparse_values[1] = 1.0;
  /* dense row-major (M x ND) */
  for (int64_t j = 0; j < ND; ++j) dense_block[j] = 1.0;        /* row 0 */
  for (int64_t j = 0; j < ND; ++j) dense_block[ND + j] = 0.0;   /* row 1 */
  dense_block[ND + 0] = -1.0;
  return 0;
}

static int eval_hess_blocks(int64_t n, const double* x, double obj_factor,
                            int64_t m, const double* lambda, double* hss_diag,
                            double* hdd) {
  for (int64_t i = 0; i < NS; ++i) hss_diag[i] = obj_factor;
  for (int64_t i = 0; i < ND; ++i)
    for (int64_t j = 0; j < ND; ++j)
      hdd[i * ND + j] = obj_factor * ((i == j ? 1.0 : 0.0) + 0.1);
  return 0;
}

static const hiop_tpu_mds_problem PROBLEM = {
    NS, ND, M, NNZ,
    get_vars_info, get_cons_info, get_starting_point,
    eval_f, eval_grad_f, eval_cons,
    get_jac_sparse_structure, eval_jac_blocks, eval_hess_blocks,
};

const hiop_tpu_mds_problem* hiop_tpu_get_mds_problem(void) {
  return &PROBLEM;
}
