/* C interface for hiop_tpu.
 *
 * Parity with the reference's C interface
 * (/root/reference/src/Interface/hiopInterface.h:63-176 and
 * chiopInterface.cpp): the user fills a struct of callback function
 * pointers describing a sparse NLP; the solver host (Python) loads the
 * user's shared library via hiop_tpu.capi and drives these callbacks.
 *
 * Every callback returns 0 on success, nonzero on error. Arrays are
 * caller-allocated; the user fills them in place (same convention as the
 * reference's hiop_sparse_create_problem).
 *
 * The user's shared library must export a single symbol
 *
 *     const hiop_tpu_sparse_problem* hiop_tpu_get_problem(void);
 *
 * returning a pointer with static lifetime. See
 * tests/data/c_problem_example.c for a complete example.
 */

#ifndef HIOP_TPU_C_H
#define HIOP_TPU_C_H

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct hiop_tpu_sparse_problem {
  /* sizes */
  int64_t n;        /* number of variables */
  int64_t m;        /* number of constraints */
  int64_t nnz_jac;  /* Jacobian nonzeros (static structure) */
  int64_t nnz_hess; /* upper-triangle Hessian nonzeros (static structure) */

  /* bounds: fill xlow/xupp (length n) and clow/cupp (length m);
   * magnitudes >= 1e20 mean unbounded */
  int (*get_vars_info)(int64_t n, double* xlow, double* xupp);
  int (*get_cons_info)(int64_t m, double* clow, double* cupp);

  /* starting point (length n) */
  int (*get_starting_point)(int64_t n, double* x0);

  /* objective, gradient, constraints */
  int (*eval_f)(int64_t n, const double* x, double* obj);
  int (*eval_grad_f)(int64_t n, const double* x, double* grad);
  int (*eval_cons)(int64_t n, int64_t m, const double* x, double* cons);

  /* static structures: fill iJac/jJac (length nnz_jac), iHess/jHess
   * (length nnz_hess, upper triangle) */
  int (*get_jac_structure)(int64_t nnz, int64_t* iJac, int64_t* jJac);
  int (*get_hess_structure)(int64_t nnz, int64_t* iHess, int64_t* jHess);

  /* values aligned with the structures */
  int (*eval_jac)(int64_t n, const double* x, int64_t nnz, double* values);
  int (*eval_hess)(int64_t n, const double* x, double obj_factor,
                   int64_t m, const double* lambda, int64_t nnz,
                   double* values);
} hiop_tpu_sparse_problem;

#ifdef __cplusplus
}
#endif

#endif /* HIOP_TPU_C_H */
