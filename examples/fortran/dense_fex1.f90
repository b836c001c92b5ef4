! Fortran interface example for hiop_tpu: a dense-constrained NLP
! implemented with iso_c_binding callbacks against the dense C ABI in
! hiop_tpu/capi/hiop_tpu_c.h (hiop_tpu_dense_problem).
!
! Parity with the reference's dense Fortran driver
! (/root/reference/src/Drivers/Dense/NlpDenseConsFEx1.F90, via
! hiopFortranInterface.h): a quadratic objective with one equality and one
! inequality, dense row-major Jacobian, solved with the quasi-Newton IPM.
!
!   min  sum 0.5*(x_i - 1)^2
!   s.t. sum x_i  = n/2
!        x_1 + x_2 >= 0.2
!        0 <= x <= 2
!
! Analytic optimum: interior in the inequality; x_i = 1/2, obj = n/8.
!
! Build:   gfortran -O2 -shared -fPIC dense_fex1.f90 -o dense_fex1.so
! Solve:   python -c "from hiop_tpu.capi import solve_dense_problem; \
!                     print(solve_dense_problem('./dense_fex1.so').obj)"
!
! (gfortran is not present in the CI image, so this file is compile-checked
! only where a Fortran toolchain exists; the ABI it targets is exercised by
! tests/test_capi.py through tests/data/c_dense_problem_example.c.)

module dense_fex1_mod
  use iso_c_binding
  implicit none

  integer(c_int64_t), parameter :: nvar = 20
  integer(c_int64_t), parameter :: ncon = 2
  real(c_double), parameter :: big = 1.0d20

  ! mirror of hiop_tpu_dense_problem (hiop_tpu_c.h)
  type, bind(C) :: hiop_tpu_dense_problem
    integer(c_int64_t) :: n
    integer(c_int64_t) :: m
    type(c_funptr) :: get_vars_info
    type(c_funptr) :: get_cons_info
    type(c_funptr) :: get_starting_point
    type(c_funptr) :: eval_f
    type(c_funptr) :: eval_grad_f
    type(c_funptr) :: eval_cons
    type(c_funptr) :: eval_jac_cons
  end type

  type(hiop_tpu_dense_problem), target, save :: problem

contains

  integer(c_int) function get_vars_info(n, xl, xu) bind(C)
    integer(c_int64_t), value :: n
    real(c_double) :: xl(n), xu(n)
    xl = 0.0d0
    xu = 2.0d0
    get_vars_info = 0
  end function

  integer(c_int) function get_cons_info(m, cl, cu) bind(C)
    integer(c_int64_t), value :: m
    real(c_double) :: cl(m), cu(m)
    cl(1) = 0.5d0 * real(nvar, c_double)
    cu(1) = cl(1)
    cl(2) = 0.2d0
    cu(2) = big
    get_cons_info = 0
  end function

  integer(c_int) function get_starting_point(n, x0) bind(C)
    integer(c_int64_t), value :: n
    real(c_double) :: x0(n)
    x0 = 1.0d0
    get_starting_point = 0
  end function

  integer(c_int) function eval_f(n, x, obj) bind(C)
    integer(c_int64_t), value :: n
    real(c_double), intent(in) :: x(n)
    real(c_double) :: obj
    obj = 0.5d0 * sum((x - 1.0d0)**2)
    eval_f = 0
  end function

  integer(c_int) function eval_grad_f(n, x, grad) bind(C)
    integer(c_int64_t), value :: n
    real(c_double), intent(in) :: x(n)
    real(c_double) :: grad(n)
    grad = x - 1.0d0
    eval_grad_f = 0
  end function

  integer(c_int) function eval_cons(n, m, x, cons) bind(C)
    integer(c_int64_t), value :: n, m
    real(c_double), intent(in) :: x(n)
    real(c_double) :: cons(m)
    cons(1) = sum(x)
    cons(2) = x(1) + x(2)
    eval_cons = 0
  end function

  integer(c_int) function eval_jac_cons(n, m, x, jac) bind(C)
    integer(c_int64_t), value :: n, m
    real(c_double), intent(in) :: x(n)
    ! dense row-major (m x n), flattened
    real(c_double) :: jac(m * n)
    jac(1:n) = 1.0d0
    jac(n + 1:2 * n) = 0.0d0
    jac(n + 1) = 1.0d0
    jac(n + 2) = 1.0d0
    eval_jac_cons = 0
  end function

  type(c_ptr) function hiop_tpu_get_dense_problem() &
      bind(C, name="hiop_tpu_get_dense_problem")
    problem%n = nvar
    problem%m = ncon
    problem%get_vars_info = c_funloc(get_vars_info)
    problem%get_cons_info = c_funloc(get_cons_info)
    problem%get_starting_point = c_funloc(get_starting_point)
    problem%eval_f = c_funloc(eval_f)
    problem%eval_grad_f = c_funloc(eval_grad_f)
    problem%eval_cons = c_funloc(eval_cons)
    problem%eval_jac_cons = c_funloc(eval_jac_cons)
    hiop_tpu_get_dense_problem = c_loc(problem)
  end function

end module dense_fex1_mod
