! Fortran interface example for hiop_tpu: the Sparse Ex1 NLP implemented
! with iso_c_binding callbacks against the C ABI in
! hiop_tpu/capi/hiop_tpu_c.h.
!
! Parity with the reference's Fortran interface
! (/root/reference/src/Interface/hiopFortranInterface.h:68-157 and the
! driver /root/reference/src/Drivers/Sparse/NlpSparseFEx1.F90): the
! reference wraps its C interface with iso_c_binding typedefs; hiop_tpu
! uses the identical mechanism — bind(C) procedures collected into the
! hiop_tpu_sparse_problem struct, exported through the single symbol
! hiop_tpu_get_problem that the Python host loads with ctypes.  No
! separate Fortran shim layer is needed because the C ABI is already
! iso_c_binding-clean (int64/double/function pointers only).
!
! Build:   gfortran -O2 -shared -fPIC sparse_fex1.f90 -o sparse_fex1.so
! Solve:   python -c "from hiop_tpu.capi import solve_sparse_problem; \
!                     print(solve_sparse_problem('./sparse_fex1.so').obj)"
!
! (gfortran is not present in the CI image, so unlike the C example this
! file is compile-checked only where a Fortran toolchain exists; the ABI
! it targets is exercised by tests/test_capi.py through the C example.)

module sparse_fex1_mod
  use iso_c_binding
  implicit none

  integer(c_int64_t), parameter :: nvar = 50
  integer(c_int64_t), parameter :: ncon = nvar - 1
  integer(c_int64_t), parameter :: nnzj = 4 + 2 * (nvar - 3)
  real(c_double), parameter :: big = 1.0d20

  ! mirror of hiop_tpu_sparse_problem (hiop_tpu_c.h:30)
  type, bind(C) :: hiop_tpu_sparse_problem
    integer(c_int64_t) :: n
    integer(c_int64_t) :: m
    integer(c_int64_t) :: nnz_jac
    integer(c_int64_t) :: nnz_hess
    type(c_funptr) :: get_vars_info
    type(c_funptr) :: get_cons_info
    type(c_funptr) :: get_starting_point
    type(c_funptr) :: eval_f
    type(c_funptr) :: eval_grad_f
    type(c_funptr) :: eval_cons
    type(c_funptr) :: get_jac_structure
    type(c_funptr) :: get_hess_structure
    type(c_funptr) :: eval_jac
    type(c_funptr) :: eval_hess
  end type

  type(hiop_tpu_sparse_problem), target, save :: problem

contains

  integer(c_int) function get_vars_info(n, xl, xu) bind(C)
    integer(c_int64_t), value :: n
    real(c_double) :: xl(n), xu(n)
    xl = 0.5d0
    xu = big
    xl(1) = -big
    xl(2) = 0.0d0
    xl(3) = 1.5d0
    xu(3) = 10.0d0
    get_vars_info = 0
  end function

  integer(c_int) function get_cons_info(m, cl, cu) bind(C)
    integer(c_int64_t), value :: m
    real(c_double) :: cl(m), cu(m)
    cl(1) = 10.0d0
    cu(1) = 10.0d0
    cl(2) = 5.0d0
    cu(2) = big
    cl(3:m) = 1.0d0
    cu(3:m) = 2.0d0 * real(nvar, c_double)
    get_cons_info = 0
  end function

  integer(c_int) function get_starting_point(n, x0) bind(C)
    integer(c_int64_t), value :: n
    real(c_double) :: x0(n)
    x0 = 0.0d0
    get_starting_point = 0
  end function

  integer(c_int) function eval_f(n, x, obj) bind(C)
    integer(c_int64_t), value :: n
    real(c_double), intent(in) :: x(n)
    real(c_double) :: obj
    obj = 0.25d0 * sum((x - 1.0d0)**4)
    eval_f = 0
  end function

  integer(c_int) function eval_grad_f(n, x, grad) bind(C)
    integer(c_int64_t), value :: n
    real(c_double), intent(in) :: x(n)
    real(c_double) :: grad(n)
    grad = (x - 1.0d0)**3
    eval_grad_f = 0
  end function

  integer(c_int) function eval_cons(n, m, x, cons) bind(C)
    integer(c_int64_t), value :: n, m
    real(c_double), intent(in) :: x(n)
    real(c_double) :: cons(m)
    integer(c_int64_t) :: i
    cons(1) = 4.0d0 * x(1) + 2.0d0 * x(2)
    cons(2) = 2.0d0 * x(1) + x(3)
    do i = 4, n
      cons(i - 1) = 2.0d0 * x(1) + 0.5d0 * x(i)
    end do
    eval_cons = 0
  end function

  integer(c_int) function get_jac_structure(nnz, ijac, jjac) bind(C)
    integer(c_int64_t), value :: nnz
    integer(c_int64_t) :: ijac(nnz), jjac(nnz)
    integer(c_int64_t) :: i, k
    ! 0-based indices, matching the C ABI convention
    ijac(1) = 0; jjac(1) = 0
    ijac(2) = 0; jjac(2) = 1
    ijac(3) = 1; jjac(3) = 0
    ijac(4) = 1; jjac(4) = 2
    k = 5
    do i = 4, nvar
      ijac(k) = i - 2; jjac(k) = 0; k = k + 1
      ijac(k) = i - 2; jjac(k) = i - 1; k = k + 1
    end do
    get_jac_structure = merge(0, 1, k - 1 == nnz)
  end function

  integer(c_int) function get_hess_structure(nnz, ihess, jhess) bind(C)
    integer(c_int64_t), value :: nnz
    integer(c_int64_t) :: ihess(nnz), jhess(nnz)
    integer(c_int64_t) :: i
    do i = 1, nnz
      ihess(i) = i - 1
      jhess(i) = i - 1
    end do
    get_hess_structure = 0
  end function

  integer(c_int) function eval_jac(n, x, nnz, vals) bind(C)
    integer(c_int64_t), value :: n, nnz
    real(c_double), intent(in) :: x(n)
    real(c_double) :: vals(nnz)
    integer(c_int64_t) :: k
    vals(1) = 4.0d0; vals(2) = 2.0d0
    vals(3) = 2.0d0; vals(4) = 1.0d0
    do k = 5, nnz, 2
      vals(k) = 2.0d0
      vals(k + 1) = 0.5d0
    end do
    eval_jac = 0
  end function

  integer(c_int) function eval_hess(n, x, obj_factor, m, lambda, nnz, vals) bind(C)
    integer(c_int64_t), value :: n, m, nnz
    real(c_double), value :: obj_factor
    real(c_double), intent(in) :: x(n), lambda(m)
    real(c_double) :: vals(nnz)
    ! all constraints are linear: only the objective contributes
    vals = obj_factor * 3.0d0 * (x - 1.0d0)**2
    eval_hess = 0
  end function

  type(c_ptr) function hiop_tpu_get_problem() bind(C, name="hiop_tpu_get_problem")
    problem%n = nvar
    problem%m = ncon
    problem%nnz_jac = nnzj
    problem%nnz_hess = nvar
    problem%get_vars_info = c_funloc(get_vars_info)
    problem%get_cons_info = c_funloc(get_cons_info)
    problem%get_starting_point = c_funloc(get_starting_point)
    problem%eval_f = c_funloc(eval_f)
    problem%eval_grad_f = c_funloc(eval_grad_f)
    problem%eval_cons = c_funloc(eval_cons)
    problem%get_jac_structure = c_funloc(get_jac_structure)
    problem%get_hess_structure = c_funloc(get_hess_structure)
    problem%eval_jac = c_funloc(eval_jac)
    problem%eval_hess = c_funloc(eval_hess)
    hiop_tpu_get_problem = c_loc(problem)
  end function

end module sparse_fex1_mod
