from .linalg import jittered_cholesky, cholesky_solve, solve_triangular, trisolve_lower
