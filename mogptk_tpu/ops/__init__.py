from .linalg import jittered_cholesky, cholesky_solve, solve_triangular, trisolve_lower, cholesky
from .blocked_cholesky import blocked_cholesky
