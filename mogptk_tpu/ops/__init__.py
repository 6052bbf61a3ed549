from .linalg import jittered_cholesky, cholesky_solve, solve_triangular, trisolve_lower, cholesky, split_bf16, merge_bf16
from .blocked_cholesky import blocked_cholesky
