from diffeqgmrfs_tpu.ops.btd import BTD, BTDPattern, make_btd_pattern, choose_block_size
from diffeqgmrfs_tpu.ops.cholesky import BTDCholesky, btd_cholesky
from diffeqgmrfs_tpu.ops.takahashi import takahashi_diag
from diffeqgmrfs_tpu.ops.banded import Banded, banded_from_cellop
from diffeqgmrfs_tpu.ops.cg import cg_solve, block_jacobi_preconditioner
from diffeqgmrfs_tpu.ops.refine import (
    RefinedFactor,
    solve_mixed_precision,
    equilibrate,
)
