from diffeqgmrfs_tpu.ops.btd import BTD, BTDPattern, make_btd_pattern, choose_block_size
from diffeqgmrfs_tpu.ops.cholesky import BTDCholesky, btd_cholesky
from diffeqgmrfs_tpu.ops.takahashi import takahashi_diag
from diffeqgmrfs_tpu.ops.banded import Banded, banded_from_cellop
from diffeqgmrfs_tpu.ops.cg import cg_solve, block_jacobi_preconditioner
from diffeqgmrfs_tpu.ops.refine import (
    RefinedFactor,
    MixedPrecisionFactor,
    MatFreeRefinedFactor,
    solve_mixed_precision,
    equilibrate,
)
from diffeqgmrfs_tpu.ops.ata_windows import (
    ATAWindowPlan,
    make_ata_window_plan,
    ata_btd_windows,
)
from diffeqgmrfs_tpu.ops.cyclic_reduction import cr_solve
from diffeqgmrfs_tpu.ops.inverse_solver import BTDInverseSolver
