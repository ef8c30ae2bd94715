from diffeqgmrfs_tpu.ops.btd import BTD, BTDPattern, make_btd_pattern, choose_block_size
from diffeqgmrfs_tpu.ops.cholesky import BTDCholesky, btd_cholesky
from diffeqgmrfs_tpu.ops.takahashi import takahashi_diag
