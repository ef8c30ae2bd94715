from diffeqgmrfs_tpu.parallel.multichip import (
    make_mesh,
    shard_btd,
    batch_sharding,
)
from diffeqgmrfs_tpu.parallel.batched import batched_solver, run_in_batches
from diffeqgmrfs_tpu.parallel.tp_factor import (
    TPBTDCholesky,
    tp_bcgs_qr_r,
    tp_btd_cholesky,
)
