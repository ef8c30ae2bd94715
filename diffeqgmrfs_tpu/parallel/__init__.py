from diffeqgmrfs_tpu.parallel.multichip import (
    make_mesh,
    shard_btd,
    batch_sharding,
)
