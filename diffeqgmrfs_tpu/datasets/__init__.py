from diffeqgmrfs_tpu.datasets.darcy import DarcyDataset, get_xy_idcs
from diffeqgmrfs_tpu.datasets.burgers import BurgersDataset, periodic_burgers_fd
