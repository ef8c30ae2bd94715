from diffeqgmrfs_tpu.utils.config import enable_x64, default_float
from diffeqgmrfs_tpu.utils.timers import Timer, PhaseTimers
