from .checkpoint import latest_step, load_checkpoint, save_checkpoint
from .profiling import StepTimer, profile_trace
