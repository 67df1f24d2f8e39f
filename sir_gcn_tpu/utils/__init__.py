from .checkpoint import load_checkpoint, save_checkpoint
from .profiling import StepTimer, profile_trace
