from .checkpoint import latest_step, load_checkpoint, save_checkpoint
from .compile_cache import enable_compile_cache
from .profiling import StepTimer, profile_trace
