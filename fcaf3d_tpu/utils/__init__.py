from .env import setup_compilation_cache  # noqa: F401
from .flops import flop_counter, record_flops  # noqa: F401
