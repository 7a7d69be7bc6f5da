from .env import setup_compilation_cache  # noqa: F401
