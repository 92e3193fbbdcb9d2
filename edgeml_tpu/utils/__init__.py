from .compile_cache import enable_compilation_cache
from .paths import parse_path, save_result

__all__ = ["enable_compilation_cache", "parse_path", "save_result"]
