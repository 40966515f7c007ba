from .manager import CacheConfig, QueryCache

__all__ = ["CacheConfig", "QueryCache"]
