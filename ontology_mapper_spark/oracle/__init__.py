from . import semantics  # noqa: F401
