from .dtype import DTypePolicy, resolve_dtype  # noqa: F401
