from . import compile, ir, pattern  # noqa: F401
