from . import codec, tokenize  # noqa: F401
