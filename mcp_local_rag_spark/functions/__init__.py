from . import paths, text, vector  # noqa: F401
