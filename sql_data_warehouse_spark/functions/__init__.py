from . import text, tsql, vectors  # noqa: F401
