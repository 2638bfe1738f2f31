from . import dedup, similarity, text_analysis  # noqa: F401
