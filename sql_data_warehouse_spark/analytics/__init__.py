from .registry import Query, all_queries, query  # noqa: F401
