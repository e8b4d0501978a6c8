from .registry import QueryDef, all_queries

__all__ = ["QueryDef", "all_queries"]
