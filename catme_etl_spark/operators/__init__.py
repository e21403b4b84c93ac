from .registry import QUERIES, ORACLE, query

__all__ = ["QUERIES", "ORACLE", "query"]
