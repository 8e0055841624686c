from .registry import REGISTRY, QuerySpec, load_all, oracle_sql, queries, register, register_sql

__all__ = [
    "REGISTRY",
    "QuerySpec",
    "load_all",
    "oracle_sql",
    "queries",
    "register",
    "register_sql",
]
