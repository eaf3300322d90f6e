from .queries import HEADLINE_QUERIES, QUERIES, oracle_sql_map, query_map

__all__ = ["QUERIES", "HEADLINE_QUERIES", "query_map", "oracle_sql_map"]
