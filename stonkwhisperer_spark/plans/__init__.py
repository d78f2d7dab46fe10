from stonkwhisperer_spark.plans.registry import QUERIES, oracle_map, query_map

__all__ = ["QUERIES", "query_map", "oracle_map"]
