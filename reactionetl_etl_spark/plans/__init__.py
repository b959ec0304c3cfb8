from reactionetl_etl_spark.plans.catalog import QuerySpec, all_queries, bench_queries, get_query

__all__ = ["QuerySpec", "all_queries", "bench_queries", "get_query"]
