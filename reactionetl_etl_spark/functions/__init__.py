from reactionetl_etl_spark.functions.vectors import as_double_array, cosine_similarity, dot, l2_norm

__all__ = ["as_double_array", "cosine_similarity", "dot", "l2_norm"]
