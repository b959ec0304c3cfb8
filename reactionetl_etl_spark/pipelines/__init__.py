from reactionetl_etl_spark.pipelines.training import build_training_corpus

__all__ = ["build_training_corpus"]
