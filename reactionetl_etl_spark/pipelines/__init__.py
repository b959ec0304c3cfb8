from reactionetl_etl_spark.pipelines.multimodal import build_image_corpus
from reactionetl_etl_spark.pipelines.training import build_training_corpus

__all__ = ["build_image_corpus", "build_training_corpus"]
