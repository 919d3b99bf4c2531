"""Pipeline composition (the reference's step-list model, Spark-planned)."""

from metadata_enhanced_pretrain_datapipeline_spark.plans.pipeline import Pipeline, FilterStep, MapStep

__all__ = ["Pipeline", "FilterStep", "MapStep"]
