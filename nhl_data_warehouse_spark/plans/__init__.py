"""Pipeline planning: model runner + data-quality gates."""

from nhl_data_warehouse_spark.plans.quality import null_check
from nhl_data_warehouse_spark.plans.runner import Model, PipelineRunner

__all__ = ["null_check", "Model", "PipelineRunner"]
