"""Pipeline planning: model runner + data-quality gates."""

from nhl_data_warehouse_spark.plans.quality import (
    accepted_values_check,
    freshness_check,
    null_check,
    row_count_check,
    unique_check,
)
from nhl_data_warehouse_spark.plans.runner import Model, PipelineRunner

__all__ = [
    "null_check",
    "row_count_check",
    "unique_check",
    "accepted_values_check",
    "freshness_check",
    "Model",
    "PipelineRunner",
]
