"""Column-expression helpers (pure ``Column -> Column`` functions).

Everything here compiles to built-in Catalyst expressions — no Python
UDFs — so whole-stage codegen stays intact (SURVEY.md §2.8).
"""

from nhl_data_warehouse_spark.functions.cleaning import (
    clean_scraped,
    md5_key,
    null_out_like,
    time_to_minutes,
)

__all__ = ["clean_scraped", "md5_key", "null_out_like", "time_to_minutes"]
