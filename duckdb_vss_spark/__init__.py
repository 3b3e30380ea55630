"""duckdb_vss_spark — a PySpark-native vector analytics engine.

Re-expresses the query surface of the duckdb/duckdb_vss extension
(ANN top-k scan/aggregate/join over fixed-size float vectors) on Spark
DataFrames, plus the large-scale training-data pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) that a
100 TB deployment of such an engine needs.

Canonical API (SURVEY.md §7): library functions over DataFrames;
Catalyst handles the relational optimization the reference delegates to
DuckDB core.
"""

from duckdb_vss_spark.functions.distance import (  # noqa: F401
    METRICS,
    array_cosine_distance,
    array_cosine_similarity,
    array_distance,
    array_distance_sq,
    array_inner_product,
    array_negative_inner_product,
    array_value,
    distance_for_metric,
    register_sql_functions,
    require_dim,
)
from duckdb_vss_spark.session import get_spark, set_interactive  # noqa: F401

__version__ = "0.1.0"
