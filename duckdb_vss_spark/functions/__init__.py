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
