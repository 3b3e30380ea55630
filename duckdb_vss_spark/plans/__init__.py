from duckdb_vss_spark.plans.rewrite import (  # noqa: F401
    VssPlanner,
    canonicalize_cosine,
    match_topk,
    rewrite_operators,
)
