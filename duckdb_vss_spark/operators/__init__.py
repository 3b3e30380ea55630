from duckdb_vss_spark.operators.join import knn_join, vss_join, vss_match  # noqa: F401
from duckdb_vss_spark.operators.topk import (  # noqa: F401
    knn_search,
    max_by_k,
    min_by_k,
    topk_struct_agg,
)
from duckdb_vss_spark.operators.asof import asof_join  # noqa: F401
from duckdb_vss_spark.operators.fuse import add_rank, rrf_fuse  # noqa: F401
from duckdb_vss_spark.operators.interval import interval_join  # noqa: F401
from duckdb_vss_spark.operators.mmr import mmr_rerank  # noqa: F401
