from duckdb_vss_spark.index.artifact import (  # noqa: F401
    HnswIndex,
    create_hnsw_index,
    drop_index,
    index_info,
    load_index,
)
from duckdb_vss_spark.index.hnsw_graph import HNSWGraph  # noqa: F401
from duckdb_vss_spark.index.ivf import (  # noqa: F401
    IvfIndex,
    create_ivf_index,
    drop_ivf_index,
    load_ivf_index,
)
from duckdb_vss_spark.index.pq import (  # noqa: F401
    PqIndex,
    create_pq_index,
    drop_pq_index,
    load_pq_index,
    train_pq_codebooks,
)
from duckdb_vss_spark.index.ivfpq import (  # noqa: F401
    IvfPqIndex,
    create_ivfpq_index,
    drop_ivfpq_index,
    load_ivfpq_index,
)
from duckdb_vss_spark.index.sq import (  # noqa: F401
    sq_encode,
    sq_knn,
    sq_reconstruct,
    train_sq,
)
from duckdb_vss_spark.index.ivfsq import (  # noqa: F401
    IvfSqIndex,
    create_ivfsq_index,
    drop_ivfsq_index,
    load_ivfsq_index,
)
from duckdb_vss_spark.index.bq import (  # noqa: F401
    BqIndex,
    binary_signature,
    bq_knn,
    create_bq_index,
    drop_bq_index,
    hamming_distance,
    load_bq_index,
)
