from duckdb_vss_spark.pipeline.dedup import (  # noqa: F401
    dedup_clusters,
    dedup_keep,
    dedup_keep_best,
    embedding_neardup_lsh,
    embedding_neardup_pairs,
    exact_dedup,
    jaccard_pairs,
    minhash_incremental_keep,
    minhash_lsh_pairs,
    minhash_match_store,
    minhash_signature,
    minhash_store,
    shingle_table,
    simhash,
    simhash_pairs,
)
from duckdb_vss_spark.pipeline.sample import (  # noqa: F401
    hash60,
    hash_sample,
    shuffle_shards,
    weighted_sample,
)
from duckdb_vss_spark.pipeline.multimodal import (  # noqa: F401
    MEDIA_SCHEMA,
    attach_media_metadata,
    extract_features,
    sample_frames,
)
from duckdb_vss_spark.pipeline.text import (  # noqa: F401
    LANG_MARKERS,
    char_count,
    fingerprint,
    lang_id,
    quality_score,
    regex_token_count,
    stopword_ratio,
    token_count,
    tokens,
    word_ngrams,
)
from duckdb_vss_spark.pipeline.bm25 import bm25_scores  # noqa: F401
from duckdb_vss_spark.pipeline.chunk import chunk_documents  # noqa: F401
from duckdb_vss_spark.pipeline.imagehash import (  # noqa: F401
    ahash_images,
    ahash_pairs,
)
from duckdb_vss_spark.pipeline.mix import mix_by_token_budget  # noqa: F401
from duckdb_vss_spark.pipeline.sample import (  # noqa: F401
    source_cap,
    stratified_hash_sample,
)
from duckdb_vss_spark.pipeline.semdedup import (  # noqa: F401
    assign_clusters,
    kmeans_centroids,
    semdedup_pairs,
)
from duckdb_vss_spark.pipeline.spandedup import duplicate_spans  # noqa: F401
from duckdb_vss_spark.pipeline.pca import (  # noqa: F401
    gram_quantized,
    pca_power_scores,
    power_component,
)
