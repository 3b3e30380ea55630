"""Train/eval contamination detection (benchmark-leak scan).

The standard n-gram decontamination check run before training (GPT-3
appendix C / PaLM-style): an eval document is *contaminated* if it
shares word n-grams with any training document. Architecture is an
inverted-index join, never an all-pairs scan:

1. per-doc DISTINCT word n-grams, map-only (in-row window + dedup);
2. each gram hashed to a 60-bit md5-prefix BIGINT — the shuffle carries
   (doc_id, 8-byte gram key), never gram strings;
3. eval grams ⋈ train grams on the hash key (the eval side is the
   small side by construction — AQE broadcasts it; the train side is
   never collected or broadcast);
4. per-eval-doc aggregation: distinct shared grams + distinct matching
   train docs.

``max_train_df`` optionally drops grams appearing in more than that
many train docs before the join (the stop-shingle cap of the dedup
family): a boilerplate gram present in every train doc would otherwise
fan out |eval| × |train| rows. Contamination semantics tolerate the
cap — a gram that common is boilerplate, not leakage.

60-bit hash collisions under-count nothing in practice (P[any
collision] < 1e-9 at 10⁹ distinct grams per eval doc scale) and the
SQL oracle applies the identical hash, so results stay bit-equal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["ngram_contamination"]


def ngram_contamination(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    is_eval: Column,
    n: int = 4,
    max_train_df: int | None = None,
    broadcast_eval: bool | None = None,
    broadcast_eval_docs: int = 20_000,
    broadcast_train_bytes: int = 20 << 20,
) -> DataFrame:
    """Per-eval-doc contamination report: (id_col, n_shared_grams,
    n_train_docs), eval docs with zero overlap omitted.

    The eval/train split applies BEFORE gram extraction: Spark
    re-evaluates a shared subtree once per consuming branch, so
    filtering after shingling would shingle the full corpus twice
    (measured 2x on this query's wall time). Filtering first also
    means the (tiny) eval side shingles only eval docs.

    Gram extraction is all-JVM (r10): per-row DISTINCT gram arrays
    (``array_distinct`` — in-row, no dedup exchange) exploded and
    md5-hashed inside codegen, so the whole operator runs without a
    single Python worker. Measured at 8x data this beats the Arrow
    ``doc_shingles`` pass 1.5x on the train leg and 2x on the eval
    leg (the UDF's python-worker spin-up dominates the small side);
    the earlier "HOF ~4x slower" result was the dedup-EXCHANGE
    relational form, not this in-row one. Hash values are the
    identical 60-bit md5 prefixes the SQL oracle derives."""
    from duckdb_vss_spark.pipeline.dedup import _spread
    from duckdb_vss_spark.pipeline.text import word_ngrams

    def _grams(side: DataFrame, out_id: str) -> DataFrame:
        return _spread(side).select(
            F.col(id_col).alias(out_id),
            F.explode(F.array_distinct(word_ngrams(text_col, n))).alias("sh"),
        ).select(
            out_id,
            F.conv(F.substring(F.md5("sh"), 1, 15), 16, 10)
            .cast("long")
            .alias("gh"),
        )

    ev = _grams(docs.where(is_eval), id_col)
    tr = _grams(docs.where(~is_eval), "train_id")
    if max_train_df is not None:
        dfreq = tr.groupBy("gh").agg(F.count(F.lit(1)).alias("df"))
        tr = tr.join(dfreq.where(F.col("df") <= max_train_df).select("gh"), "gh")
    # Eval-grams broadcast pre-aggregation (VERDICT r8 #7): in the
    # decontamination regime eval ≪ train by construction — benchmark
    # suites are thousands of docs against a corpus of billions — so
    # the DISTINCT eval gram keys (8 bytes each) broadcast, and the
    # train side is filtered MAP-SIDE before any exchange: the shuffle
    # then carries only train grams that actually collide with an eval
    # gram (≈ the contamination itself, usually ~0% of train grams)
    # instead of the FULL train gram set. The auto gate requires BOTH
    # sides to qualify (r10): a large-enough train input that its gram
    # shuffle dominates the broadcast machinery's fixed costs
    # (materialize + distinct + broadcast build + a second join), AND a
    # small eval side. The measured flip on the documents corpus sits
    # between 5 MB and 19 MB of compressed input (x8 = 4.8 MB: shuffle
    # 1.4s vs broadcast 1.9s; x32 = 19 MB: broadcast 6.5s vs shuffle
    # 9.2s) — the 20 MiB default splits it in the gate's uncompressed
    # terms (the corpus's ~2.6x footer ratio); the proxy is rough across
    # corpora, but everything that matters at warehouse scale is far
    # above it, so misclassification risk is confined to the sub-second
    # regime. Train size reads file metadata only (no job; Catalyst's
    # estimate above this subtree is useless anyway) with unknown →
    # LARGE, since un-stat-able input is exactly the 100 TB table; eval
    # size is a pushed-scan count probe, paid only after the train side
    # qualifies. ``broadcast_eval`` overrides either way.
    if broadcast_eval is None:
        # collect_gate_bytes, not input_bytes (ADVICE r11): the gate
        # sizes a broadcast (a driver-side materialization), so RLE-
        # heavy columns must be measured decompressed. The threshold
        # default moved 8 MiB -> 20 MiB with it — the measured flip on
        # the documents corpus (5-19 MB compressed) scaled by its
        # ~2.6x footer-uncompressed ratio, keeping the same flip point.
        from duckdb_vss_spark.sources.layout import collect_gate_bytes

        tb = collect_gate_bytes(docs, bound=broadcast_train_bytes)
        broadcast_eval = (tb < 0 or tb >= broadcast_train_bytes) and (
            docs.where(is_eval).limit(broadcast_eval_docs + 1).count()
            <= broadcast_eval_docs
        )
    if broadcast_eval:
        from duckdb_vss_spark.pipeline.dedup import _materialize

        # one eval gram pass, read twice (broadcast keys + the hits
        # join) — without it both branches recompute the eval subtree
        ev = _materialize(ev)
        tr = tr.join(F.broadcast(ev.select("gh").distinct()), "gh")
    hits = ev.join(tr, "gh")
    return hits.groupBy(id_col).agg(
        F.countDistinct("gh").cast("bigint").alias("n_shared_grams"),
        F.countDistinct("train_id").cast("bigint").alias("n_train_docs"),
    )
