"""Token-budget data mixing — compose a training corpus by taking a
TARGET NUMBER OF TOKENS from each source, not a fraction of rows. The
mixture spec every LLM data recipe is written in ("300B web tokens,
50B code, 30B books") needs exactly this primitive; fraction-based
sampling (stratified_hash_sample) cannot hit a token target when
doc-length distributions differ across sources.

Selection is greedy by the engine-reproducible hash60 priority: rank a
source's docs by hash, keep docs while the running token total stays
within the source's budget. Properties that matter for corpus
engineering:

- **deterministic & engine-independent** — a pure function of
  (seed, ids, budgets); re-runs and other engines produce the
  byte-identical corpus;
- **monotone in budget** — raising a source's budget only ADDS docs
  (the hash order is a fixed priority), so a recipe re-weight reuses
  everything already selected;
- **never overshoots** — the doc that would cross the budget is
  excluded (strict `cum <= budget`), so token accounting is exact.

Scale shape: one shuffle keyed by source + a running-sum window. The
running sum cannot be map-side-pruned the way a rank<=cap can (the
budget is global per source), so for mega-sources first bound the
population with `source_cap`/`hash_sample` (both map-only) — budget /
min-doc-tokens is a correct cap. Token counts are whitespace tokens
(`token_count`) by default, matching the text-analysis family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from duckdb_vss_spark.pipeline.sample import hash60
from duckdb_vss_spark.pipeline.text import token_count

__all__ = ["mix_by_token_budget"]


def mix_by_token_budget(
    df: DataFrame,
    text_col: str,
    id_col: str,
    group_col: str,
    budgets: dict[str, int],
    default_budget: int = 0,
    seed: int = 42,
) -> DataFrame:
    """Keep rows of each group while the hash-ordered running token
    total stays <= that group's budget. Adds ``n_tok`` (the row's
    token count) and ``cum_tok`` (the running total including the
    row); all original columns are preserved."""
    for g, b in budgets.items():
        if b < 0:
            raise ValueError(f"budget for group {g!r} must be >= 0")
    if default_budget < 0:
        raise ValueError("default_budget must be >= 0")

    bound = F.lit(int(default_budget)).cast("bigint")
    gc = F.col(group_col)
    for g, b in sorted(budgets.items()):
        bound = F.when(gc == g, F.lit(int(b)).cast("bigint")).otherwise(bound)

    h = hash60(id_col, seed)
    w = (
        Window.partitionBy(group_col)
        .orderBy(h.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        df.withColumn("n_tok", token_count(text_col))
        .withColumn("cum_tok", F.sum("n_tok").over(w).cast("bigint"))
        .where(F.col("cum_tok") <= bound)
    )
    return out
