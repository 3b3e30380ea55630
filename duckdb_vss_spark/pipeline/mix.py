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

__all__ = ["mix_by_token_budget", "temperature_budgets", "temperature_mix"]


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


def temperature_budgets(
    df: DataFrame,
    text_col: str,
    group_col: str,
    total_tokens: int,
    alpha: float = 0.5,
    weight_scale: int = 1 << 20,
) -> dict[str, int]:
    """Derive per-source token budgets from a mixture TEMPERATURE:
    budget_s ∝ n_s^alpha — the standard LLM data-mixing rule (GPT-3
    trained on weights ∝ size^alpha with alpha < 1 to upweight small
    high-quality sources; alpha = 1 is proportional sampling).

    Engine-exact by construction, so an oracle can re-derive the
    budgets bit-for-bit: ``alpha`` is restricted to {1.0, 0.5, 0.25},
    whose float evaluation (identity / sqrt / sqrt∘sqrt) is IEEE
    correctly-rounded in every engine; the weight is then quantized to
    an integer, ``floor(n^alpha · 2^20)`` (a power-of-two multiply
    changes only the exponent — exact), and the budget split
    ``total · w_s // Σw`` is pure integer floor-division. No pow()
    ulp-divergence surface anywhere.

    One bounded driver collect: ONE ROW PER SOURCE (a data recipe has
    tens of sources — bounded like the centroid samples in ivf/pq).
    """
    import math

    if alpha not in (1.0, 0.5, 0.25):
        raise ValueError(
            "alpha must be one of 1.0, 0.5, 0.25 (exponents with "
            "IEEE-exact float evaluation; arbitrary pow() is not "
            "reproducible across engines in the last ulp)"
        )
    if total_tokens < 0:
        raise ValueError("total_tokens must be >= 0")
    stats = (
        df.groupBy(group_col)
        .agg(F.sum(token_count(text_col)).cast("bigint").alias("__n"))
        .collect()
    )

    def w(n: int) -> int:
        x = float(n)
        if alpha <= 0.5:
            x = math.sqrt(x)
        if alpha == 0.25:
            x = math.sqrt(x)
        return int(x * weight_scale)  # floor: x*2^k is exact, int() truncates

    ws = {r[group_col]: w(r["__n"]) for r in stats}
    tot_w = sum(ws.values())
    if tot_w == 0:
        return {g: 0 for g in ws}
    return {g: (int(total_tokens) * wv) // tot_w for g, wv in ws.items()}


def temperature_mix(
    df: DataFrame,
    text_col: str,
    id_col: str,
    group_col: str,
    total_tokens: int,
    alpha: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Temperature-weighted corpus mix: derive each source's token
    budget as total·n_s^alpha/Σn^alpha (``temperature_budgets``), then
    select docs per source by the deterministic hash-priority running
    sum (``mix_by_token_budget``). Same guarantees as the budget mix:
    engine-independent, monotone in total_tokens, never overshoots a
    source's derived budget."""
    budgets = temperature_budgets(
        df, text_col, group_col, total_tokens, alpha=alpha
    )
    return mix_by_token_budget(
        df, text_col, id_col, group_col, budgets, default_budget=0, seed=seed
    )
