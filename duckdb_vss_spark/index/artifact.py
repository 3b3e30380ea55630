"""HNSW index artifact: bulk build, persisted layout, indexed search paths.

The reference's CREATE INDEX is a physical sink operator that buffers
(vector, rowid) pairs and builds one shared thread-safe graph
(src/hnsw/hnsw_index_physical_create.cpp:17-325). The Spark-native
equivalent is a *job*, not an operator (SURVEY §2.1 #1):

    df.select(id, vec).where(vec IS NOT NULL)        # NULL filter, like
                                                     #  hnsw_index_plan.cpp:118-133
      .repartition(P)                                # parallelism = partitions
      .mapInPandas(build_partition_graph)            # share-nothing graphs
    + manifest.json                                  # the "catalog entry"

Layout on disk (any shared filesystem at cluster scale):

    <path>/manifest.json          metric, dims, params, per-partition stats
    <path>/parts/part-NNNNN.pkl   serialized HNSWGraph per partition

Search merges per-partition top-k exactly (union of partition results →
global top-k), so recall is ≥ a single monolithic graph with the same
ef. Persistence is monolithic-per-partition and rebuilt in bulk — the
same contract as the reference (README.md:76 "entire index will be
serialized"), minus online DML: ``rebuild()`` replaces
Insert/Delete/Compact (reference marks merge/constraints NotImplemented
too, hnsw_index.cpp:561-578).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_vss_spark.functions.distance import distance_for_metric
from duckdb_vss_spark.index.manifest import write_manifest
from duckdb_vss_spark.index.hnsw_graph import (
    DEFAULT_EF_CONSTRUCTION,
    DEFAULT_EF_SEARCH,
    DEFAULT_M,
    HNSWGraph,
)
from duckdb_vss_spark.session import check_persistence_enabled, get_ef_search

__all__ = ["create_hnsw_index", "load_index", "drop_index", "HnswIndex", "index_info"]

# executor-process graph cache (file path + mtime → HNSWGraph); in local
# mode this is one process, on a cluster one per executor python worker.
# LRU-bounded: the executor-side knn_join iterates a query partition over
# EVERY graph file, so an unbounded cache would eventually pin all P
# graphs in every python worker — the bound keeps per-worker residency at
# ≤ _GRAPH_CACHE_MAX graphs (≈50 MB each at the 64k-vector ceiling)
# while still amortizing repeat loads across tasks.
_GRAPH_CACHE: dict[tuple[str, float], HNSWGraph] = {}
_GRAPH_CACHE_MAX = 32
# driver-probe candidate lists above this size fetch via a broadcast
# join instead of a literal In-filter (planning + pushdown of a
# many-thousand-literal predicate costs more than the join it saves)
_MAX_ISIN_CANDIDATES = 512

# add_batch parallelism floor (r15, VERDICT r14 #4): never split a
# batch into shards smaller than this many rows — below it, the Spark
# task overhead beats the graph-build parallelism and the extra shards
# just widen the query merge fan-out
_MIN_BATCH_SHARD_ROWS = 2_048


def _shard_stats(params: dict, parts_dir: str, pid: int, keys, vecs) -> dict:
    """Build ONE graph shard file and return its manifest partition row
    (levels_stats JSON-encoded for the mapInPandas schema). Shared by
    add_batch's local and distributed builders and merge_small_shards
    (r16 — one builder, not three copies)."""
    if vecs.shape[1] != params["dims"]:
        raise ValueError(
            f"HNSW index keys must be of type FLOAT[{params['dims']}]"
        )
    g = HNSWGraph(
        params["dims"], params["metric"], params["m"], params["m0"],
        params["ef_construction"], seed=42 + pid,
    ).build(keys, vecs)
    file = os.path.join(parts_dir, f"part-{pid:05d}.pkl")
    with open(file, "wb") as f:
        f.write(g.to_bytes())
    return {
        "pid": pid,
        "file": file,
        "count": len(keys),
        "max_level": g.max_level,
        "memory": g.approx_memory_bytes(),
        "levels_stats": json.dumps(g.level_stats()),
    }


def _build_parts_distributed(
    src: DataFrame,
    id_col: str,
    vec_col: str,
    params: dict,
    parts_dir: str,
    num_partitions: int,
    pid_base: int,
) -> list[dict]:
    """Distributed shard build: one graph per task over a round-robin
    repartition of ``src``, returning manifest partition rows. Executor
    tasks write the shard files directly (shared FS / local mode)."""
    import numpy as np
    import pandas as pd

    def build_part(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        from pyspark import TaskContext

        pid = pid_base + TaskContext.get().partitionId()
        keys_acc, vec_acc = [], []
        for pdf in batches:
            if len(pdf):
                keys_acc.append(pdf[id_col].to_numpy(dtype=np.int64))
                vec_acc.append(
                    np.stack(
                        [np.asarray(v, dtype=np.float32) for v in pdf[vec_col]]
                    )
                )
        if not keys_acc:
            return
        row = _shard_stats(
            params, parts_dir, pid,
            np.concatenate(keys_acc), np.concatenate(vec_acc),
        )
        yield pd.DataFrame({k: [v] for k, v in row.items()})

    stats = src.repartition(num_partitions).mapInPandas(
        build_part,
        schema="pid int, file string, count long, max_level int, memory long, levels_stats string",
    ).collect()
    return [
        {
            "pid": r["pid"],
            "file": r["file"],
            "count": r["count"],
            "max_level": r["max_level"],
            "memory": r["memory"],
            "levels_stats": json.loads(r["levels_stats"]),
        }
        for r in sorted(stats, key=lambda r: r["pid"])
    ]


def _bulk_shard_count(total: int, parallelism: int) -> int:
    """The bulk builder's shard derivation for ``total`` rows (the
    65k ceiling, with small tables split ≤8 ways for build
    parallelism) — create_hnsw_index's own sizing, shared with the
    auto-compact trigger so a compaction always converges TO the
    snapshot shape (r16 inherited-bug fix: the LSM trigger sized
    merges toward ``auto_compact_shards`` instead, which is a fire
    THRESHOLD, not a target — at sf0.1 it packed a 2000-row corpus
    into 1 shard where the bulk build derives 4, failing the
    q_stream_index_add right_sized pin)."""
    by_size = max(1, (int(total) + 65_536 - 1) // 65_536)
    if total > 1_000:
        return max(by_size, min(int(parallelism), 8, int(total) // 500))
    return by_size


def _plan_small_merge(
    parts: list[dict],
    max_rows: int = 65_536,
    min_fill: float = 0.5,
    target_total: int | None = None,
) -> tuple[list[dict], int]:
    """(undersized shards, merged shard count) for an LSM-style partial
    compaction — shards below ``min_fill``·``max_rows`` rows are the
    mergeable tail. The merged count follows the BULK builder's own
    sizing over the tail (65k ceiling, up-to-8-way parallel split for
    small totals): the first cut of this planner packed the tail into
    ceil(total/65k) graphs, and the ×8 A/B showed that builds ONE giant
    graph in one task — slower than the full parallel repack it was
    meant to undercut, with lower merged-graph recall than rebuild's
    own shard shape. ``target_total`` (the auto-compact trigger's shard
    bound) caps the merged count at the bound's remaining allowance;
    preferring MORE shards within the allowance keeps the merge
    parallel and cheap. Empty plan — ([], 0) — when fewer than 2 shards
    are undersized, when the allowance cannot fit the tail, or when the
    merge would not reduce the shard count."""
    small = [p for p in parts if p["count"] < int(max_rows * min_fill)]
    if len(small) < 2:
        return [], 0
    total = sum(p["count"] for p in small)
    by_size = max(1, (total + max_rows - 1) // max_rows)
    # mirror create_hnsw_index's small-table split (build parallelism
    # without shredding into tiny graphs); by_size dominates at scale
    want = (
        max(by_size, min(8, total // 500)) if total > 1_000 else by_size
    )
    if target_total is None:
        # direct call: consolidating IS the request — cap the
        # parallelism floor so the merge always reduces the count
        # (review r16: an uncapped `want` made 2-8 small shards
        # totalling >1000 rows silently no-op)
        n_new = max(by_size, min(want, len(small) - 1))
    else:
        allowance = int(target_total) - (len(parts) - len(small))
        if allowance < by_size:
            return [], 0  # bound unreachable by merging: full repack
        n_new = max(by_size, min(want, allowance))
    if n_new >= len(small):
        return [], 0  # would not reduce the shard count
    return small, n_new


def _load_graph(path: str) -> HNSWGraph:
    key = (path, os.path.getmtime(path))
    g = _GRAPH_CACHE.get(key)
    if g is None:
        for k in [k for k in _GRAPH_CACHE if k[0] == path]:
            del _GRAPH_CACHE[k]
        with open(path, "rb") as f:
            g = HNSWGraph.from_bytes(f.read())
        while len(_GRAPH_CACHE) >= _GRAPH_CACHE_MAX:
            _GRAPH_CACHE.pop(next(iter(_GRAPH_CACHE)))
        _GRAPH_CACHE[key] = g
    else:
        # move-to-end = LRU recency (dicts preserve insertion order)
        del _GRAPH_CACHE[key]
        _GRAPH_CACHE[key] = g
    return g


def _search_query_stream(
    batches: "Iterator[pd.DataFrame]",
    query_vec_col: str,
    query_id_col: str,
    id_col: str,
    files: list[str],
    kk: int,
    ef: int,
    chunk: int,
) -> "Iterator[pd.DataFrame]":
    """Executor-side multi-query ANN search over a stream of Arrow batches.

    Buffers queries ACROSS incoming Arrow batches (VERDICT r6 #4): Arrow
    hands ~10k-row batches, so entering the per-graph-file loop per batch
    would load each graph B times per task — with P partitions > the
    LRU's 32 slots that's B×P cold loads (~100k 50MB reads per task at
    10⁹ vectors). Accumulating up to ``chunk`` queries first makes the
    file loop run ceil(rows/chunk) times per task — for typical
    partitions exactly once, i.e. ≤ P graph loads total (CI-pinned by
    test_index.py's _load_graph call counter). Buffer bound: 65536
    queries × dims × 4B ≈ 16 MB at dims=64.

    Module-level (not a closure) so the CI pin can drive it in-process
    with a monkeypatched ``_load_graph``; on the cluster it runs inside
    the mapInPandas python worker.
    """
    import numpy as np
    import pandas as pd

    buf_ids: list = []
    buf_vecs: list = []
    n_buf = 0

    def flush():
        nonlocal buf_ids, buf_vecs, n_buf
        if not n_buf:
            return None
        ids_c = np.concatenate(buf_ids)
        mat_c = np.vstack(buf_vecs)
        buf_ids, buf_vecs, n_buf = [], [], 0
        out_q: list = []
        out_i: list = []
        for file in files:
            g = _load_graph(file)
            keys_per_q, _ = g.search_batch(mat_c, kk, ef)
            for qi, keys in zip(ids_c, keys_per_q):
                out_q.extend([qi] * len(keys))
                out_i.extend(keys.tolist())
        return pd.DataFrame(
            {
                query_id_col: np.asarray(out_q, dtype=np.int64),
                id_col: np.asarray(out_i, dtype=np.int64),
            }
        )

    for pdf in batches:
        vecs = pdf[query_vec_col]
        mask = vecs.notna().to_numpy()
        if not mask.any():
            continue
        qids = pdf[query_id_col].to_numpy()[mask]
        mat = np.stack([np.asarray(v, dtype=np.float32) for v in vecs[mask]])
        lo = 0
        while lo < len(qids):
            take = min(chunk - n_buf, len(qids) - lo)
            buf_ids.append(qids[lo : lo + take])
            buf_vecs.append(mat[lo : lo + take])
            n_buf += take
            lo += take
            if n_buf >= chunk:
                out = flush()
                if out is not None:
                    yield out
    tail = flush()
    if tail is not None:
        yield tail


def _validate_options(metric: str, ef_construction: int, ef_search: int, m: int, m0: int) -> None:
    """Mirror the reference binder's option validation + error messages
    (src/hnsw/hnsw_index_plan.cpp:33-80; test hnsw_options.test)."""
    if metric not in ("l2sq", "cosine", "ip"):
        raise ValueError("HNSW index 'metric' must be one of: 'cosine', 'ip', 'l2sq'")
    for name, val, lo in (
        ("ef_construction", ef_construction, 1),
        ("ef_search", ef_search, 1),
        ("M", m, 2),
        ("M0", m0, 2),
    ):
        if not isinstance(val, int):
            raise ValueError(f"HNSW index '{name}' must be an integer")
        if val < lo:
            raise ValueError(f"HNSW index '{name}' must be at least {lo}")


class HnswIndex:
    """Handle over a built index artifact."""

    def __init__(self, spark: SparkSession, path: str, manifest: dict):
        self.spark = spark
        self.path = path
        self.manifest = manifest

    # convenience accessors
    @property
    def metric(self) -> str:
        return self.manifest["metric"]

    @property
    def dims(self) -> int:
        return self.manifest["dimensions"]

    @property
    def count(self) -> int:
        """LIVE rows (indexed minus tombstoned) — the reference's
        post-delete count semantics (hnsw_insert.test / usearch
        size()); ``manifest["count"]`` stays the raw indexed total."""
        return int(self.manifest["count"]) - int(self.manifest.get("deleted_count", 0))

    def _tombstones_df(self) -> DataFrame | None:
        """(id) rows marked deleted, or None when there are none."""
        name = self.manifest.get("tombstones_dir")
        if not name or not int(self.manifest.get("deleted_count", 0)):
            return None
        return self.spark.read.parquet(os.path.join(self.path, name))

    def _tombstone_ids(self) -> "frozenset[int]":
        """Driver-side set for the in-task merges — bounded by the
        maintenance contract (tombstones accumulate only between
        compactions; a huge delete set is the signal to compact)."""
        t = self._tombstones_df()
        if t is None:
            return frozenset()
        id_col = self.manifest["id_col"]
        return frozenset(int(r[0]) for r in t.select(id_col).collect())

    def _parts_df(self, files: list[str] | None = None) -> DataFrame:
        if files is None:
            files = [p["file"] for p in self.manifest["partitions"]]
        return self.spark.createDataFrame([(f,) for f in files], "file string").repartition(
            len(files)
        )

    def _driver_probe_ids(self, q, take: int, ef: int) -> list[int] | None:
        """Candidate ids from a DRIVER-side shard probe, or None when
        the artifact is too big (or unreadable from here) and the
        distributed probe must run. Gate: estimated in-memory graph
        bytes (count · dims · 4 B vectors, ×4 margin for links/levels)
        under ``spark.vss.driver_probe_max_bytes`` (default 256 MB —
        the same cost class as a large broadcast; a 100 TB-scale
        artifact fails the gate and keeps the executor-side probe).
        Graphs land in the same mtime-keyed LRU the executors use, so
        repeated queries pay file reads once."""
        import numpy as np

        try:
            budget = int(
                self.spark.conf.get(
                    "spark.vss.driver_probe_max_bytes", str(256 << 20)
                )
            )
        except Exception:  # noqa: BLE001 — conf surface moved
            budget = 256 << 20
        est = int(self.manifest.get("count", 0)) * int(self.dims) * 4 * 4
        if budget <= 0 or est <= 0 or est > budget:
            return None
        # heavy over-fetch (tombstone-laden artifacts widen take by the
        # dead count): per-shard search cost scales with ef≥take, and a
        # sequential driver loop loses to parallel executor probes well
        # before the In-filter bound is reached — keep those distributed
        if int(take) * max(1, len(self.manifest.get("partitions", []))) > (
            _MAX_ISIN_CANDIDATES
        ):
            return None
        try:
            qv = np.asarray(q, dtype=np.float32)
            out: list[int] = []
            for p in self.manifest["partitions"]:
                g = _load_graph(p["file"])
                keys, _ = g.search(qv, take, max(ef, take))
                out.extend(int(x) for x in keys)
            return out
        except Exception:  # noqa: BLE001 — remote FS/corrupt: distributed path
            return None

    def _tombstone_ids_local_meta(self) -> "frozenset[int] | None":
        """Tombstoned ids read driver-side from the artifact's parquet
        (no Spark job), or None when unreadable (caller then keeps the
        broadcast anti-join). Empty set when there are none."""
        name = self.manifest.get("tombstones_dir")
        if not name or not int(self.manifest.get("deleted_count", 0)):
            return frozenset()
        try:
            import pyarrow.parquet as _pq

            id_col = self.manifest["id_col"]
            d = os.path.join(self.path, name)
            ids: set[int] = set()
            for fn in os.listdir(d):
                if not fn.endswith(".parquet"):
                    continue
                col = _pq.read_table(
                    os.path.join(d, fn), columns=[id_col]
                ).column(0)
                ids.update(int(x) for x in col.to_pylist())
            return frozenset(ids)
        except Exception:  # noqa: BLE001 — remote FS: let Spark read it
            return None

    # -- entry point B: single-query top-k scan ---------------------------

    def knn_search(
        self,
        df: DataFrame,
        query_vec,
        k: int,
        id_col: str | None = None,
        ef_search: int | None = None,
        dist_col: str = "dist",
        post_filter=None,
        prefilter_overfetch: float | None = None,
    ) -> DataFrame:
        """ANN top-k: per-partition graph search → exact global merge →
        late-materialized fetch of payload rows by id (the reference's
        rowid fetch, hnsw_index_scan.cpp:72-89). The SQL-visible distance
        is recomputed from the base vectors (reference recomputes in the
        surviving projection, SURVEY §3-B step 4).

        ``post_filter`` (a Column or SQL-string predicate) reproduces the
        reference's WHERE + index-scan semantics: pushed-down filters are
        PULLED UP above the index scan (hnsw_optimize_scan.cpp:161-191),
        so the scan selects k nearest FIRST and the predicate filters the
        k rows after — the result may have fewer than k rows. That is the
        documented trade the reference makes to keep the index usable
        under a WHERE.

        ``prefilter_overfetch=c`` (r12, VERDICT r11 #4) opts into
        Spark-native WHERE semantics instead: each shard searches
        ``max(ceil(c·k), k+8)`` candidates, the predicate filters the
        merged candidate pool, and the k nearest SURVIVORS come back —
        a WHERE + top-k returns k rows whenever the over-fetched pool
        holds k matches. Still approximate for highly-selective
        predicates (a filter keeping one row in a million needs a
        proportionally larger c); the reference's post-filter default
        stays the default because it is the documented contract."""
        import math

        import numpy as np
        import pandas as pd

        id_col = id_col or self.manifest["id_col"]
        vec_col = self.manifest["vec_col"]
        ef = get_ef_search(self.spark, ef_search)
        q = [float(x) for x in query_vec]
        if len(q) != self.dims:
            raise ValueError(f"HNSW index keys must be of type FLOAT[{self.dims}]")
        kk = int(k)
        if prefilter_overfetch is not None:
            if post_filter is None:
                raise ValueError("prefilter_overfetch requires post_filter")
            if float(prefilter_overfetch) < 1.0:
                raise ValueError("prefilter_overfetch must be >= 1.0")
            take = max(int(math.ceil(float(prefilter_overfetch) * kk)), kk + 8)
        else:
            take = kk
        # mark-deletes (r13): over-fetch by the tombstone count so the
        # post-filter anti-join still leaves k live candidates
        dead = int(self.manifest.get("deleted_count", 0))
        take += dead

        # r16 (guide §1): the graph probe is microseconds of sequential
        # work (ef·log n hops per shard) — scheduling a distributed
        # python stage + a broadcast build for it cost ~280 ms/query
        # against 4 ms of actual search (measured, 1-shard sf0.1). The
        # reference always probes in-process (hnsw_index_scan.cpp); we
        # do the same whenever the ARTIFACT is gate-small (driver LRU
        # holds the graphs, same cost class as holding a broadcast),
        # and keep the distributed probe as the scale path. Only the
        # candidate GENERATION moves — the payload fetch, distance
        # recompute and top-k merge stay in Spark either way.
        cand_ids = self._driver_probe_ids(q, take, ef)
        dead = self._tombstone_ids_local_meta() if cand_ids is not None else None
        live = (
            [int(x) for x in cand_ids if x not in dead]
            if cand_ids is not None and dead is not None
            else None
        )
        if (
            live is not None
            and len(live) <= _MAX_ISIN_CANDIDATES
            and len(set(live)) == len(live)
        ):
            # fully driver-resolved candidates: the fetch becomes ONE
            # literal In-filter pushed into the base scan (PushedFilters
            # row-group pruning at scale, guide §6) — no candidate
            # stage, no broadcast build, one Spark job total. Only when
            # the ids are UNIQUE: a re-added id legitimately holds two
            # index copies (reference re-insert-after-delete appends),
            # and that multiplicity must reach the result — the join
            # path below preserves it, an In-filter would collapse it.
            # And only when the list is SMALL: a tombstone-heavy
            # artifact over-fetches take+dead candidates per shard, and
            # a many-thousand-literal In predicate costs more to plan
            # and push than the broadcast join it replaces (measured:
            # the ×8 tombstoned search regressed 0.9 s → 8.8 s on a
            # 12,880-literal filter before this bound)
            matched = df.where(F.col(id_col).isin(live))
        else:
            if live is not None:
                cand_ids = live  # probe + local tombstones, dup ids
            if cand_ids is not None:
                # probe ran locally but tombstones are unreadable from
                # here: literal candidates + the Spark-side anti-join
                cand = self.spark.createDataFrame(
                    [(int(x),) for x in cand_ids], f"{id_col} long"
                )
            else:

                def search_part(
                    batches: Iterator[pd.DataFrame],
                ) -> Iterator[pd.DataFrame]:
                    qv = np.asarray(q, dtype=np.float32)
                    for pdf in batches:
                        for file in pdf["file"]:
                            g = _load_graph(file)
                            keys, _ = g.search(qv, take, max(ef, take))
                            yield pd.DataFrame({id_col: keys})

                cand = self._parts_df().mapInPandas(
                    search_part, schema=f"{id_col} long"
                )
            # live is not None ⇒ tombstones were already subtracted
            # driver-side; only the fully-Spark routes anti-join here
            tomb = self._tombstones_df() if live is None else None
            if tomb is not None:
                cand = cand.join(
                    F.broadcast(
                        tomb.select(F.col(self.manifest["id_col"]).alias(id_col))
                    ),
                    id_col,
                    "left_anti",
                )
            # candidate ids are take·P rows — tiny; broadcast-join back
            matched = df.join(F.broadcast(cand), on=id_col, how="inner")
        dist_fn = distance_for_metric(self.metric)
        scored = matched.withColumn(dist_col, dist_fn(F.col(vec_col), q))
        cond = None
        if post_filter is not None:
            cond = F.expr(post_filter) if isinstance(post_filter, str) else post_filter
        if prefilter_overfetch is not None:
            # Spark-native mode: filter the over-fetched pool FIRST,
            # then keep the k nearest survivors
            return (
                scored.where(cond)
                .orderBy(F.col(dist_col).asc_nulls_last(), F.col(id_col))
                .limit(kk)
            )
        out = scored.orderBy(F.col(dist_col).asc_nulls_last(), F.col(id_col)).limit(kk)
        if cond is not None:
            out = out.where(cond)
        return out

    def knn_search_mmr(
        self,
        df: DataFrame,
        query_vec,
        k: int,
        fetch_k: int | None = None,
        lam: float = 0.5,
        id_col: str | None = None,
        ef_search: int | None = None,
        dist_col: str = "dist",
        rank_col: str = "mmr_rank",
    ) -> DataFrame:
        """Diversified ANN search — the vector-store ``search_type=
        "mmr"`` mode: fetch a ``fetch_k`` shortlist through the graph
        (default 4·k), then greedily re-select ``k`` by Maximal
        Marginal Relevance (operators/mmr.py: λ·relevance −
        (1−λ)·redundancy-to-selected, λ=1 ≡ plain knn order). Returns
        (id, dist, rank_col) — the quadratic term is over the
        SHORTLIST only, the graph did the sublinear work."""
        from duckdb_vss_spark.operators.mmr import mmr_rerank

        id_col = id_col or self.manifest["id_col"]
        vec_col = self.manifest["vec_col"]
        fetch = max(int(fetch_k) if fetch_k else 4 * int(k), int(k))
        shortlist = self.knn_search(
            df, query_vec, fetch, id_col=id_col, ef_search=ef_search,
            dist_col=dist_col,
        ).withColumn("_mmr_qid", F.lit(0).cast("long"))
        mmr_metric = {"l2sq": "l2", "cosine": "cosine", "ip": "ip"}[self.metric]
        return mmr_rerank(
            shortlist, "_mmr_qid", id_col, vec_col, int(k),
            lam=lam, metric=mmr_metric, dist_col=dist_col, rank_col=rank_col,
        ).drop("_mmr_qid")

    # -- entry point C: batched multi-query top-k join --------------------

    def knn_join(
        self,
        queries: DataFrame,
        items: DataFrame,
        query_vec_col: str,
        k: int,
        query_id_col: str,
        ef_search: int | None = None,
        dist_col: str = "dist",
        rn_col: str = "rn",
        queries_per_batch: int = 65536,
        keep_null_queries: bool = False,
    ) -> DataFrame:
        """ANN lateral join, executor-side (VERDICT r5 #1): map over the
        *queries* DataFrame — each task loads the artifact's partition
        graphs straight from the shared filesystem (amortized per python
        worker by the LRU ``_GRAPH_CACHE``) and searches every graph for
        its slice of queries (ExecuteMultiScan shape, hnsw_index.cpp:
        353-367). Candidates (P·k ids per query) then window-merge and
        late-materialize payloads. Emits 1-indexed ``rn`` like the
        reference join operator (hnsw_optimize_join.cpp:148).

        No driver relay: earlier rounds streamed the query set through
        the driver (``toLocalIterator`` + per-chunk broadcast/union),
        which made the driver the pipe every vector flows through and
        grew the plan by one broadcast+union per 65k queries. Here the
        query set flows executor-to-executor like any DataFrame — the
        plan is a single mapInPandas stage regardless of query count,
        and query-side parallelism is the queries' own partitioning.
        ``queries_per_batch`` now only bounds the per-task search-buffer
        granularity (an Arrow batch is sub-chunked to at most this many
        queries before graph search).

        ``keep_null_queries=True`` reproduces the reference's NULL-outer
        semantics (hnsw_lateral_join.test:46-67): a NULL query vector
        still gets k matches — every distance is NULL (NULLS LAST), so
        the first k items by id win, with ``dist_col`` NULL."""
        import numpy as np
        import pandas as pd

        id_col = self.manifest["id_col"]
        vec_col = self.manifest["vec_col"]
        files = [p["file"] for p in self.manifest["partitions"]]
        ef = get_ef_search(self.spark, ef_search)
        kk = int(k)
        # mark-deletes (r13): fetch kk+dead per graph, filter below
        fetch = kk + int(self.manifest.get("deleted_count", 0))
        chunk = max(1, int(queries_per_batch))

        def search_queries(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            # thin picklable shim over the module-level buffered stream
            # (see _search_query_stream for the batching rationale)
            return _search_query_stream(
                batches, query_vec_col, query_id_col, id_col, files, fetch, ef, chunk
            )

        cand = (
            queries.select(query_id_col, query_vec_col)
            .where(F.col(query_vec_col).isNotNull())
            .mapInPandas(search_queries, schema=f"{query_id_col} long, {id_col} long")
        )
        tomb = self._tombstones_df()
        if tomb is not None:
            cand = cand.join(F.broadcast(tomb.select(id_col)), id_col, "left_anti")
        dist_fn = distance_for_metric(self.metric)
        qv_by_id = queries.select(query_id_col, query_vec_col)
        # no forced broadcast of the query vectors: Catalyst/AQE picks
        # broadcast when the side is actually small; at 10⁸ queries the
        # hint itself would be the OOM
        scored = (
            cand.join(items, on=id_col, how="inner")
            .join(qv_by_id, on=query_id_col, how="inner")
            .withColumn(dist_col, dist_fn(F.col(query_vec_col), F.col(vec_col)))
        )
        w = Window.partitionBy(query_id_col).orderBy(
            F.col(dist_col).asc_nulls_last(), F.col(id_col)
        )
        out = (
            scored.withColumn(rn_col, F.row_number().over(w))
            .where(F.col(rn_col) <= kk)
            .drop(query_vec_col)
        )
        if keep_null_queries:
            null_q = queries.where(F.col(query_vec_col).isNull()).select(query_id_col)
            first_k = items.orderBy(F.col(id_col)).limit(kk)
            wn = Window.partitionBy(query_id_col).orderBy(F.col(id_col))
            null_part = (
                null_q.crossJoin(F.broadcast(first_k))
                .withColumn(dist_col, F.lit(None).cast("double"))
                .withColumn(rn_col, F.row_number().over(wn))
            )
            out = out.unionByName(null_part.select(*out.columns))
        return out

    def knn_transform(
        self,
        queries: DataFrame,
        items: DataFrame,
        query_vec_col: str,
        k: int,
        query_id_col: str,
        ef_search: int | None = None,
        dist_col: str = "dist",
        rn_col: str = "rn",
    ) -> DataFrame:
        """Stateless ANN serve: like ``knn_join`` but with the global
        top-k merge done INSIDE the mapInPandas task (each task already
        searches every partition graph, so the cross-graph merge needs
        no shuffle). One deliberate semantic difference from
        ``knn_join``: NULL query vectors are DROPPED here, whereas
        ``knn_join(keep_null_queries=True)`` can reproduce the
        reference's NULL-outer rows (k matches with NULL dist) — an
        append stream has no use for constant NULL-dist padding rows.
        The pipeline is mapInPandas →
        stream-static payload join → projection, with NO window and NO
        stateful operator.  That makes it legal in a Structured
        Streaming APPEND query: a stream of query vectors is served
        against the static index artifact continuously — the online
        ANN-serving story that, with ``rebuild`` and
        ``streaming_index_refresh``, replaces the reference's live
        Insert/Delete DML (§2.1 #13).

        Ranks come from the graph metric (rank-equivalent to the SQL
        convention — l2sq vs l2 — as in ``knn_search``; ties break by
        item id). The SQL-visible ``dist_col`` is recomputed from the
        base vectors with the fold-order-exact Column distance, so
        values hash-match the brute-force oracle when ef ≫ k. The query
        vector rides through the task output (k duplicated rows per
        query) precisely so the recompute needs no second join against
        the query side — a stream cannot be joined to itself
        statelessly."""
        import numpy as np
        import pandas as pd

        id_col = self.manifest["id_col"]
        vec_col = self.manifest["vec_col"]
        files = [p["file"] for p in self.manifest["partitions"]]
        ef = get_ef_search(self.spark, ef_search)
        kk = int(k)
        # mark-deletes (r13): the merge happens IN-TASK, so the
        # tombstones ride into the workers — as a BROADCAST variable
        # (r14, VERDICT r13 #3: one ship per executor, not per task);
        # each graph over-fetches by the tombstone count
        from duckdb_vss_spark.index import tombstones as _tomb

        dead_bc = _tomb.dead_id_broadcast(self)
        fetch = kk + int(self.manifest.get("deleted_count", 0))

        def serve(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            # HNSW never writes versioned kills, so the payload
            # resolves file-independently
            dead_arr = _tomb.applicable_dead(_tomb.unwrap_dead(dead_bc))
            for pdf in batches:
                vecs = pdf[query_vec_col]
                mask = vecs.notna().to_numpy()
                if not mask.any():
                    continue
                qids = pdf[query_id_col].to_numpy()[mask]
                qlists = list(vecs[mask])
                mat = np.stack([np.asarray(v, dtype=np.float32) for v in qlists])
                nq = len(qids)
                keys_acc: list[list] = [[] for _ in range(nq)]
                dist_acc: list[list] = [[] for _ in range(nq)]
                for file in files:
                    g = _load_graph(file)
                    keys_per_q, dists_per_q = g.search_batch(mat, fetch, max(ef, fetch))
                    for i in range(nq):
                        keys_acc[i].append(keys_per_q[i])
                        dist_acc[i].append(dists_per_q[i])
                out_q: list = []
                out_i: list = []
                out_rn: list = []
                out_v: list = []
                for i in range(nq):
                    ks = np.concatenate(keys_acc[i])
                    ds = np.concatenate(dist_acc[i])
                    if dead_arr is not None:
                        live = ~np.isin(ks, dead_arr)
                        ks, ds = ks[live], ds[live]
                    top = np.lexsort((ks, ds))[:kk]
                    sel = ks[top]
                    out_q.extend([qids[i]] * len(sel))
                    out_i.extend(sel.tolist())
                    out_rn.extend(range(1, len(sel) + 1))
                    out_v.extend([qlists[i]] * len(sel))
                yield pd.DataFrame(
                    {
                        query_id_col: np.asarray(out_q, dtype=np.int64),
                        id_col: np.asarray(out_i, dtype=np.int64),
                        rn_col: np.asarray(out_rn, dtype=np.int32),
                        "__qvec": out_v,
                    }
                )

        cand = (
            queries.select(query_id_col, query_vec_col)
            .where(F.col(query_vec_col).isNotNull())
            .mapInPandas(
                serve,
                schema=(
                    f"{query_id_col} long, {id_col} long, {rn_col} int, "
                    "__qvec array<float>"
                ),
            )
        )
        dist_fn = distance_for_metric(self.metric)
        return (
            cand.join(items, on=id_col, how="inner")
            .withColumn(dist_col, dist_fn(F.col("__qvec"), F.col(vec_col)))
            .drop("__qvec")
        )

    # -- maintenance ------------------------------------------------------

    def add_batch(
        self,
        df: DataFrame,
        num_partitions: int | None = None,
        driver_build_max_bytes: int = 4 << 20,
        manifest_extra: dict | None = None,
        auto_compact_shards: int | None = None,
    ) -> "HnswIndex":
        """Offline incremental maintenance (VERDICT r11 #3): build
        per-partition graphs over the NEW batch only and merge them into
        this artifact as additional shards + an atomic manifest update —
        the offline analogue of the reference's Insert/Append path
        (src/hnsw/hnsw_index.cpp:391-449). O(|batch|) build work instead
        of a full rebuild; search fans out across old + new shards
        unchanged (the per-query global merge is already exact across
        shards). ``info().count`` grows by the batch's row count — the
        reference's post-insert count semantics
        (test/sql/hnsw/hnsw_insert.test:18-67).

        Contract edges, both inherited from the reference:
        - appended ids are NOT deduplicated against existing shards (the
          reference's Insert appends too); pair with
          ``pipeline.corpus_diff`` upstream so only genuinely-new docs
          arrive here;
        - deletes still go through ``rebuild()``/``compact()``.

        Many small adds accumulate shards, and every shard adds k
        candidates per query to the merge — ``compact(df)`` /
        ``compact_from_shards()`` re-pack into right-sized graphs (the
        reference's compaction-after-inserts contract).
        ``auto_compact_shards=N`` (r13, VERDICT r12 #4) makes that a
        TRIGGER inside the maintenance path: when the merged manifest
        exceeds N shards AND holds more shards than the snapshot-sized
        shard count (so a genuinely large corpus is never compacted
        into shards it would immediately need again), the artifact
        repacks itself from its own stored vectors — no source needed.
        At 100 TB this is the path that makes daily ingestion O(new
        data): batch shards build partition-parallel with the same
        64k-vector ceiling as the bulk build, and search cost stays
        O(right-sized shards) instead of O(epochs)."""
        import numpy as np
        import pandas as pd

        man = self.manifest
        id_col, vec_col = man["id_col"], man["vec_col"]
        params = dict(
            metric=man["metric"],
            m=man["params"]["m"],
            m0=man["params"]["m0"],
            ef_construction=man["params"]["ef_construction"],
            dims=man["dimensions"],
        )
        parts_dir = os.path.join(self.path, "parts")
        pid_base = 1 + max((p["pid"] for p in man["partitions"]), default=-1)

        src = df.select(
            F.col(id_col).cast("long").alias(id_col), F.col(vec_col).alias(vec_col)
        ).where(F.col(vec_col).isNotNull())

        from duckdb_vss_spark.sources.layout import collect_gate_bytes

        est = collect_gate_bytes(src, bound=driver_build_max_bytes)
        local_rows = None
        total = None
        if 0 <= est <= driver_build_max_bytes:
            local_rows = src.collect()
            total = len(local_rows)
        elif num_partitions is None:
            total = src.count()
        if num_partitions is None:
            # shard sizing (r15, VERDICT r14 #4): the build ceiling
            # (65k rows/shard) sets the minimum shard count, and a
            # parallelism FLOOR keeps a mid-size batch from building
            # one giant graph in a single task (the profiled ×8 seam:
            # a corpus-sized 8k-row add serialized 10.9s on one core).
            # The floor never cuts shards below _MIN_BATCH_SHARD_ROWS
            # each, so small adds still produce ONE shard (each extra
            # shard widens every future query's merge fan-out until
            # auto-compact repacks).
            ceil_shards = max(1, ((total or 0) + 65_536 - 1) // 65_536)
            floor_shards = max(
                1,
                min(
                    self.spark.sparkContext.defaultParallelism,
                    (total or 0) // _MIN_BATCH_SHARD_ROWS,
                ),
            )
            num_partitions = max(ceil_shards, floor_shards)
        if local_rows is not None and num_partitions > 1:
            # mid-size batch under the collect gate but above the
            # parallelism floor: a serial driver loop over
            # num_partitions graphs loses to the distributed builder.
            # Hand the COLLECTED rows back to Spark (no plan
            # re-execution — the snapshot is what the table received)
            src = self.spark.createDataFrame(local_rows, src.schema)
            local_rows = None

        if local_rows is not None:
            stats = []
            if total:
                keys_all = np.fromiter(
                    (r[0] for r in local_rows), dtype=np.int64, count=total
                )
                vecs_all = np.stack(
                    [np.asarray(r[1], dtype=np.float32) for r in local_rows]
                )
                for i in range(num_partitions):
                    sel = np.arange(i, total, num_partitions)
                    if sel.size:
                        stats.append(
                            _shard_stats(
                                params, parts_dir, pid_base + i,
                                keys_all[sel], vecs_all[sel],
                            )
                        )
            new_parts = [
                {**r, "levels_stats": json.loads(r["levels_stats"])}
                for r in sorted(stats, key=lambda r: r["pid"])
            ]
        else:
            new_parts = _build_parts_distributed(
                src, id_col, vec_col, params, parts_dir, num_partitions, pid_base
            )
        merged = dict(man)
        merged["partitions"] = list(man["partitions"]) + new_parts
        merged["count"] = int(man["count"] + sum(p["count"] for p in new_parts))
        merged["capacity"] = int(
            man["capacity"] + sum(p["count"] for p in new_parts)
        )
        merged["approx_memory_usage"] = int(
            man["approx_memory_usage"] + sum(p["memory"] for p in new_parts)
        )
        merged["num_partitions"] = len(merged["partitions"])
        merged["updated_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        old_tomb_dir = None
        if int(man.get("deleted_count", 0)):
            # re-adding a tombstoned id REVIVES it (delete_batch doc):
            # drop the batch's ids from the tombstone set in the same
            # atomic manifest commit as the shard merge
            import uuid as _uuid

            remaining = self._tombstones_df().select(id_col).join(
                src.select(id_col).distinct(), id_col, "left_anti"
            )
            tname = f"tombstones-{_uuid.uuid4().hex[:12]}"
            remaining.write.parquet(os.path.join(self.path, tname))
            n_dead = self.spark.read.parquet(os.path.join(self.path, tname)).count()
            old_tomb_dir = man.get("tombstones_dir")
            merged["tombstones_dir"] = tname
            merged["deleted_count"] = int(n_dead)
        if manifest_extra:
            # riding the SAME atomic write lets callers make the merge
            # transactional with their own bookkeeping (e.g. the
            # streaming epoch stamp that makes replays exactly-once)
            merged.update(manifest_extra)
        write_manifest(self.path, merged, indent=1)
        self.manifest = merged
        if old_tomb_dir and old_tomb_dir != merged.get("tombstones_dir"):
            shutil.rmtree(os.path.join(self.path, old_tomb_dir), ignore_errors=True)
        if auto_compact_shards is not None:
            right_sized = max(1, (merged["count"] + 65_536 - 1) // 65_536)
            if (
                len(merged["partitions"]) > int(auto_compact_shards)
                and len(merged["partitions"]) > right_sized
            ):
                # LSM-style tier first (r16, VERDICT r15 #6): when
                # merging just the undersized tail lands EXACTLY on the
                # snapshot shape this corpus would bulk-build to,
                # compaction costs O(tail) instead of the full
                # O(corpus) repack — the ×64 profile showed the repack
                # costing as much as the build itself. Predict the
                # post-merge count UP FRONT so a merge that couldn't
                # reach the snapshot shape (mostly full shards, or a
                # small corpus the bulk build would split WIDER for
                # parallelism — a merge can only reduce) never runs as
                # wasted work before the fall-back repack; the
                # contract pinned by q_stream_index_add is that
                # auto-compaction converges to compact_from_shards's
                # own sizing, whichever tier ran. The full repack also
                # remains the path when tombstone mass makes the
                # O(corpus) reclaim worth paying anyway.
                bulk = _bulk_shard_count(
                    merged["count"],
                    int(self.spark.conf.get("spark.sql.shuffle.partitions")),
                )
                small, n_new = _plan_small_merge(
                    merged["partitions"], target_total=bulk
                )
                post = len(merged["partitions"]) - len(small) + n_new
                # manifest["count"] is the raw indexed total (dead rows
                # included — see the count property), so the fraction
                # is deleted/raw
                dead_frac = merged.get("deleted_count", 0) / max(
                    1, merged["count"]
                )
                if small and post == bulk and dead_frac < 0.2:
                    # manifest_extra already committed on `merged`
                    # above; merge_small_shards copies the live
                    # manifest, so every bookkeeping key survives
                    return self.merge_small_shards(target_shards=bulk)
                # preserve bookkeeping the caller just rode on this
                # merge (streaming replay stamps) across the repack —
                # ALWAYS both stamp families (ADVICE r13: an add-stream
                # compaction must not drop a co-resident delete
                # stream's replay stamp, or a replayed delete epoch
                # re-kills an id the add stream revived)
                keys = (
                    "last_epochs",
                    "last_del_epochs",
                    "pending_dml",
                    "last_dml_token",
                ) + (tuple(manifest_extra) if manifest_extra else ())
                return self.compact_from_shards(preserve=keys)
        return self

    def keys_df(self) -> DataFrame:
        """The indexed ids, reconstructed from the shards (executor-side
        like ``vectors_df`` but keys only — skinny rows)."""
        import pandas as pd

        id_col = self.manifest["id_col"]

        def load_keys(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                for file in pdf["file"]:
                    yield pd.DataFrame({id_col: _load_graph(file).keys})

        return self._parts_df().mapInPandas(load_keys, schema=f"{id_col} long")

    def delete_batch(
        self, ids, manifest_extra: dict | None = None
    ) -> "HnswIndex":
        """Offline mark-delete (r13 — the Delete-hook analogue of the
        add_batch family; reference src/hnsw/hnsw_index.cpp:466-482
        marks rows deleted in usearch and compaction reclaims them):
        the ids are tombstoned in the artifact, every search path
        (knn_search / knn_join / knn_transform / the SQL planner route)
        over-fetches by the tombstone count and filters them from the
        candidates, ``count``/``info()`` report live rows, and
        ``compact()``/``compact_from_shards()`` physically drop them.
        Cost: the tombstone write is O(|ids| + |tombstones|), plus one
        keys-only pass over the (worker-LRU-cached) shard graphs for
        the membership check — the same cost class as a single query;
        no shard is rewritten here.

        ``ids``: a DataFrame carrying the index's id column (extra
        columns ignored) or a plain iterable of ints. Ids absent from
        the index are ignored (delete-of-missing is a no-op, matching
        DML DELETE semantics). Re-adding a tombstoned id via
        ``add_batch`` REVIVES it (the tombstone is by id; the
        reference's rowid-level mark behaves the same way after a
        re-insert). Tombstones are maintenance-scale state: searches
        over-fetch and anti-join against them per query, so a large
        accumulated delete set is the signal to compact."""
        import uuid as _uuid

        man = self.manifest
        id_col = man["id_col"]
        if isinstance(ids, DataFrame):
            col = id_col if id_col in ids.columns else ids.columns[0]
            ids_df = ids.select(F.col(col).cast("long").alias(id_col))
        else:
            ids_df = self.spark.createDataFrame(
                [(int(x),) for x in ids], f"{id_col} long"
            )
        ids_df = ids_df.where(F.col(id_col).isNotNull())
        # only mark ids the index actually holds (count semantics).
        # r16 (guide §2.4): the semi join needs NO distinct on either
        # side (set membership), and the one distinct that matters is
        # the union-level dedup — the previous ids.distinct() +
        # keys.distinct() + union.distinct() paid three shuffles for
        # one dedup's worth of semantics
        present = ids_df.join(self.keys_df(), id_col, "left_semi")
        old = self._tombstones_df()
        merged_ids = (
            present if old is None else old.select(id_col).unionByName(present)
        ).distinct()
        name = f"tombstones-{_uuid.uuid4().hex[:12]}"
        merged_ids.write.parquet(os.path.join(self.path, name))
        # exact count from the written footers — saves the read-back
        # count job (guide §1); non-local artifact paths fall back
        from duckdb_vss_spark.sources.layout import parquet_dir_rows

        n_dead = parquet_dir_rows(os.path.join(self.path, name))
        if n_dead < 0:
            n_dead = self.spark.read.parquet(os.path.join(self.path, name)).count()
        merged = dict(man)
        old_dir = merged.get("tombstones_dir")
        merged["tombstones_dir"] = name
        merged["deleted_count"] = int(n_dead)
        if manifest_extra:
            # e.g. streaming replay stamps — ride the SAME atomic commit
            merged.update(manifest_extra)
        merged["updated_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        write_manifest(self.path, merged, indent=1)
        self.manifest = merged
        if old_dir and old_dir != name:
            shutil.rmtree(os.path.join(self.path, old_dir), ignore_errors=True)
        return self

    def rebuild(
        self, df: DataFrame, num_partitions: int | None = None
    ) -> "HnswIndex":
        """Bulk rebuild from the current table snapshot — replaces the
        reference's Insert/Delete/Compact online paths (§2.1 #11, #13).
        Keeps the current shard count unless ``num_partitions`` says
        otherwise (0/None after batch adds would preserve shard
        inflation — compact() passes 0 to re-derive)."""
        m = self.manifest
        return create_hnsw_index(
            self.spark,
            df,
            vec_col=m["vec_col"],
            id_col=m["id_col"],
            path=self.path,
            name=m["index_name"],
            metric=m["metric"],
            dims=m["dimensions"],
            m=m["params"]["m"],
            m0=m["params"]["m0"],
            ef_construction=m["params"]["ef_construction"],
            num_partitions=(
                m["num_partitions"] if num_partitions is None else (num_partitions or None)
            ),
            overwrite=True,
        )

    def compact(self, df: DataFrame) -> "HnswIndex":
        """PRAGMA hnsw_compact_index equivalent (§2.1 #11): the
        reference's compaction re-packs the graph allocator in place;
        immutable Spark artifacts re-compact by bulk rebuild from the
        current snapshot — same post-state contract (a dense graph over
        the live rows). Shard count is RE-DERIVED from the snapshot's
        size, not inherited — after a run of add_batch calls the whole
        point of compacting is shedding the accumulated shard fan-out."""
        return self.rebuild(df, num_partitions=0)

    def vectors_df(self, files: list[str] | None = None) -> DataFrame:
        """Reconstruct the indexed (id, vec) rows FROM THE SHARDS — the
        graphs store their keys and float32 vectors, so compaction does
        not need the original source. Executor-side: one mapInPandas
        over the shard file list, each task streaming one graph's rows;
        nothing corpus-sized touches the driver. ``files`` restricts to
        a shard subset (merge_small_shards reads only the small tail)."""
        import pandas as pd

        id_col, vec_col = self.manifest["id_col"], self.manifest["vec_col"]

        def load_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                for file in pdf["file"]:
                    g = _load_graph(file)
                    yield pd.DataFrame(
                        {id_col: g.keys, vec_col: list(g.vectors)}
                    )

        return self._parts_df(files).mapInPandas(
            load_part, schema=f"{id_col} long, {vec_col} array<float>"
        )

    def merge_small_shards(
        self,
        max_rows: int = 65_536,
        min_fill: float = 0.5,
        target_shards: int | None = None,
    ) -> "HnswIndex":
        """LSM-style partial compaction (r16, VERDICT r15 #6): repack
        ONLY the undersized shards the add_batch/streaming tail
        accumulates — shards below ``min_fill``·``max_rows`` rows —
        into right-sized graphs, leaving full shards untouched.
        Compaction cost then tracks the small-shard TAIL, not the
        corpus: the ×64 profile that motivated it showed add_batch
        itself sub-linear but the full compact_from_shards repack
        O(corpus) per trigger (13.8s compact vs 12.6s build).

        Tombstones are NOT reclaimed here: the mask is id-level and
        unchanged, so dead rows in merged and untouched shards alike
        stay filtered; physical reclaim remains compact() /
        compact_from_shards()'s contract (the auto-compact trigger
        falls back to the full repack when the dead fraction makes the
        O(corpus) pass worth paying). ``count`` and the bookkeeping
        keys are untouched — same rows, different packing. No-op when
        fewer than two shards are undersized. ``target_shards`` (the
        auto-compact trigger passes its bound) caps the merged shard
        count at the bound's remaining allowance — a no-op when the
        bound is unreachable by merging, so the trigger's fall-back
        repack never pays for a wasted merge first."""
        man = self.manifest
        parts = list(man["partitions"])
        small, n_new = _plan_small_merge(
            parts, max_rows, min_fill, target_total=target_shards
        )
        if not small:
            return self
        small_pids = {p["pid"] for p in small}
        keep = [p for p in parts if p["pid"] not in small_pids]
        id_col, vec_col = man["id_col"], man["vec_col"]
        params = dict(
            metric=man["metric"],
            m=man["params"]["m"],
            m0=man["params"]["m0"],
            ef_construction=man["params"]["ef_construction"],
            dims=man["dimensions"],
        )
        parts_dir = os.path.join(self.path, "parts")
        pid_base = 1 + max((p["pid"] for p in parts), default=-1)
        src = self.vectors_df(files=[p["file"] for p in small])
        new_parts = _build_parts_distributed(
            src, id_col, vec_col, params, parts_dir, n_new, pid_base
        )
        merged = dict(man)
        merged["partitions"] = keep + new_parts
        merged["num_partitions"] = len(merged["partitions"])
        merged["approx_memory_usage"] = int(
            sum(p["memory"] for p in merged["partitions"])
        )
        merged["updated_at"] = time.strftime(
            "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
        )
        write_manifest(self.path, merged, indent=1)
        self.manifest = merged
        for p in small:
            try:
                os.remove(p["file"])
            except OSError:
                pass  # best-effort: an orphaned pkl is dead weight, not
                # a correctness hazard (the manifest no longer lists it)
        return self

    def compact_from_shards(
        self,
        preserve: tuple[str, ...] = (
            "last_epochs",
            "last_del_epochs",
            "pending_dml",
            "last_dml_token",
        ),
    ) -> "HnswIndex":
        """Self-contained compaction (r13, VERDICT r12 #4): repack the
        accumulated add_batch/streaming shards into right-sized graphs
        using only the artifact's own stored vectors — no source
        DataFrame needed, so maintenance paths (streaming_index_add's
        auto-compact trigger) can call it without holding the corpus.
        Every shard adds ``k`` candidates to every future query's
        merge, so a long run of small adds degrades search linearly in
        shard count until this runs (the reference's compaction-after-
        inserts contract, hnsw_index_pragmas.cpp:154-190).

        The shard vectors are staged to parquet FIRST (the rebuild
        deletes the artifact dir its own input would otherwise be lazily
        read from), then rebuilt with snapshot-derived shard sizing;
        ``preserve`` carries bookkeeping manifest keys (the streaming
        replay stamps) across the rebuild's fresh manifest."""
        import tempfile

        stage = tempfile.mkdtemp(prefix="vss_compact_stage_")
        try:
            vec_dir = os.path.join(stage, "vecs")
            live = self.vectors_df()
            tomb = self._tombstones_df()
            if tomb is not None:
                # compaction physically drops mark-deleted rows (the
                # reference's delete-reclaim contract); the rebuild's
                # fresh manifest carries no tombstones
                live = live.join(
                    F.broadcast(tomb.select(self.manifest["id_col"])),
                    self.manifest["id_col"],
                    "left_anti",
                )
            live.write.parquet(vec_dir)
            kept = {
                k: self.manifest[k] for k in preserve if k in self.manifest
            }
            out = self.rebuild(self.spark.read.parquet(vec_dir), num_partitions=0)
            if kept:
                out.manifest.update(kept)
                write_manifest(self.path, out.manifest, indent=1)
            self.manifest = out.manifest
            return self
        finally:
            shutil.rmtree(stage, ignore_errors=True)

    def info(self) -> DataFrame:
        """Index metadata DataFrame with the reference's
        pragma_hnsw_index_info() schema (hnsw_index_pragmas.cpp:24-58)."""
        return index_info(self.spark, self.path)


def create_hnsw_index(
    spark: SparkSession,
    df: DataFrame,
    vec_col: str,
    id_col: str,
    path: str,
    name: str = "hnsw_idx",
    metric: str = "l2sq",
    dims: int | None = None,
    m: int = DEFAULT_M,
    m0: int | None = None,
    ef_construction: int = DEFAULT_EF_CONSTRUCTION,
    ef_search: int = DEFAULT_EF_SEARCH,
    num_partitions: int | None = None,
    overwrite: bool = False,
    driver_build_max_bytes: int = 4 << 20,
) -> HnswIndex:
    """CREATE INDEX ... USING HNSW (vec_col) WITH (metric, m, m0,
    ef_construction) — as a bulk Spark job (SURVEY §3-A Spark shape).

    Sources whose file scan is at most ``driver_build_max_bytes``
    (default 4 MiB ≈ 16k 64-d float vectors) build IN-PROCESS on the
    driver instead: one bounded collect, the same partition sizing and
    graph seeds, no scheduler/codegen round-trips — a cluster job over
    half a megabyte of vectors pays ~2 s of fixed cost for ~0.1 s of
    work (measured r10; DuckDB's CREATE INDEX is in-process always).
    Unknown-size sources (non-file, remote FS) and anything larger take
    the distributed path."""
    import numpy as np
    import pandas as pd

    m0 = m0 if m0 is not None else 2 * m
    _validate_options(metric, ef_construction, ef_search, m, m0)
    check_persistence_enabled(spark)

    if os.path.exists(path):
        if not overwrite:
            raise ValueError(f"index path {path!r} already exists (use overwrite=True)")
        shutil.rmtree(path)
    parts_dir = os.path.join(path, "parts")
    os.makedirs(parts_dir)

    src = df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(vec_col).alias(vec_col)
    ).where(F.col(vec_col).isNotNull())

    from duckdb_vss_spark.sources.layout import collect_gate_bytes

    # gate on max(compressed, footer-uncompressed) size: RLE-heavy
    # columns can decompress far past their on-disk bytes (ADVICE r10)
    est = collect_gate_bytes(src, bound=driver_build_max_bytes)
    local_rows = None
    total = None
    if 0 <= est <= driver_build_max_bytes:
        local_rows = src.collect()  # bounded by the gate
        total = len(local_rows)
        if dims is None:
            if total == 0:
                raise ValueError(
                    "cannot infer dimensions from an all-NULL vector column"
                )
            dims = len(local_rows[0][1])
    elif dims is None or num_partitions is None:
        # dims inference and partition sizing share ONE aggregate job
        # (r10; two driver round-trips measured ~0.2 s of a small
        # build's wall)
        probe = src.agg(
            F.count(F.lit(1)).alias("n"), F.first(F.size(vec_col)).alias("d")
        ).first()
        total = int(probe["n"])
        if dims is None:
            if probe["d"] is None:
                raise ValueError(
                    "cannot infer dimensions from an all-NULL vector column"
                )
            dims = int(probe["d"])
    if num_partitions is None:
        # size partitions so each graph builds in bounded time and memory:
        # the chunked bulk build is O(n²·d) BLAS per partition, so the
        # ceiling (64k vectors/graph) keeps a partition's build in the
        # tens of seconds at d≈128 on one executor core-pair. The floor
        # (~16k vectors/graph) keeps graphs MEATY: every extra graph
        # adds search fan-out (candidates per query are P·k) and
        # per-graph load/serialize overhead, while build wall-clock on a
        # real cluster is set by the LARGEST partition, not the count.
        # At 100 TB this yields ~15k graphs per 10⁹ vectors — each an
        # independent task, one wave on 1000 executors.
        # Small tables split at most 8 ways (build parallelism without
        # shredding the index into cluster-parallelism-many tiny graphs:
        # at shuffle.partitions=8000 a //500 floor would make 2000
        # graphs of 500 vectors from 1M rows); larger tables are sized
        # purely by the ceiling.
        num_partitions = _bulk_shard_count(
            total, int(spark.conf.get("spark.sql.shuffle.partitions"))
        )
    params = dict(metric=metric, m=m, m0=m0, ef_construction=ef_construction, dims=dims)

    def _graph_stats(pid: int, keys: "np.ndarray", vecs: "np.ndarray") -> dict:
        """Build one partition's graph (same params/seed on either
        path) and persist it; returns its manifest stats row."""
        if vecs.shape[1] != params["dims"]:
            raise ValueError(f"HNSW index keys must be of type FLOAT[{params['dims']}]")
        g = HNSWGraph(
            params["dims"],
            params["metric"],
            params["m"],
            params["m0"],
            params["ef_construction"],
            seed=42 + pid,
        ).build(keys, vecs)
        file = os.path.join(parts_dir, f"part-{pid:05d}.pkl")
        with open(file, "wb") as f:
            f.write(g.to_bytes())
        return {
            "pid": pid,
            "file": file,
            "count": len(keys),
            "max_level": g.max_level,
            "memory": g.approx_memory_bytes(),
            "levels_stats": json.dumps(g.level_stats()),
        }

    if local_rows is not None:
        # in-process build: round-robin the collected rows over the
        # same partition count (graph membership differs from the
        # distributed hash split — membership is not part of the index
        # contract, every split is a valid HNSW layout)
        stats = []
        if total:
            keys_all = np.fromiter(
                (r[0] for r in local_rows), dtype=np.int64, count=total
            )
            vecs_all = np.stack(
                [np.asarray(r[1], dtype=np.float32) for r in local_rows]
            )
            for pid in range(num_partitions):
                sel = np.arange(pid, total, num_partitions)
                if sel.size:
                    stats.append(_graph_stats(pid, keys_all[sel], vecs_all[sel]))
        return _commit_manifest(
            spark, path, name, vec_col, id_col, metric, dims,
            m, m0, ef_construction, ef_search, num_partitions, stats,
        )

    src = src.repartition(num_partitions)

    def build_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        keys_acc, vec_acc = [], []
        for pdf in batches:
            if len(pdf):
                keys_acc.append(pdf[id_col].to_numpy(dtype=np.int64))
                vec_acc.append(np.stack([np.asarray(v, dtype=np.float32) for v in pdf[vec_col]]))
        if not keys_acc:
            return
        row = _graph_stats(pid, np.concatenate(keys_acc), np.concatenate(vec_acc))
        yield pd.DataFrame({k: [v] for k, v in row.items()})

    stats = src.mapInPandas(
        build_part,
        schema="pid int, file string, count long, max_level int, memory long, levels_stats string",
    ).collect()
    return _commit_manifest(
        spark, path, name, vec_col, id_col, metric, dims,
        m, m0, ef_construction, ef_search, num_partitions, stats,
    )


def _commit_manifest(
    spark: SparkSession,
    path: str,
    name: str,
    vec_col: str,
    id_col: str,
    metric: str,
    dims: int,
    m: int,
    m0: int,
    ef_construction: int,
    ef_search: int,
    num_partitions: int,
    stats,
) -> HnswIndex:
    """Assemble and ATOMICALLY commit the manifest from per-partition
    stats rows (dicts from the driver-local build or Rows from the
    distributed collect); the index "exists" once the file appears."""
    manifest = {
        "index_name": name,
        "table_name": "",
        "vec_col": vec_col,
        "id_col": id_col,
        "metric": metric,
        "dimensions": dims,
        "params": dict(m=m, m0=m0, ef_construction=ef_construction, ef_search=ef_search),
        "num_partitions": num_partitions,
        "count": int(sum(r["count"] for r in stats)),
        "capacity": int(sum(r["count"] for r in stats)),
        "approx_memory_usage": int(sum(r["memory"] for r in stats)),
        "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "partitions": [
            {
                "pid": r["pid"],
                "file": r["file"],
                "count": r["count"],
                "max_level": r["max_level"],
                "memory": r["memory"],
                "levels_stats": json.loads(r["levels_stats"]),
            }
            for r in sorted(stats, key=lambda r: r["pid"])
        ],
    }
    write_manifest(path, manifest, indent=1)
    return HnswIndex(spark, path, manifest)


def load_index(spark: SparkSession, path: str) -> HnswIndex:
    with open(os.path.join(path, "manifest.json")) as f:
        return HnswIndex(spark, path, json.load(f))


def drop_index(path: str) -> None:
    if os.path.exists(os.path.join(path, "manifest.json")):
        shutil.rmtree(path)


_INFO_SCHEMA = (
    "catalog_name string, schema_name string, index_name string, table_name string, "
    "metric string, dimensions long, count long, capacity long, approx_memory_usage long, "
    "levels long, levels_stats array<struct<nodes:long,edges:long,max_edges:long,allocated_bytes:long>>"
)


def index_info(spark: SparkSession, path: str) -> DataFrame:
    """pragma_hnsw_index_info() equivalent (§2.1 #12): one row per index
    with aggregate level stats across partition graphs."""
    with open(os.path.join(path, "manifest.json")) as f:
        man = json.load(f)
    max_level = max((p["max_level"] for p in man["partitions"]), default=-1)
    levels = []
    for lvl in range(max_level + 1):
        agg = {"nodes": 0, "edges": 0, "max_edges": 0, "allocated_bytes": 0}
        for p in man["partitions"]:
            if lvl < len(p["levels_stats"]):
                for key in agg:
                    agg[key] += p["levels_stats"][lvl][key]
        levels.append((agg["nodes"], agg["edges"], agg["max_edges"], agg["allocated_bytes"]))
    row = (
        "spark_catalog",
        "default",
        man["index_name"],
        man["table_name"],
        man["metric"],
        man["dimensions"],
        man["count"] - man.get("deleted_count", 0),  # live rows (r13 deletes)
        man["capacity"],
        man["approx_memory_usage"],
        max_level + 1,
        levels,
    )
    return spark.createDataFrame([row], _INFO_SCHEMA)
