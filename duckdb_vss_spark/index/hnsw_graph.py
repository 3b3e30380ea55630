"""Single-partition HNSW graph: build / search / (de)serialize.

A from-scratch numpy implementation of the public HNSW algorithm
(Malkov & Yashunin, arXiv:1603.09320) — the same algorithm the
reference gets from its vendored usearch library. Parameter names and
defaults follow the reference's surface so `WITH (m, m0,
ef_construction, ef_search, metric)` options behave identically
(reference defaults: M=16, M0=2·M, ef_construction=128, ef_search=64 —
usearch index.hpp:1097-1107; option mapping hnsw_index.cpp:168-187):

- insert level sampling: ``level = floor(-ln(U) / ln(M))``
  (usearch index.hpp:3315-3319 uses the same inverse-log-connectivity);
- search: greedy descent through upper layers, best-first expansion
  with ``ef = max(ef_search, k)`` in the base layer
  (usearch index.hpp:2510-2523).

Graph distances use the *index metric* (l2sq without sqrt — "won't
affect the ordering", index_plugins.hpp:1033-1053); user-visible
distances are recomputed by the SQL-level functions, exactly as the
reference's projection recomputes them (SURVEY §2.3).

This graph is deliberately partition-local: one graph per Spark
partition, built independently inside ``mapInPandas`` — share-nothing,
no locks (the reference needs an rwlock resize protocol for its shared
graph, hnsw_index.cpp:408-448; we avoid shared mutation entirely).
"""

from __future__ import annotations

import heapq
import io
import pickle

import numpy as np

DEFAULT_M = 16
DEFAULT_EF_CONSTRUCTION = 128
DEFAULT_EF_SEARCH = 64

_METRICS = ("l2sq", "cosine", "ip")


def _rank_dist(metric: str, q: np.ndarray, xs: np.ndarray) -> np.ndarray:
    """Index-side (rank-equivalent) distance of query q to rows of xs."""
    if metric == "l2sq":
        d = xs - q
        return np.einsum("ij,ij->i", d, d)
    if metric == "cosine":
        qn = q / (np.linalg.norm(q) or 1.0)
        xn = xs / np.maximum(np.linalg.norm(xs, axis=1, keepdims=True), 1e-30)
        return 1.0 - xn @ qn
    if metric == "ip":
        return -(xs @ q)
    raise ValueError(f"unknown metric {metric!r}")


class HNSWGraph:
    """In-memory HNSW over float32 vectors keyed by int64 row ids."""

    def __init__(
        self,
        dim: int,
        metric: str = "l2sq",
        m: int = DEFAULT_M,
        m0: int | None = None,
        ef_construction: int = DEFAULT_EF_CONSTRUCTION,
        seed: int = 42,
    ):
        if metric not in _METRICS:
            raise ValueError(f"unknown metric {metric!r}")
        self.dim = int(dim)
        self.metric = metric
        self.m = int(m)
        self.m0 = int(m0 if m0 is not None else 2 * m)
        self.ef_construction = int(ef_construction)
        self.seed = seed
        self._inv_log_m = 1.0 / np.log(self.m)
        self.vectors = np.empty((0, dim), dtype=np.float32)
        self.keys = np.empty(0, dtype=np.int64)
        self.levels: list[int] = []
        # neighbors[node][level] -> list[int] of node indices
        self.neighbors: list[list[list[int]]] = []
        self.entry = -1
        self.max_level = -1

    # -- construction -----------------------------------------------------

    # above this node count the O(n²) pairwise matrix stops paying for
    # itself (memory: n²·4B float32); artifact.py caps partitions well
    # below the crossover locally, and big partitions take the
    # incremental path exactly like the reference's per-thread inserts
    BULK_BUILD_MAX = 4096

    def build(self, keys: np.ndarray, vectors: np.ndarray) -> "HNSWGraph":
        vectors = np.ascontiguousarray(vectors, dtype=np.float32)
        keys = np.asarray(keys, dtype=np.int64)
        n = len(keys)
        if vectors.shape != (n, self.dim):
            raise ValueError(
                f"HNSW index keys must be of type FLOAT[{self.dim}] "
                f"(got shape {vectors.shape})"
            )
        rng = np.random.default_rng(self.seed)
        self.vectors = vectors
        self.keys = keys
        new_levels = np.floor(-np.log(rng.random(n)) * self._inv_log_m).astype(int)
        self.levels = new_levels.tolist()
        self.neighbors = [
            [[] for _ in range(lvl + 1)] for lvl in self.levels
        ]
        if 1 < n <= self.BULK_BUILD_MAX:
            self._bulk_build()
        else:
            for i in range(n):
                self._insert(i)
        return self

    def _bulk_build(self) -> None:
        """Bulk construction from the full pairwise-distance matrix.

        The graph is built *once* per partition (Spark artifacts are
        immutable), so unlike the reference's incremental inserts we can
        afford exact candidate lists: per level, each member's top-c
        candidates come from one BLAS pairwise matrix, the paper's
        diversity heuristic picks ≤m of them, and edges are made
        bidirectional with overflow pruning. Search behavior/layout is
        identical to the incremental path; quality is ≥ (candidates are
        exact, not discovered through a partially-built graph)."""
        n = len(self.keys)
        levels_arr = np.asarray(self.levels)
        self.max_level = int(levels_arr.max())
        self.entry = int(levels_arr.argmax())
        for lvl in range(self.max_level + 1):
            members = np.flatnonzero(levels_arr >= lvl)
            if len(members) < 2:
                continue
            m_max = self.m0 if lvl == 0 else self.m
            D = self._pairwise_rank(self.vectors[members].astype(np.float32))
            c = min(len(members) - 1, max(self.ef_construction, m_max))
            # top-(c+1) positions per row (includes self at distance 0)
            part = np.argpartition(D, kth=c, axis=1)[:, : c + 1]
            chosen: list[list[int]] = []
            for rp in range(len(members)):
                cand = [p for p in part[rp] if p != rp]
                cand.sort(key=lambda p: D[rp, p])
                kept: list[int] = []
                pruned: list[int] = []
                for p in cand[:c]:
                    if len(kept) >= m_max:
                        break
                    if not kept or D[rp, p] < D[p, kept].min():
                        kept.append(p)
                    else:
                        pruned.append(p)
                kept.extend(pruned[: m_max - len(kept)])
                chosen.append(kept)
            # bidirectional edges, then per-node overflow prune (the
            # same shape as the incremental path's reverse-edge insert)
            adj: list[set[int]] = [set(ch) for ch in chosen]
            for rp, ch in enumerate(chosen):
                for p in ch:
                    adj[p].add(rp)
            for rp in range(len(members)):
                nb = sorted(adj[rp], key=lambda p: D[rp, p])
                if len(nb) > m_max:
                    kept = []
                    pruned = []
                    for p in nb:
                        if len(kept) >= m_max:
                            break
                        if not kept or D[rp, p] < D[p, kept].min():
                            kept.append(p)
                        else:
                            pruned.append(p)
                    kept.extend(pruned[: m_max - len(kept)])
                    nb = kept
                self.neighbors[int(members[rp])][lvl] = [int(members[p]) for p in nb]

    def _dist_to(self, q: np.ndarray, idxs) -> np.ndarray:
        return _rank_dist(self.metric, q, self.vectors[idxs])

    def _pairwise_rank(self, V: np.ndarray) -> np.ndarray:
        """All-pairs rank distance among rows of V in one BLAS call."""
        if self.metric == "l2sq":
            sq = np.einsum("ij,ij->i", V, V)
            return np.maximum(sq[:, None] + sq[None, :] - 2.0 * (V @ V.T), 0.0)
        if self.metric == "cosine":
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-30)
            return 1.0 - Vn @ Vn.T
        return -(V @ V.T)  # ip

    def _select_neighbors(self, cands: list, m_cap: int) -> list:
        """Diversity heuristic (HNSW paper Alg. 4, as usearch implements):
        keep candidate e only if it is closer to q than to every
        already-kept neighbor; backfill with pruned ones up to ``m_cap``.
        Plain closest-m pruning disconnects clusters of near-duplicates
        (the dropped edge was the only bridge); this keeps bridges. One
        pairwise matrix up front — no per-step numpy calls."""
        if len(cands) <= 1:
            return list(cands)
        P = self._pairwise_rank(self.vectors[[i for _, i in cands]])
        kept: list[int] = []
        pruned: list[int] = []
        for pos, (d_e, e) in enumerate(cands):  # ascending by distance to q
            if len(kept) >= m_cap:
                break
            if not kept or d_e < P[pos, kept].min():
                kept.append(pos)
            else:
                pruned.append(pos)
        order = kept + pruned[: m_cap - len(kept)]
        return [cands[p] for p in order]

    def _insert(self, i: int) -> None:
        level = self.levels[i]
        if self.entry < 0:
            self.entry = i
            self.max_level = level
            return
        q = self.vectors[i]
        ep = self.entry
        ep_d = float(self._dist_to(q, [ep])[0])
        # greedy descent through layers above the node's level
        for lvl in range(self.max_level, level, -1):
            ep, ep_d = self._greedy(q, ep, ep_d, lvl)
        # best-first expansion + connect at each layer the node occupies
        for lvl in range(min(level, self.max_level), -1, -1):
            cands = self._search_layer(q, [(ep_d, ep)], self.ef_construction, lvl)
            m_max = self.m0 if lvl == 0 else self.m
            chosen = self._select_neighbors(cands, m_max)
            self.neighbors[i][lvl] = [idx for _, idx in chosen]
            for d_c, c in chosen:
                nb = self.neighbors[c][lvl]
                nb.append(i)
                if len(nb) > m_max:
                    # prune c's overflowing neighborhood with the same
                    # diversity heuristic (ordered by distance to c)
                    ds = self._dist_to(self.vectors[c], nb)
                    order = np.argsort(ds, kind="stable")
                    sel = self._select_neighbors(
                        [(float(ds[j]), nb[j]) for j in order], m_max
                    )
                    self.neighbors[c][lvl] = [idx for _, idx in sel]
            if cands:
                ep_d, ep = cands[0]
        if level > self.max_level:
            self.entry = i
            self.max_level = level

    def _greedy(self, q, ep, ep_d, lvl):
        while True:
            nbrs = self.neighbors[ep][lvl] if lvl < len(self.neighbors[ep]) else []
            if not nbrs:
                return ep, ep_d
            ds = self._dist_to(q, nbrs)
            j = int(np.argmin(ds))
            if ds[j] < ep_d:
                ep, ep_d = nbrs[j], float(ds[j])
            else:
                return ep, ep_d

    def _search_layer(self, q, entries, ef, lvl):
        """Best-first search; returns [(dist, idx)] sorted ascending, ≤ef."""
        visited = {idx for _, idx in entries}
        cand = [(d, i) for d, i in entries]  # min-heap of frontier
        heapq.heapify(cand)
        best = [(-d, i) for d, i in entries]  # max-heap of ef best
        heapq.heapify(best)
        while cand:
            d, c = heapq.heappop(cand)
            if d > -best[0][0] and len(best) >= ef:
                break
            nbrs = [
                x
                for x in (self.neighbors[c][lvl] if lvl < len(self.neighbors[c]) else [])
                if x not in visited
            ]
            if not nbrs:
                continue
            visited.update(nbrs)
            ds = self._dist_to(q, nbrs)
            bound = -best[0][0]
            for dx, x in zip(ds.tolist(), nbrs):
                if len(best) < ef or dx < bound:
                    heapq.heappush(cand, (dx, x))
                    heapq.heappush(best, (-dx, x))
                    if len(best) > ef:
                        heapq.heappop(best)
                    bound = -best[0][0]
        return sorted((-d, i) for d, i in best)

    # -- search -----------------------------------------------------------

    def search(self, q: np.ndarray, k: int, ef_search: int = DEFAULT_EF_SEARCH):
        """Top-k (keys, rank_dists) for one query vector."""
        if self.entry < 0:
            return np.empty(0, dtype=np.int64), np.empty(0)
        q = np.asarray(q, dtype=np.float32)
        ep = self.entry
        ep_d = float(self._dist_to(q, [ep])[0])
        for lvl in range(self.max_level, 0, -1):
            ep, ep_d = self._greedy(q, ep, ep_d, lvl)
        ef = max(int(ef_search), k)  # usearch: expansion = max(ef, k)
        found = self._search_layer(q, [(ep_d, ep)], ef, 0)[:k]
        idxs = np.array([i for _, i in found], dtype=np.int64)
        dists = np.array([d for d, _ in found])
        return self.keys[idxs], dists

    def search_batch(self, qs: np.ndarray, k: int, ef_search: int = DEFAULT_EF_SEARCH):
        """Multi-query search (the reference's ExecuteMultiScan shape,
        hnsw_index.cpp:353-367). Returns (keys (nq,k'), dists, counts)."""
        out_k, out_d = [], []
        for q in qs:
            kk, dd = self.search(q, k, ef_search)
            out_k.append(kk)
            out_d.append(dd)
        return out_k, out_d

    # -- stats / serialization -------------------------------------------

    def level_stats(self) -> list[dict]:
        """Per-level {nodes, edges, max_edges, allocated_bytes} — the shape
        of pragma_hnsw_index_info's levels_stats (hnsw_index_pragmas.cpp:
        24-58)."""
        stats = []
        for lvl in range(self.max_level + 1):
            nodes = sum(1 for l in self.levels if l >= lvl)
            edges = sum(
                len(nb[lvl]) for nb in self.neighbors if lvl < len(nb)
            )
            m_max = self.m0 if lvl == 0 else self.m
            stats.append(
                {
                    "nodes": nodes,
                    "edges": edges,
                    "max_edges": nodes * m_max,
                    "allocated_bytes": edges * 8,
                }
            )
        return stats

    def approx_memory_bytes(self) -> int:
        return int(
            self.vectors.nbytes
            + self.keys.nbytes
            + sum(len(nb[l]) * 8 for nb in self.neighbors for l in range(len(nb)))
        )

    def to_bytes(self) -> bytes:
        buf = io.BytesIO()
        pickle.dump(
            {
                "dim": self.dim,
                "metric": self.metric,
                "m": self.m,
                "m0": self.m0,
                "ef_construction": self.ef_construction,
                "seed": self.seed,
                "vectors": self.vectors,
                "keys": self.keys,
                "levels": self.levels,
                "neighbors": self.neighbors,
                "entry": self.entry,
                "max_level": self.max_level,
            },
            buf,
            protocol=4,
        )
        return buf.getvalue()

    @classmethod
    def from_bytes(cls, data: bytes) -> "HNSWGraph":
        d = pickle.loads(data)
        g = cls(
            d["dim"],
            d["metric"],
            d["m"],
            d["m0"],
            d["ef_construction"],
            d["seed"],
        )
        g.vectors = d["vectors"]
        g.keys = d["keys"]
        g.levels = d["levels"]
        g.neighbors = d["neighbors"]
        g.entry = d["entry"]
        g.max_level = d["max_level"]
        return g
