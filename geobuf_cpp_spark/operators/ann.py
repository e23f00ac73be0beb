"""Approximate-nearest-neighbor search over an embedding column.

* ``cosine_topk`` — exact brute-force baseline: each partition computes a
  local top-k per query with one numpy matmul (Arrow batch -> (n, d)
  matrix, zero per-row Python), then a windowed global top-k merges the
  per-partition candidates. Shuffle volume is O(partitions * queries * k),
  never O(n) — this is the scale-correct brute-force shape.
* ``build_ivf`` / ``ivf_topk`` — the scale path: deterministic k-means
  (seeded init by vec_id, fixed iterations) builds ``n_lists`` centroids;
  vectors are assigned to their nearest list (one shuffle, reusable
  layout); queries probe the ``nprobe`` nearest lists only, so compute and
  shuffle shrink by ~n_lists/nprobe at equal recall on clustered data.

Similarity is cosine via normalized dot product in float64.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

TOPK_SCHEMA = "query_id long, vec_id long, sim double"


def _as_matrix(series: pd.Series) -> np.ndarray:
    return np.vstack(series.to_numpy()).astype(np.float64)


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def cosine_topk(emb_df, queries_pdf: pd.DataFrame, k: int,
                id_col: str = "vec_id", vec_col: str = "embedding"):
    """Exact cosine top-k. ``queries_pdf``: (query_id, vec list[float])."""
    q_ids = queries_pdf["query_id"].to_numpy()
    q_mat = _normalize(_as_matrix(queries_pdf["vec"]))

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            # sort the batch by vec_id, then pick top-k with a STABLE sort:
            # ties across the local top-k boundary (duplicate embeddings)
            # resolve to the smaller vec_id, matching the global
            # (sim DESC, vec_id ASC) window — the local cut can never drop
            # a vector the exact answer would keep
            pdf = pdf.sort_values(id_col)
            ids = pdf[id_col].to_numpy()
            mat = _normalize(_as_matrix(pdf[vec_col]))
            sims = q_mat @ mat.T  # (n_q, n_vec)
            take = min(k, sims.shape[1])
            idx = np.argsort(-sims, axis=1, kind="stable")[:, :take]
            rows = {
                "query_id": np.repeat(q_ids, take),
                "vec_id": ids[idx].ravel(),
                "sim": np.take_along_axis(sims, idx, axis=1).ravel(),
            }
            yield pd.DataFrame(rows)

    partials = emb_df.select(id_col, vec_col).mapInPandas(partial, TOPK_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "sim")
    )


# ---------------------------------------------------------------------------
# IVF
# ---------------------------------------------------------------------------

def build_ivf(emb_df, n_lists: int = 16, iters: int = 5,
              id_col: str = "vec_id", vec_col: str = "embedding",
              sample: int = 4096):
    """Deterministic k-means centroids + (vec_id, list_id) assignment DF.

    Init = the ``n_lists`` lowest vec_ids (stable under any partitioning);
    Lloyd iterations on a driver-side sample (ANN coarse quantizers don't
    need exact k-means). Returns (centroids ndarray, assignments DataFrame);
    the assignment shuffle keyed by list_id is the reusable ANN layout.
    """
    seed_pdf = (
        emb_df.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(max(n_lists, min(sample, 4096)))
        .toPandas()
    )
    mat = _normalize(_as_matrix(seed_pdf[vec_col]))
    centroids = mat[:n_lists].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ centroids.T, axis=1)
        for c in range(n_lists):
            members = mat[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)

    def assign_lists(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            m = _normalize(_as_matrix(pdf[vec_col]))
            lists = np.argmax(m @ centroids.T, axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf[id_col].to_numpy(), "list_id": lists.astype(np.int32)}
            )

    assignments = emb_df.select(id_col, vec_col).mapInPandas(
        assign_lists, "vec_id long, list_id int"
    )
    return centroids, assignments


def ivf_topk(emb_df, assignments, centroids: np.ndarray,
             queries_pdf: pd.DataFrame, k: int, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding"):
    """Probe the nprobe nearest lists per query, exact rerank inside them."""
    q_mat = _normalize(_as_matrix(queries_pdf["vec"]))
    probe = np.argsort(-(q_mat @ centroids.T), axis=1)[:, :nprobe]
    probe_rows = [
        (int(qid), int(lst))
        for qid, lists in zip(queries_pdf["query_id"], probe)
        for lst in lists
    ]
    spark = emb_df.sparkSession
    probe_df = spark.createDataFrame(
        pd.DataFrame(probe_rows, columns=["query_id", "list_id"])
    )
    # restrict the table to probed lists, then brute-force within
    probed_vecs = (
        emb_df.join(assignments, id_col)
        .join(F.broadcast(probe_df.select("list_id").distinct()), "list_id")
        .select(id_col, vec_col, "list_id")
    )
    q_ids = queries_pdf["query_id"].to_numpy()
    # (n_queries, n_lists) boolean probe mask — the batch filter below is a
    # pure-numpy fancy index, no per-row Python
    probe_mask = np.zeros((len(q_ids), centroids.shape[0]), dtype=bool)
    probe_mask[np.arange(len(q_ids))[:, None], probe] = True

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(id_col)  # stable (sim, vec_id) ties
            ids = pdf[id_col].to_numpy()
            lists = pdf["list_id"].to_numpy()
            mat = _normalize(_as_matrix(pdf[vec_col]))
            sims = q_mat @ mat.T                      # (n_q, n_vec)
            sims = np.where(probe_mask[:, lists], sims, -np.inf)
            take = min(k, sims.shape[1])
            idx = np.argsort(-sims, axis=1, kind="stable")[:, :take]
            top = np.take_along_axis(sims, idx, axis=1)
            keep = np.isfinite(top).ravel()
            out = pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids, take),
                    "vec_id": ids[idx].ravel(),
                    "sim": top.ravel(),
                }
            )
            yield out[keep]

    partials = probed_vecs.mapInPandas(partial, TOPK_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "sim")
    )
