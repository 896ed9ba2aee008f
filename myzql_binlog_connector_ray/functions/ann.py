"""Approximate-nearest-neighbor search over an embedding column.

- Brute-force cosine top-k: the queries (small side) are broadcast via
  ``ray.put`` once; each map_batches task does one float64 matmul per
  batch against the broadcast matrix and emits per-batch partial top-k
  rows — the driver (or a tiny final aggregate) merges k·#blocks rows.
  No shuffle of the embedding table.
- LSH-bucketed variant (scale path): random-hyperplane signatures →
  groupby(bucket); queries search only their own bucket, trading recall
  for touching 1/2^bits of the data.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def list_col_to_matrix(col, dtype=np.float64) -> np.ndarray:
    """(nrows, dim) ndarray from an Arrow ``list<float>`` column.

    Fast path: when every list has the same length and there are no
    null lists (the embedding-table invariant), one buffer-level
    ``flatten().to_numpy()`` + reshape — no per-element Python objects
    (~100× faster than ``to_pylist`` at 64-dim). Ragged or nullable
    columns fall back to the object path.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_list(col.type) and col.null_count == 0:
        vals = col.flatten().to_numpy(zero_copy_only=False)
        return vals.reshape(len(col), col.type.list_size).astype(dtype, copy=False)
    if pa.types.is_list(col.type) and col.null_count == 0 and len(col):
        widths = np.diff(col.offsets.to_numpy())
        if (widths == widths[0]).all() and widths[0] > 0:
            # flatten() returns exactly the values spanned by this
            # array's offsets, so the reshape is alignment-safe even
            # for sliced arrays
            vals = col.flatten().to_numpy(zero_copy_only=False)
            return vals.reshape(len(col), int(widths[0])).astype(dtype, copy=False)
    return np.asarray(col.to_pylist(), dtype=dtype)


class BruteForceTopK:
    """map_batches stage: per-batch cosine top-k against broadcast queries.

    ``queries_ref`` is a ``ray.ObjectRef`` to an (nq, dim) float array
    (ray.put once on the driver) — resolved once per actor in
    ``__init__``, NOT re-shipped per batch. Pass a plain ndarray for
    Ray-free unit tests.
    """

    def __init__(self, queries_ref, query_ids, k: int = 10, vec_col: str = "embedding", id_col: str = "vec_id"):
        try:
            import ray

            if isinstance(queries_ref, ray.ObjectRef):
                queries_ref = ray.get(queries_ref)
        except Exception:
            pass
        self.q = _normalize(np.asarray(queries_ref, dtype=np.float64))
        self.query_ids = np.asarray(query_ids, dtype=np.int64)
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        mat = list_col_to_matrix(batch[self.vec_col])
        mat = _normalize(mat)
        sims = self.q @ mat.T  # (nq, nbatch)
        qid_out, nid_out, sim_out = [], [], []
        k = min(self.k + 1, sims.shape[1])  # +1: a query may meet itself
        for qi in range(sims.shape[0]):
            row = sims[qi]
            top = np.argpartition(-row, k - 1)[:k]
            for j in top:
                qid_out.append(self.query_ids[qi])
                nid_out.append(ids[j])
                sim_out.append(row[j])
        return pa.table(
            {
                "qid": pa.array(qid_out, pa.int64()),
                "nid": pa.array(nid_out, pa.int64()),
                "sim": pa.array(sim_out, pa.float64()),
            }
        )


def merge_topk(partials: pd.DataFrame, k: int = 10, exclude_self: bool = True) -> pd.DataFrame:
    """Merge per-batch partial top-k rows → final (qid, nid, rank)."""
    df = partials
    if exclude_self:
        df = df[df["qid"] != df["nid"]]
    df = df.sort_values(["qid", "sim", "nid"], ascending=[True, False, True], kind="stable")
    df = df.groupby("qid", sort=True).head(k).copy()
    df["rank"] = df.groupby("qid").cumcount() + 1
    return df[["qid", "nid", "rank"]].reset_index(drop=True)


class LshBucketer:
    """Scale path: random-hyperplane LSH bucket id per vector.

    Vectors (and queries) sharing a bucket are candidates; a groupby on
    ``bucket`` co-locates them so each bucket is searched independently.
    """

    def __init__(self, dim: int, bits: int = 8, seed: int = 11, vec_col: str = "embedding"):
        rng = np.random.RandomState(seed)
        self.planes = rng.standard_normal((bits, dim))
        self.vec_col = vec_col

    def bucket_of(self, mat: np.ndarray) -> np.ndarray:
        signs = (mat @ self.planes.T) > 0
        return (signs * (1 << np.arange(signs.shape[1]))).sum(axis=1).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = list_col_to_matrix(batch[self.vec_col])
        return batch.append_column("bucket", pa.array(self.bucket_of(mat), pa.int64()))


class IvfIndex:
    """IVF (inverted-file) ANN: k-means-lite centroids on a driver-side
    sample, broadcast to the cluster; vectors route to their nearest
    centroid's bucket and queries probe only ``nprobe`` buckets.

    The scale path complement to LshBucketer: data-adaptive buckets
    (better recall per probe on clustered embeddings) at the cost of a
    small training pass. Deterministic: fixed seed, fixed iterations.
    """

    def __init__(self, centroids, vec_col: str = "embedding"):
        try:
            import ray

            if isinstance(centroids, ray.ObjectRef):
                centroids = ray.get(centroids)
        except Exception:
            pass
        self.centroids = _normalize(np.asarray(centroids, dtype=np.float64))
        self.vec_col = vec_col

    @staticmethod
    def train(sample: np.ndarray, n_lists: int = 16, iters: int = 10, seed: int = 13) -> np.ndarray:
        """Lloyd's iterations on normalized vectors (cosine k-means)."""
        rng = np.random.RandomState(seed)
        x = _normalize(np.asarray(sample, dtype=np.float64))
        centroids = x[rng.choice(len(x), size=min(n_lists, len(x)), replace=False)]
        for _ in range(iters):
            assign = (x @ centroids.T).argmax(axis=1)
            for c in range(len(centroids)):
                members = x[assign == c]
                if len(members):
                    centroids[c] = members.mean(axis=0)
            centroids = _normalize(centroids)
        return centroids

    @staticmethod
    def train_one_pass(sample: np.ndarray, n_lists: int) -> np.ndarray:
        """The SQL-reproducible training spec (the ``ann_topk_ivf``
        oracle recomputes it exactly in DuckDB): seeds are the first
        ``n_lists`` sample rows (the sample is vec_id-ordered, so this
        is deterministic and data-derived, not RNG-derived), ONE cosine
        assignment pass (ties → lowest list id, np.argmax first-max),
        centroid = elementwise mean of the RAW assigned vectors, empty
        lists keep their seed. Cosine reads are scale-invariant, so the
        unnormalized mean is exactly DuckDB's ``avg(v)`` per element."""
        sample = np.asarray(sample, dtype=np.float64)
        n_lists = min(n_lists, len(sample))
        seeds = sample[:n_lists]
        assign = (_normalize(sample) @ _normalize(seeds).T).argmax(axis=1)
        cents = seeds.copy()
        for j in range(n_lists):
            members = sample[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
        return cents

    def assign(self, mat: np.ndarray) -> np.ndarray:
        # argmax takes the FIRST max → ties break to the lowest list id
        # (mirrored by the oracle's ORDER BY sim DESC, lid ASC)
        return (_normalize(mat) @ self.centroids.T).argmax(axis=1).astype(np.int64)

    def probe(self, queries: np.ndarray, nprobe: int = 4) -> list[np.ndarray]:
        sims = _normalize(np.asarray(queries, dtype=np.float64)) @ self.centroids.T
        # stable sort: equal sims keep ascending list order (spec tiebreak)
        return [np.argsort(-row, kind="stable")[:nprobe] for row in sims]

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = list_col_to_matrix(batch[self.vec_col])
        return batch.append_column("ivf_list", pa.array(self.assign(mat), pa.int64()))
