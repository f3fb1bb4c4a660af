"""Distributed PCA over an embedding column.

No reference counterpart (RoarGraph consumes raw CLIP vectors as-is,
``/root/reference/src/index_bipartite.cpp`` loads fbin floats verbatim);
this is the dimensionality-reduction stage an embedding pipeline runs
before indexing or clustering. Spark-first shape:

- ``fit_pca``: each partition emits ONE partial-moment row — count, sum
  vector, flattened sum of outer products — from an Arrow-batched
  ``mapInPandas`` kernel (the treeAggregate covariance pattern as a
  DataFrame job). The partials are combined DISTRIBUTED (posexplode +
  sum by position), so the driver collects exactly d^2 + d + 1 doubles
  (~33 KB at d=64) no matter how many partitions or rows fed them —
  model-bounded, same class as the centroid/medoid collects in knn.py.
  The d x d eigendecomposition runs driver-side: d is a model
  hyperparameter, never data-sized.
- ``project_pca``: one (batch x d) @ (d x k) GEMM per Arrow batch,
  map-only — zero shuffle, scales linearly to any row count.

Determinism: eigh of the same covariance is sign-ambiguous per
eigenvector; signs are fixed so each component's largest-|coordinate|
entry is positive (the sklearn ``svd_flip`` convention). Partial sums
depend on partitioning only through float addition order (~1e-13
relative), far below the spectrum gaps of any real embedding corpus.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PCAModel:
    mean: np.ndarray          # (d,)
    components: np.ndarray    # (k, d) rows orthonormal, sign-fixed
    explained_var: np.ndarray  # (k,) descending eigenvalues

    @property
    def dim(self) -> int:
        return int(self.mean.shape[0])

    @property
    def k(self) -> int:
        return int(self.components.shape[0])


def _moment_partials(vec_col: str, dim: int):
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(dim, dtype=np.float64)
        o = np.zeros((dim, dim), dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if x.shape[1] != dim:
                raise ValueError(f"embedding dim {x.shape[1]} != expected {dim}")
            n += x.shape[0]
            s += x.sum(axis=0)
            o += x.T @ x
        if n:
            # element 0 = count, then the d sums, then the d*d outer sums:
            # one array so the distributed combine is a single posexplode.
            flat = np.concatenate(([float(n)], s, o.ravel()))
            yield pd.DataFrame({"m": [flat.tolist()]})

    return kernel


def fit_pca(emb_df: DataFrame, k: int, vec_col: str = "embedding") -> PCAModel:
    """Fit a k-component PCA. One pass over the data; driver memory is
    O(d^2) regardless of rows or partitions."""
    dim = int(emb_df.select(F.size(vec_col)).limit(1).collect()[0][0])
    partials = emb_df.select(vec_col).mapInPandas(
        _moment_partials(vec_col, dim), "m array<double>"
    )
    combined = (
        partials.select(F.posexplode("m").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum("v").alias("v"))
        .collect()
    )
    flat = np.zeros(1 + dim + dim * dim, dtype=np.float64)
    for row in combined:
        flat[row["pos"]] = row["v"]
    n = flat[0]
    if n < 2:
        raise ValueError("fit_pca needs at least 2 rows")
    mean = flat[1 : 1 + dim] / n
    cov = flat[1 + dim :].reshape(dim, dim) / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T.copy()  # (k, d)
    # svd_flip sign convention: largest-|coordinate| entry positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PCAModel(mean=mean, components=comps, explained_var=evals[order].copy())


def project_pca(
    emb_df: DataFrame,
    model: PCAModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pc",
) -> DataFrame:
    """Project rows onto the fitted components: map-only Arrow-batched
    GEMM, output ``(id_col, out_col array<double> length k)``."""
    mean = model.mean
    comp_t = model.components.T.copy()  # (d, k)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64) - mean
            scores = x @ comp_t  # (batch, k)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), out_col: list(scores)}
            )

    return emb_df.select(id_col, vec_col).mapInPandas(
        kernel, f"{id_col} bigint, {out_col} array<double>"
    )


def covariance_moments(emb_df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Upper-triangle POPULATION covariance ``(i, j, cov)`` with i <= j of
    the embedding coordinates, derived from the SAME distributed moment
    partials ``fit_pca`` eigendecomposes (count / sum / outer-product sums,
    combined positionwise) — the SQL-checkable half of PCA. The moments
    stay a DataFrame end-to-end: the (d^2+d+1)-row combined vector is
    reshaped into (i, j) coordinates with column arithmetic and joined
    against the per-dimension sums, so the driver never collects anything
    and the only data-sized work is the one partial-moments pass."""
    dim = int(emb_df.select(F.size(vec_col)).limit(1).collect()[0][0])
    partials = emb_df.select(vec_col).mapInPandas(
        _moment_partials(vec_col, dim), "m array<double>"
    )
    combined = (
        partials.select(F.posexplode("m").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum("v").alias("v"))
        # materialize the (d^2+d+1)-row moment vector once: four branches
        # (count / sums x2 / outer) read it, and without the cut each
        # would re-run the data-sized moment pass
        .localCheckpoint(eager=True)
    )
    n_df = combined.where(F.col("pos") == 0).select(F.col("v").alias("n"))
    sums = combined.where((F.col("pos") >= 1) & (F.col("pos") <= dim)).select(
        (F.col("pos") - 1).alias("i"), F.col("v").alias("s")
    )
    outer = combined.where(F.col("pos") > dim).select(
        F.floor((F.col("pos") - dim - 1) / dim).cast("int").alias("i"),
        ((F.col("pos") - dim - 1) % dim).cast("int").alias("j"),
        F.col("v").alias("o"),
    )
    return (
        outer.where(F.col("i") <= F.col("j"))
        .join(F.broadcast(sums.select(F.col("i"), F.col("s").alias("s_i"))), "i")
        .join(
            F.broadcast(sums.select(F.col("i").alias("j"), F.col("s").alias("s_j"))),
            "j",
        )
        .crossJoin(F.broadcast(n_df))
        .select(
            "i",
            "j",
            (F.col("o") / F.col("n")
             - (F.col("s_i") / F.col("n")) * (F.col("s_j") / F.col("n"))).alias("cov"),
        )
    )
