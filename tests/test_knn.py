"""Exact kNN join + medoid vs driver-side numpy brute force."""

import numpy as np
from pyspark.sql import functions as F

from mysteryann_spark.functions.vector import np_distances
from mysteryann_spark.operators.knn import knn_join, knn_join_arrays, medoid


def _matrix(emb):
    rows = sorted(emb.select("vec_id", "embedding").collect(), key=lambda r: r[0])
    return np.array([r[0] for r in rows]), np.stack(
        [np.asarray(r[1], dtype=np.float64) for r in rows]
    )


def test_knn_matches_bruteforce(spark, emb):
    ids, mat = _matrix(emb)
    q = emb.where("vec_id < 10").select(F.col("vec_id").alias("qid"), "embedding")
    got = knn_join(q, emb, 5, "l2").collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append((r["rank"], r["nn_id"], r["dist"]))
    D = np_distances("l2", mat[:10], mat)
    for qi in range(10):
        order = sorted(range(len(ids)), key=lambda j: (D[qi, j], ids[j]))[:5]
        want = [int(ids[j]) for j in order]
        rows = sorted(by_q[qi])
        assert [nn for _, nn, _ in rows] == want
        for (_, _, dist), j in zip(rows, order):
            assert abs(dist - D[qi, j]) < 1e-9


def test_knn_arrays_shape(spark, emb):
    q = emb.where("vec_id < 5").select(F.col("vec_id").alias("qid"), "embedding")
    out = knn_join_arrays(q, emb, 7, "cosine").collect()
    assert len(out) == 5
    for r in out:
        assert len(r["nn"]) == 7 and len(r["dists"]) == 7
        assert r["dists"] == sorted(r["dists"])  # rank-ordered, minimizing


def test_knn_exclude_self(spark, emb):
    q = emb.where("vec_id < 5").select(F.col("vec_id").alias("qid"), "embedding")
    out = knn_join(q, emb, 3, "l2", exclude_self=True).collect()
    assert all(r["nn_id"] != r["qid"] for r in out)


def test_medoid_matches_numpy(spark, emb):
    ids, mat = _matrix(emb)
    cent = mat.mean(axis=0)
    d = ((mat - cent) ** 2).sum(axis=1)
    want = int(ids[np.lexsort((ids, d))[0]])
    mid, dist = medoid(emb)
    assert mid == want
    assert abs(dist - d.min()) < 1e-9


def test_knn_join_blocked_equals_single_broadcast(spark, emb):
    """Blocked query streaming (the unbounded-Q scale path) must be
    result-identical to the one-shot broadcast."""
    q = emb.where("vec_id < 37").select(F.col("vec_id").alias("qid"), "embedding")
    # GEMM float noise differs by block shape (an exact 0 can render as
    # ~2e-16) — ids/ranks must match exactly, dists to 9 decimals
    r9 = lambda rows: sorted(  # noqa: E731
        (r["qid"], r["nn_id"], round(r["dist"], 9), r["rank"]) for r in rows
    )
    one = r9(knn_join(q, emb, 5, "l2").collect())
    blk = r9(knn_join(q, emb, 5, "l2", query_block_rows=7).collect())
    assert one == blk
    # exclude_self must also hold per block
    one_x = r9(knn_join(q, emb, 5, "l2", exclude_self=True).collect())
    blk_x = r9(knn_join(q, emb, 5, "l2", exclude_self=True, query_block_rows=10).collect())
    assert one_x == blk_x


def test_dmat_chunk_rows_bounds_every_geometry():
    """The shared chunk sizer keeps one scratch matrix under the
    SPARK_GRAFT_DMAT_BUDGET_MB budget at every geometry — including the
    256k-centroid float32 10^8 assignment the old cell-count floor
    over-allocated 4x on."""
    from mysteryann_spark.operators.knn import _DMAT_BUDGET_BYTES, dmat_chunk_rows

    for n_cols, itemsize in ((256_000, 4), (25_600, 4), (1_024_000, 8), (3, 8)):
        rows = dmat_chunk_rows(n_cols, itemsize)
        assert rows >= 1
        assert rows == 1 or rows * n_cols * itemsize <= _DMAT_BUDGET_BYTES
