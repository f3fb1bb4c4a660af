"""Unit tests for the Arrow-offsets CSR builder (sources/staging.py) —
pure pyarrow/numpy, no Spark session needed."""

import numpy as np
import pyarrow as pa

from mysteryann_spark.sources.staging import table_csr


def _tbl(nodes, nbrs):
    return pa.table(
        {
            "node": pa.array(nodes, type=pa.int64()),
            "nbrs": pa.array(nbrs, type=pa.list_(pa.int64())),
        }
    )


def test_csr_aligned_to_sorted_ids():
    ids = np.array([10, 20, 30], dtype=np.int64)
    # table rows deliberately out of id order; CSR must align to ids order
    tbl = _tbl([30, 10], [[10, 20], [30]])
    indptr, indices = table_csr(tbl, ids)
    assert indptr.tolist() == [0, 1, 1, 3]  # 10 -> [30]; 20 -> []; 30 -> [10, 20]
    assert indices.tolist() == [2, 0, 1]


def test_csr_drops_unknown_nodes_and_neighbors():
    ids = np.array([1, 2], dtype=np.int64)
    tbl = _tbl([1, 99], [[2, 77, 1], [1]])  # node 99 and neighbor 77 unknown
    indptr, indices = table_csr(tbl, ids)
    assert indptr.tolist() == [0, 2, 2]
    assert indices.tolist() == [1, 0]  # within-list order preserved


def test_csr_empty_adjacency():
    ids = np.array([5], dtype=np.int64)
    indptr, indices = table_csr(_tbl([], []), ids)
    assert indptr.tolist() == [0, 0]
    assert len(indices) == 0


def test_csr_dense_identity_ids():
    ids = np.arange(4, dtype=np.int64)
    tbl = _tbl([0, 3], [[1, 2], [0]])
    indptr, indices = table_csr(tbl, ids)
    assert indptr.tolist() == [0, 2, 2, 2, 3]
    assert indices.tolist() == [1, 2, 0]


def test_table_ragged_reorders_and_handles_empties():
    """CSR loader must id-sort rows, preserve within-list order through
    the reordering gather, and represent empty lists as zero-width
    segments."""
    import numpy as np
    import pyarrow as pa

    from mysteryann_spark.sources.staging import table_ragged

    tbl = pa.table(
        {
            "rep": pa.array([30, 10, 20, 40], type=pa.int64()),
            "htok": pa.array(
                [[7, 8, 9], [1, 2], [], [5]], type=pa.list_(pa.int64())
            ),
        }
    )
    ids, indptr, flat = table_ragged(tbl, "rep", "htok")
    assert list(ids) == [10, 20, 30, 40]
    assert list(indptr) == [0, 2, 2, 5, 6]
    assert list(flat) == [1, 2, 7, 8, 9, 5]
    # chunked input (multiple record batches) must behave identically
    tbl2 = pa.concat_tables([tbl.slice(0, 2), tbl.slice(2)])
    ids2, indptr2, flat2 = table_ragged(tbl2, "rep", "htok")
    assert list(ids2) == list(ids)
    assert list(indptr2) == list(indptr)
    assert list(flat2) == list(flat)
    with np.errstate(all="raise"):  # empty table edge
        e = pa.table({"rep": pa.array([], type=pa.int64()),
                      "htok": pa.array([], type=pa.list_(pa.int64()))})
        ids3, indptr3, flat3 = table_ragged(e, "rep", "htok")
        assert len(ids3) == 0 and list(indptr3) == [0] and len(flat3) == 0


def test_staged_matrix_later_paths_override(spark):
    """StagedBase incremental semantics: the concatenated matrix resolves
    duplicate ids to the LATEST path's row (delete-then-reinsert update),
    keeps superset rows, and stays id-sorted."""
    import numpy as np

    from mysteryann_spark.sources.staging import StagedBase, staged_matrix

    d0 = spark.createDataFrame(
        [(1, [1.0, 1.0]), (2, [2.0, 2.0]), (3, [3.0, 3.0])],
        "vec_id long, embedding array<float>",
    )
    sb = StagedBase.of(d0)
    sb.append(
        spark.createDataFrame(
            [(2, [9.0, 9.0]), (4, [4.0, 4.0])],
            "vec_id long, embedding array<float>",
        )
    )
    ids, mat = staged_matrix(sb.paths, "vec_id", "embedding")
    assert ids.tolist() == [1, 2, 3, 4]
    np.testing.assert_allclose(mat[1], [9.0, 9.0])  # later path wins
    np.testing.assert_allclose(mat[3], [4.0, 4.0])
