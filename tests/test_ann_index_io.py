"""IVF-PQ index persistence gates: layout, model round-trip, and
bit-parity between the in-memory and the save/load search paths."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mysteryann_spark.operators.similarity import (
    build_ivfpq_index,
    search_ivfpq_index,
)
from mysteryann_spark.sources.ann_index_io import load_ivfpq, save_ivfpq

SF_TINY = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    from mysteryann_spark.sources.tables import load_table

    base = load_table(spark, "embeddings", SF_TINY)
    index = build_ivfpq_index(base, n_centroids=8, m=8, n_codes=32)
    path = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    save_ivfpq(index, path)
    return base, index, path


def test_layout_is_cid_partitioned(built):
    import os

    _, index, path = built
    parts = [d for d in os.listdir(f"{path}/lists") if d.startswith("cid=")]
    assert len(parts) >= 2, f"expected cid=* partition dirs, got {parts}"
    for sub in ("centroids", "books", "meta"):
        assert os.path.isdir(f"{path}/{sub}")


def test_model_roundtrip_exact(spark, built):
    _, index, path = built
    loaded = load_ivfpq(spark, path)
    np.testing.assert_array_equal(loaded["centroids"], index["centroids"])
    np.testing.assert_array_equal(loaded["books"], index["books"])
    assert loaded["meta"] == index["meta"]
    assert loaded["lists"].count() == index["lists"].count()


def test_search_parity_memory_vs_loaded(spark, built):
    """Same queries, same k/probes: searching through the persisted index
    must return exactly the rows the in-memory index returns."""
    base, index, path = built
    loaded = load_ivfpq(spark, path)
    q = base.where(F.col("vec_id") < 15).select(
        F.col("vec_id").alias("qid"), "embedding"
    )

    def run(idx):
        return sorted(
            (r["qid"], r["nn_id"], round(r["dist"], 9), r["rank"])
            for r in search_ivfpq_index(q, idx, 5, n_probe=4, refine=10, base_df=base).collect()
        )

    assert run(index) == run(loaded)


def test_adc_only_search_when_base_absent(spark, built):
    """base_df=None returns pure-ADC distances — the serving regime where
    only the persisted index exists."""
    base, _, path = built
    loaded = load_ivfpq(spark, path)
    q = base.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    rows = search_ivfpq_index(q, loaded, 3, n_probe=4, base_df=None).collect()
    assert {r["qid"] for r in rows} == set(range(5))
    assert all(r["rank"] <= 3 for r in rows)


def test_load_rejects_corrupt_centroids(spark, built, tmp_path):
    """A centroid file with a gap in cid must be refused, not silently
    mis-ordered."""
    _, index, path = built
    bad = str(tmp_path / "bad")
    save_ivfpq(index, bad)
    spark.createDataFrame(
        [(0, [0.0] * index["meta"]["dim"]), (2, [0.0] * index["meta"]["dim"])],
        "cid int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{bad}/centroids")
    with pytest.raises(ValueError, match="not contiguous"):
        load_ivfpq(spark, bad)
