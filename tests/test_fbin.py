"""fbin/ibin connector roundtrips (reference util.h:84-211 layouts)."""

import numpy as np
from pyspark.sql import functions as F

from mysteryann_spark.operators.knn import knn_join
from mysteryann_spark.sources.fbin import (
    fbin_meta,
    ibin_meta,
    read_fbin,
    read_ibin,
    write_fbin,
    write_ibin,
)


def test_fbin_roundtrip(spark, emb, tmp_path):
    path = str(tmp_path / "emb.fbin")
    npts, dim = write_fbin(emb, path)
    assert (npts, dim) == (500, 64)
    assert fbin_meta(path) == (500, 64)
    back = read_fbin(spark, path)
    orig = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float32) for r in emb.collect()}
    got = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float32) for r in back.collect()}
    assert set(orig) == set(got)
    for vid in orig:
        assert np.array_equal(orig[vid], got[vid])  # bit-exact float32


def test_ibin_roundtrip(spark, emb, tmp_path):
    q = emb.where("vec_id < 30").select(F.col("vec_id").alias("qid"), "embedding")
    res = knn_join(q, emb, 5, "l2")
    gt = (
        res.groupBy("qid")
        .agg(F.array_sort(F.collect_list(F.struct("rank", "nn_id", "dist"))).alias("t"))
        .select(
            "qid",
            F.transform("t", lambda x: x["nn_id"]).alias("nn"),
            F.transform("t", lambda x: x["dist"]).alias("dists"),
        )
    )
    path = str(tmp_path / "gt.ibin")
    nq, k = write_ibin(gt, path)
    assert (nq, k) == (30, 5)
    assert ibin_meta(path) == (30, 5)
    back = read_ibin(spark, path)
    orig = {r["qid"]: (list(r["nn"]), [round(d, 4) for d in r["dists"]]) for r in gt.collect()}
    got = {r["qid"]: (list(r["nn"]), [round(d, 4) for d in r["dists"]]) for r in back.collect()}
    assert orig == got
