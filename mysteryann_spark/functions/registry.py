"""SQL-callable metric registry — SURVEY.md §2.12.

The reference's extension point is the ``Distance`` virtual class selected
by ``Metric`` (include/efanna2e/distance.h:16-20, src/index.cpp:8-26).
The Spark rendering is a function registry: each metric becomes an
Arrow-batched pandas UDF registered into the session's SQL catalog, so
``SELECT dist_l2(a, b)`` works from plain SQL exactly like any built-in —
and the kernel underneath is the same batched numpy the operators use.

Python-side UDFs are the slow path relative to Catalyst expressions
(functions/vector.py provides those for the hot paths); the registry
exists for the SQL-surface parity and for metrics user code plugs in.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def _pairwise(fn):
    @pandas_udf(DoubleType())
    def udf(a: pd.Series, b: pd.Series) -> pd.Series:
        am = np.stack([np.asarray(v, dtype=np.float64) for v in a])
        bm = np.stack([np.asarray(v, dtype=np.float64) for v in b])
        return pd.Series(fn(am, bm))

    return udf


def _l2(am: np.ndarray, bm: np.ndarray) -> np.ndarray:
    return ((am - bm) ** 2).sum(axis=1)


def _ip(am: np.ndarray, bm: np.ndarray) -> np.ndarray:
    # negated: smaller = closer (distance.h:223 convention)
    return -(am * bm).sum(axis=1)


def _cosine(am: np.ndarray, bm: np.ndarray) -> np.ndarray:
    na = np.linalg.norm(am, axis=1)
    nb = np.linalg.norm(bm, axis=1)
    return -((am * bm).sum(axis=1) / (na * nb))


METRICS = {"dist_l2": _l2, "dist_ip": _ip, "dist_cosine": _cosine}


def register_metric_udfs(spark: SparkSession) -> None:
    """Install the metric registry into the session's SQL catalog
    (idempotent)."""
    for name, fn in METRICS.items():
        spark.udf.register(name, _pairwise(fn))
