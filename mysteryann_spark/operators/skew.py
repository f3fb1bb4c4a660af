"""Skew-mitigating join — the manual fallback for key distributions AQE
can't fix.

AQE's skew-join splitting (on in session.py) handles skewed SHUFFLE
partitions, but only for sort-merge joins and only at partition
granularity. When one join key carries a double-digit percentage of a
100 TB fact table (the null-key / default-value / celebrity-user shapes),
salting is the standard remedy: spread the hot key's rows over
``n_salts`` sub-keys and replicate the other side once per salt, so the
hot key's work lands on ``n_salts`` tasks instead of one.

Cost model: replicating the build side multiplies its shuffle volume by
``n_salts`` — worth it only when the probe side's skew dominates. Salt
the few hot keys, not the whole table, when the hot set is known
(``hot_keys`` parameter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
    hot_keys: list | None = None,
) -> DataFrame:
    """Equi-join ``left ⋈ right ON on`` with the left (probe/skewed) side
    salted and the right (build) side replicated.

    The salt is ``xxhash64(whole left row) % n_salts`` — deterministic, so
    results are reproducible run-to-run (F.rand would not be stable under
    task retry). With ``hot_keys`` given, only those keys are salted and
    the rest join unreplicated, keeping the replication cost proportional
    to the hot set.

    Only left-preserving join types are supported (``inner``, ``left``,
    ``left_semi``, ``left_anti``): the right side is replicated once per
    salt, so right/full outer would null-extend every unmatched right row
    ``n_salts`` times. Left semi/anti stay correct because each right row
    exists in every salt bucket — a (non-)match in the left row's own
    bucket is a global (non-)match.
    """
    supported = {"inner", "left", "left_outer", "left_semi", "leftsemi",
                 "left_anti", "leftanti"}
    if how not in supported:
        raise ValueError(
            f"salted_join supports {sorted(supported)} (right side is "
            f"replicated per salt; {how!r} would duplicate unmatched right rows)"
        )
    left_only = how in ("left_semi", "leftsemi", "left_anti", "leftanti")
    out_cols = [c for c in left.columns] + (
        [] if left_only else [c for c in right.columns if c != on]
    )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    salts_arr = F.array(*[F.lit(i) for i in range(n_salts)])

    if hot_keys is None:
        l_s = left.withColumn("_salt", salt)
        r_s = right.withColumn("_salt", F.explode(salts_arr))
        return l_s.join(r_s, [on, "_salt"], how).select(*out_cols)

    is_hot = F.col(on).isin(hot_keys)
    l_hot = left.where(is_hot).withColumn("_salt", salt)
    r_hot = right.where(is_hot).withColumn("_salt", F.explode(salts_arr))
    hot = l_hot.join(r_hot, [on, "_salt"], how).select(*out_cols)
    cold = left.where(~is_hot).join(right.where(~is_hot), on, how).select(*out_cols)
    return hot.unionByName(cold)
