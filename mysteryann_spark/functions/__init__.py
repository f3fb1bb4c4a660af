from mysteryann_spark.functions.vector import (
    l2_sq,
    inner_product,
    cosine_distance,
    distance_col,
    l2_norm,
    normalize_expr,
    np_distances,
    np_normalize,
)
from mysteryann_spark.functions.text import (
    tokens_col,
    token_count,
    stopword_ratio,
    quality_score_cols,
    lang_id_cols,
    doc_fingerprint,
)

__all__ = [
    "l2_sq",
    "inner_product",
    "cosine_distance",
    "distance_col",
    "l2_norm",
    "normalize_expr",
    "np_distances",
    "np_normalize",
    "tokens_col",
    "token_count",
    "stopword_ratio",
    "quality_score_cols",
    "lang_id_cols",
    "doc_fingerprint",
]
