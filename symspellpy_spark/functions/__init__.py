from symspellpy_spark.functions.distance import (
    damerau_osa_batch,
    distance_udf,
    levenshtein_batch,
    to_similarity,
)

__all__ = [
    "damerau_osa_batch",
    "distance_udf",
    "levenshtein_batch",
    "to_similarity",
]
