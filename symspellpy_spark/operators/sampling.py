"""Deterministic sampling for training-data mixing.

A training corpus is assembled as a MIXTURE: per-stratum (language,
source, quality band) keep-rates applied to a much larger pool. At
100 TB the sampler must be (a) a pure function of the row key — so
reruns, task retries, speculative execution and different cluster
sizes all select the SAME rows (RNG-based ``df.sample`` guarantees
none of that), and (b) shuffle-free — a filter, not a repartition.

``hash_stratified_sample`` keeps a row iff
``pmod(xxhash64(key), denom) < rate[stratum]``: one deterministic
64-bit hash per row, compared against an integer per-stratum rate.
The keep-decision is independent of partitioning and of every other
row, so the operator composes with any upstream and pushes down to
the scan as a plain predicate.

No reference analogue (SURVEY.md §2.6): sampling is out of scope for
symspellpy; this is the mixture-assembly stage a web-scale training
pipeline runs after dedup/filtering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["hash_stratified_sample"]


def hash_stratified_sample(
    df: DataFrame,
    rates: dict,
    key_col: str = "doc_id",
    strata_col: str = "lang",
    default_rate: int = 0,
    denom: int = 100,
) -> DataFrame:
    """Keep each row with per-stratum probability ``rates[stratum]/denom``,
    decided by ``pmod(xxhash64(key_col), denom) < rate`` — deterministic,
    shuffle-free, retry-stable.

    ``rates`` maps stratum values to integer numerators in
    ``[0, denom]``; strata absent from the map use ``default_rate``.
    Rows keep their full schema; the selected subset is identical for
    any partitioning of the input.
    """
    if not 0 < denom:
        raise ValueError(f"denom must be positive, got {denom}")
    for k, v in rates.items():
        if not 0 <= v <= denom:
            raise ValueError(f"rate for {k!r} outside [0, {denom}]: {v}")
    rate = F.lit(default_rate)
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == F.lit(k), F.lit(v)).otherwise(rate)
    return df.where(
        F.pmod(F.xxhash64(F.col(key_col)), F.lit(denom)) < rate
    )
