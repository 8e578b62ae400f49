"""Deterministic synthetic Common-Crawl-style ``pages`` table.

Schema per BASELINE.json ``input_hint``:
``pages(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)``

Generation is fully distributed and reproducible: a ``spark.range``
scan piped through ``mapInPandas`` where every row's content derives
only from (seed, row id) — no driver-side materialization, so the same
generator scales from 1k rows in tests to billions on a cluster.

Duplicate structure (the edit model mirrors the reference's
delete/transpose neighborhood, symspellpy.py:1045-1047):
- rows [0, n_base) are originals;
- every other row perturbs base ``id % n_base`` with a kind chosen
  deterministically: ``near_dup_edit`` (token deletes/transposes/char
  typos), ``near_dup_shuffle`` (whitespace/boilerplate perturbation),
  ``exact_substring`` (a contiguous chunk of the base embedded in
  unrelated text), or ``unrelated`` (no truth pair).

``truth_pairs(url_a, url_b, kind)`` / ``truth_clusters(url, cluster_id)``
are derivable relationally from the id scheme (no second generator).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["synthesize_pages", "truth_pairs", "truth_clusters"]

# small public-domain common-word list (frequency-ordered-ish); combined
# with generated tokens for a ~2k-word zipfian vocabulary
_COMMON = (
    "the of and to in is was he for it with as his on be at by had not are "
    "but from or have an they which one you were all her she there would "
    "their we him been has when who will no more if out so up said what its "
    "about than into them can only other time new some could these two may "
    "first then do any like my now over such our man me even most made after "
    "also did many off before must well back through years much where your "
    "way down should because each just those people how too little state "
    "good very make world still see own men work long here get both between "
    "life being under never day same another know while last might us great "
    "old year come since against go came right used take three"
).split()

_KINDS = ["near_dup_edit", "near_dup_shuffle", "exact_substring", "unrelated"]


def _vocab(seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    extra = [
        "".join(rng.choice(list("abcdefghijklmnopqrstuvwxyz"), size=rng.integers(4, 11)))
        for _ in range(2000 - len(_COMMON))
    ]
    return np.array(_COMMON + extra, dtype=object)


def _zipf_probs(n: int) -> np.ndarray:
    p = 1.0 / np.arange(1, n + 1)
    return p / p.sum()


def _base_text(
    base_id: int,
    vocab: np.ndarray,
    probs: np.ndarray,
    seed: int,
    min_tokens: int = 80,
    max_tokens: int = 400,
) -> str:
    rng = np.random.default_rng((seed, base_id, 0x7EA5))
    n_tokens = int(rng.integers(min_tokens, max_tokens))
    words = rng.choice(vocab, size=n_tokens, p=probs)
    return " ".join(words.tolist())


def _perturb_edit(text: str, rng: np.random.Generator) -> str:
    toks = text.split()
    n_edits = max(1, int(len(toks) * 0.03))
    for _ in range(n_edits):
        op = rng.integers(0, 3)
        i = int(rng.integers(0, len(toks)))
        if op == 0 and len(toks) > 10:  # token delete
            del toks[i]
        elif op == 1 and i + 1 < len(toks):  # token transpose
            toks[i], toks[i + 1] = toks[i + 1], toks[i]
        else:  # char typo inside a token (delete one char)
            w = toks[i]
            if len(w) > 2:
                j = int(rng.integers(0, len(w)))
                toks[i] = w[:j] + w[j + 1 :]
    return " ".join(toks)


def _perturb_shuffle(text: str, rng: np.random.Generator) -> str:
    toks = text.split()
    # boilerplate header/footer + whitespace noise; body order preserved
    header = " ".join(
        rng.choice(np.array(_COMMON, dtype=object), size=int(rng.integers(3, 9)))
    )
    body = "  ".join(" ".join(toks[i : i + 12]) for i in range(0, len(toks), 12))
    return f"{header}\n{body}\ncopyright {int(rng.integers(1990, 2026))}"


def _substring_host(
    base: str, rng: np.random.Generator, vocab: np.ndarray, probs: np.ndarray
) -> str:
    toks = base.split()
    k = max(20, int(len(toks) * 0.5))
    start = int(rng.integers(0, max(1, len(toks) - k)))
    chunk = " ".join(toks[start : start + k])
    host = " ".join(rng.choice(vocab, size=int(rng.integers(40, 120)), p=probs))
    return f"{host} {chunk}"


def synthesize_pages(
    spark: SparkSession,
    n_docs: int = 2000,
    n_base: int | None = None,
    seed: int = 42,
    partitions: int | None = None,
    min_tokens: int = 80,
    max_tokens: int = 400,
) -> DataFrame:
    """-> pages(url, warc_ts, html, text, lang) — deterministic in (seed, n)."""
    if n_base is None:
        n_base = max(1, n_docs // 4)
    rng_vocab = _vocab(seed)
    probs = _zipf_probs(len(rng_vocab))

    base = spark.range(0, n_docs, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["id"].to_numpy():
                doc_id = int(doc_id)
                base_id = doc_id % n_base
                btext = _base_text(
                    base_id, rng_vocab, probs, seed, min_tokens, max_tokens
                )
                if doc_id < n_base:
                    text, kind = btext, "original"
                else:
                    rng = np.random.default_rng((seed, doc_id, 0xD0C))
                    kind = _KINDS[doc_id % len(_KINDS)]
                    if kind == "near_dup_edit":
                        text = _perturb_edit(btext, rng)
                    elif kind == "near_dup_shuffle":
                        text = _perturb_shuffle(btext, rng)
                    elif kind == "exact_substring":
                        text = _substring_host(btext, rng, rng_vocab, probs)
                    else:
                        rng2 = np.random.default_rng((seed, doc_id, 0xFEED))
                        text = " ".join(
                            rng2.choice(
                                rng_vocab,
                                size=int(rng2.integers(min_tokens, max_tokens)),
                                p=probs,
                            )
                        )
                out.append(
                    {
                        "doc_id": doc_id,
                        "url": f"https://example.org/{kind}/{doc_id}",
                        "warc_ts_epoch": 1_600_000_000 + doc_id * 97 % 100_000_000,
                        "html": f"<html><body>{text}</body></html>".encode(),
                        "text": text,
                        "lang": "en" if doc_id % 17 else "de",
                        "kind": kind,
                        "base_id": base_id,
                    }
                )
            yield pd.DataFrame(out)

    schema = (
        "doc_id long, url string, warc_ts_epoch long, html binary, "
        "text string, lang string, kind string, base_id long"
    )
    return base.mapInPandas(gen, schema=schema).select(
        "doc_id",
        "url",
        F.col("warc_ts_epoch").cast("timestamp").alias("warc_ts"),
        "html",
        "text",
        "lang",
        "kind",
        "base_id",
    )


def truth_pairs(pages: DataFrame) -> DataFrame:
    """(url_a, url_b, kind) — each non-original dup row pairs with its base
    (except 'unrelated'). Derived relationally from the id scheme."""
    dups = pages.where(
        (F.col("kind") != "original") & (F.col("kind") != "unrelated")
    ).select(F.col("url").alias("url_b"), "base_id", "kind")
    bases = pages.where(F.col("kind") == "original").select(
        F.col("url").alias("url_a"), F.col("doc_id").alias("base_id")
    )
    return dups.join(bases, "base_id").select("url_a", "url_b", "kind")


def truth_clusters(pages: DataFrame) -> DataFrame:
    """(url, cluster_id) — transitive closure of truth_pairs is simply the
    base_id for this generator's star-shaped truth."""
    return pages.where(F.col("kind") != "unrelated").select(
        "url", F.col("base_id").alias("cluster_id")
    )
