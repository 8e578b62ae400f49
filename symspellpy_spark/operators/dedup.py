"""Near-duplicate detection operators (the north-star pipeline stages).

All stages are DataFrame -> DataFrame; per-row heavy math is Arrow-
vectorized (numpy over whole batches), everything else is Catalyst.
No analogue in the reference (SURVEY.md §2.6) — SymSpell's delete-key
index plays the candidate-generation *role* these stages play for
documents; its lookup/verify split (candidates -> distance verify ->
verbosity rank) is the template for candidates -> similarity verify ->
threshold here.

Scale notes (100 TB):
- token/shingle hashing is ``xxhash64`` JVM-side; the Python boundary
  only ever sees fixed-width ``array<long>`` columns;
- MinHash is one pandas UDF over the per-doc hash array (no explode, no
  shuffle); banding explodes to b rows/doc only;
- within-bucket pairing is capped (``max_bucket_size``) and dropped
  buckets are observable via ``lsh_bucket_stats`` — the O(b²) blowup
  control the north rule demands;
- SimHash Hamming probing explodes 64-bit signatures into
  ``n_blocks`` block keys; verification is ``bit_count(xor)`` —
  whole-stage codegen, no UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import ArrayType, LongType

__all__ = [
    "normalized_tokens",
    "shingles",
    "combined_signatures",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "lsh_bucket_stats",
    "simhash_signatures",
    "simhash_candidate_pairs",
    "substring_fingerprint_pairs",
    "exact_duplicates",
    "jaccard_verify",
    "select_matches",
]

_MERSENNE31 = (1 << 31) - 1


def normalized_tokens(
    docs: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """(id, tokens array<string>) — whitespace/word tokenization, lowered.

    The dictionary-correction variant (SymSpell normalization of noisy
    tokens before shingling) lives in plans/pipeline.py where a
    dictionary is in scope.
    """
    src = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    return docs.select(
        F.col(id_col).alias("id"),
        F.regexp_extract_all(src, F.lit(r"(?U)[\w'’]+"), 0).alias("tokens"),
    )


def shingles(
    tokens: DataFrame, k: int = 5, tokens_col: str = "tokens"
) -> DataFrame:
    """Add ``shingle_hashes array<long>``: distinct xxhash64 of k-token
    shingles (JVM-side; docs shorter than k get one whole-doc shingle)."""
    t = F.col(tokens_col)
    n = F.size(t)
    # hash the k-token slice DIRECTLY (xxhash64 chains element hashes) —
    # no shingle-string materialization: building tens of millions of
    # joined strings per batch is pure JVM allocation/GC traffic, and GC
    # contention is what breaks multi-core scaling for this stage
    shingle_hashes = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - k + 1),
            lambda i: F.xxhash64(F.slice(t, i, k)),
        ),
    ).otherwise(F.array(F.xxhash64(t)))
    return tokens.withColumn("shingle_hashes", F.array_distinct(shingle_hashes))


def _minhash_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE31, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE31, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(
    df: DataFrame,
    num_perm: int = 128,
    seed: int = 1337,
    hashes_col: str = "shingle_hashes",
) -> DataFrame:
    """Add ``minhash array<long>`` (num_perm 31-bit values).

    h_k(doc) = min over shingles of (a_k * (x mod M31) + b_k) mod M31 —
    the universal-hash family over a Mersenne prime; a_k*x + b_k stays
    < 2^62 so plain uint64 arithmetic is exact. Vectorized as one
    (num_perm x n_shingles) numpy broadcast per document.
    """
    a, b = _minhash_params(num_perm, seed)

    @F.pandas_udf(ArrayType(LongType()))
    def _minhash(hashes: pd.Series) -> pd.Series:
        # whole-batch vectorization: flatten every doc's hash array into
        # one vector, apply each permutation to the flat vector, and take
        # per-doc minima with minimum.reduceat — the Python-level loop is
        # over permutation CHUNKS (8 iterations), not documents.
        n_docs = len(hashes)
        empty = np.full(num_perm, _MERSENNE31, dtype=np.int64)
        arrs = [
            np.asarray(x, dtype=np.int64) if x is not None else np.empty(0, np.int64)
            for x in hashes
        ]
        lens = np.fromiter((len(x) for x in arrs), dtype=np.int64, count=n_docs)
        if lens.sum() == 0:
            return pd.Series([empty.tolist()] * n_docs, index=hashes.index)
        nonempty = lens > 0
        flat = np.concatenate([x for x in arrs if len(x)]).astype(np.uint64)
        flat %= _MERSENNE31
        starts = np.zeros(int(nonempty.sum()), dtype=np.int64)
        np.cumsum(lens[nonempty][:-1], out=starts[1:])
        sig = np.empty((num_perm, len(starts)), dtype=np.uint64)
        chunk = 16
        for i in range(0, num_perm, chunk):
            vals = (a[i : i + chunk, None] * flat[None, :] + b[i : i + chunk, None]) % _MERSENNE31
            sig[i : i + chunk] = np.minimum.reduceat(vals, starts, axis=1)
        out = np.tile(empty, (n_docs, 1))
        out[nonempty] = sig.T.astype(np.int64)
        return pd.Series(list(out.tolist()), index=hashes.index)

    return df.withColumn("minhash", _minhash(F.col(hashes_col)))


def combined_signatures(
    df: DataFrame,
    num_perm: int = 128,
    seed: int = 1337,
    hashes_col: str = "shingle_hashes",
) -> DataFrame:
    """Add ``minhash array<long>`` AND ``simhash long`` in ONE fused
    pandas UDF — a single Arrow crossing for the (wide) shingle-hash
    arrays instead of two chained UDF stages. Semantics identical to
    minhash_signatures + simhash_signatures(hashes_col=...).
    """
    from pyspark.sql.types import StructField, StructType

    a, b = _minhash_params(num_perm, seed)
    out_type = StructType(
        [
            StructField("minhash", ArrayType(LongType())),
            StructField("simhash", LongType()),
        ]
    )

    @F.pandas_udf(out_type)
    def _sig(hashes: pd.Series) -> pd.DataFrame:
        n_docs = len(hashes)
        empty_mh = np.full(num_perm, _MERSENNE31, dtype=np.int64)
        arrs = [
            np.asarray(x, dtype=np.int64) if x is not None else np.empty(0, np.int64)
            for x in hashes
        ]
        lens = np.fromiter((len(x) for x in arrs), dtype=np.int64, count=n_docs)
        mh_out = np.tile(empty_mh, (n_docs, 1))
        sh_out = np.zeros(n_docs, dtype=np.int64)
        if lens.sum() > 0:
            nonempty = lens > 0
            ne_idx = np.flatnonzero(nonempty)
            ne_lens = lens[nonempty]
            flat_all = np.concatenate([x for x in arrs if len(x)]).astype(np.uint64)
            offs = np.zeros(len(ne_idx) + 1, dtype=np.int64)
            np.cumsum(ne_lens, out=offs[1:])
            # Work in blocks of documents whose flattened hashes stay
            # under ~1M elements: the (16, n_flat) permutation temp is
            # then <=128MB, keeping per-worker memory flat no matter how
            # many workers run concurrently (memory churn, not CPU, is
            # what breaks multi-core scaling for this kernel).
            FLAT_BLOCK = 1 << 20
            d0 = 0
            while d0 < len(ne_idx):
                d1 = d0 + 1
                while d1 < len(ne_idx) and offs[d1 + 1] - offs[d0] <= FLAT_BLOCK:
                    d1 += 1
                flat_raw = flat_all[offs[d0] : offs[d1]]
                starts = (offs[d0:d1] - offs[d0]).astype(np.int64)
                # minhash
                flat = flat_raw % _MERSENNE31
                sig = np.empty((num_perm, d1 - d0), dtype=np.uint64)
                for i in range(0, num_perm, 16):
                    vals = (
                        a[i : i + 16, None] * flat[None, :] + b[i : i + 16, None]
                    ) % _MERSENNE31
                    sig[i : i + 16] = np.minimum.reduceat(vals, starts, axis=1)
                mh_out[ne_idx[d0:d1]] = sig.T.astype(np.int64)
                # simhash
                sh = np.zeros(d1 - d0, dtype=np.uint64)
                half = ne_lens[d0:d1].astype(np.float64) / 2.0
                for bit in range(64):
                    ones = ((flat_raw >> np.uint64(bit)) & np.uint64(1)).astype(
                        np.int64
                    )
                    sh |= (np.add.reduceat(ones, starts) > half).astype(
                        np.uint64
                    ) << np.uint64(bit)
                sh_out[ne_idx[d0:d1]] = sh.astype(np.int64)
                d0 = d1
        return pd.DataFrame(
            {"minhash": list(mh_out.tolist()), "simhash": sh_out}
        )

    return df.withColumn("_sig", _sig(F.col(hashes_col))).select(
        "*", F.col("_sig.minhash").alias("minhash"), F.col("_sig.simhash").alias("simhash")
    ).drop("_sig")


def _bucket_pairs(
    exploded: DataFrame,
    bucket_cols: list[str],
    member_col,
    max_bucket_size: int,
) -> DataFrame:
    """Within-bucket pair generation: (id_a, id_b) for every unordered
    member pair of each bucket with 1 < size <= max_bucket_size.

    Shape chosen for 100 TB: ONE hash shuffle on the bucket key feeds a
    window count (drops monster buckets BEFORE anything is collected),
    then a same-key groupBy (partitioning + sort already satisfied -> no
    second exchange) collects the capped member list and explodes the
    i<j combinations. No bucket-size side relation, no self-join — the
    join-based formulation tempts AQE into broadcasting a corpus-scale
    per-key count table, which serializes on the driver (and on a real
    cluster would ship the whole thing to every executor).

    ``member_col`` may be a string column name or a struct Column; pairs
    are ordered by the struct's first field (ids sorted within bucket).
    """
    member = F.col(member_col) if isinstance(member_col, str) else member_col
    w = Window.partitionBy(*bucket_cols)
    capped = (
        exploded.select(*bucket_cols, member.alias("_m"))
        .withColumn("_bs", F.count("*").over(w))
        .where((F.col("_bs") > 1) & (F.col("_bs") <= max_bucket_size))
    )
    buckets = capped.groupBy(*bucket_cols).agg(
        F.sort_array(F.collect_list("_m")).alias("_ms")
    )
    ms = F.col("_ms")
    pairs = F.flatten(
        F.transform(
            ms,
            lambda x, i: F.transform(
                F.slice(ms, i + F.lit(2), F.size(ms)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return buckets.select(F.explode(pairs).alias("_p")).select(
        F.col("_p.a").alias("id_a"), F.col("_p.b").alias("id_b")
    )


def _band_keys(num_perm: int, bands: int):
    rows = num_perm // bands
    # xxhash64 over the long-array slice itself — fixed-width, no string
    # rendering of 128-long signatures per band
    return [
        F.struct(
            F.lit(i).alias("band_id"),
            F.xxhash64(F.slice(F.col("minhash"), i * rows + 1, rows)).alias(
                "band_hash"
            ),
        )
        for i in range(bands)
    ]


def _banded(df: DataFrame, bands: int, num_perm: int) -> DataFrame:
    return df.select(
        "id",
        F.explode(F.array(*_band_keys(num_perm, bands))).alias("band"),
    ).select("id", F.col("band.band_id").alias("band_id"), F.col("band.band_hash").alias("band_hash"))


def lsh_bucket_stats(
    signatures: DataFrame, bands: int = 32, num_perm: int = 128
) -> DataFrame:
    """(band_id, band_hash, bucket_size) — observability for skew/caps."""
    return (
        _banded(signatures, bands, num_perm)
        .groupBy("band_id", "band_hash")
        .agg(F.count("*").alias("bucket_size"))
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 32,
    num_perm: int = 128,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """(id_a, id_b) candidate pairs from MinHash LSH banding.

    Within-bucket pairing is a self-join on (band_id, band_hash); buckets
    larger than ``max_bucket_size`` are dropped (boilerplate-heavy hot
    bands — observable via :func:`lsh_bucket_stats`); pairs reached in
    several bands are deduplicated.
    """
    banded = _banded(signatures, bands, num_perm)
    return (
        _bucket_pairs(banded, ["band_id", "band_hash"], "id", max_bucket_size)
        .select("id_a", "id_b")
        .distinct()
    )


def simhash_signatures(
    tokens: DataFrame,
    tokens_col: str = "tokens",
    hashes_col: str | None = None,
) -> DataFrame:
    """Add ``simhash long``: 64-bit sign-sum fingerprint.

    Inputs are either raw tokens (``tokens_col``; hashed JVM-side with
    xxhash64) or an existing ``array<long>`` hash column (``hashes_col``
    — e.g. shingle hashes). Prefer SHINGLE hashes for near-dup work:
    unigram-token SimHash collapses on topically uniform corpora (every
    doc drawn from the same vocabulary lands Hamming-close), while
    shingle SimHash requires shared word order. The UDF unpacks bits
    and sign-sums with one numpy op per batch.
    """
    if hashes_col is not None:
        hashed = tokens.withColumn("_tok_hashes", F.col(hashes_col))
    else:
        hashed = tokens.withColumn(
            "_tok_hashes",
            F.transform(F.col(tokens_col), lambda t: F.xxhash64(t)),
        )

    @F.pandas_udf(LongType())
    def _simhash(hashes: pd.Series) -> pd.Series:
        # whole-batch: per-doc bit votes via add.reduceat over the
        # flattened bit matrix; Python loop only over 64 bit positions.
        n_docs = len(hashes)
        out = np.zeros(n_docs, dtype=np.int64)
        arrs = [
            np.asarray(x, dtype=np.int64) if x is not None else np.empty(0, np.int64)
            for x in hashes
        ]
        lens = np.fromiter((len(x) for x in arrs), dtype=np.int64, count=n_docs)
        if lens.sum() == 0:
            return pd.Series(out, index=hashes.index)
        nonempty = lens > 0
        flat = np.concatenate([x for x in arrs if len(x)]).astype(np.uint64)
        starts = np.zeros(int(nonempty.sum()), dtype=np.int64)
        np.cumsum(lens[nonempty][:-1], out=starts[1:])
        sig = np.zeros(len(starts), dtype=np.uint64)
        half = lens[nonempty].astype(np.float64) / 2.0
        for bit in range(64):
            ones = ((flat >> np.uint64(bit)) & np.uint64(1)).astype(np.int64)
            per_doc_ones = np.add.reduceat(ones, starts)
            # votes > 0  <=>  ones > len/2
            sig |= (per_doc_ones > half).astype(np.uint64) << np.uint64(bit)
        out[nonempty] = sig.astype(np.int64)
        return pd.Series(out, index=hashes.index)

    return hashed.withColumn("simhash", _simhash(F.col("_tok_hashes"))).drop(
        "_tok_hashes"
    )


def simhash_candidate_pairs(
    signatures: DataFrame,
    max_hamming: int = 3,
    n_blocks: int | None = None,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with Hamming(simhash) <= max_hamming.

    Pigeonhole probing: split 64 bits into n_blocks (> max_hamming)
    blocks; any pair within the Hamming ball shares at least one intact
    block -> equi-join on (block_id, block_value), verify with
    bit_count(xor) — all whole-stage codegen.
    """
    if n_blocks is None:
        n_blocks = max_hamming + 1
    width = 64 // n_blocks
    blocks = [
        F.struct(
            F.lit(i).alias("block_id"),
            F.shiftrightunsigned(F.col("simhash"), i * width)
            .bitwiseAND(F.lit((1 << width) - 1) if width < 64 else F.lit(-1))
            .alias("block_value"),
        )
        for i in range(n_blocks)
    ]
    exploded = signatures.select(
        "id", F.col("simhash"), F.explode(F.array(*blocks)).alias("b")
    ).select(
        "id", "simhash", F.col("b.block_id").alias("block_id"), F.col("b.block_value").alias("block_value")
    )
    pairs = _bucket_pairs(
        exploded,
        ["block_id", "block_value"],
        F.struct(F.col("id"), F.col("simhash")),
        max_bucket_size,
    )
    return (
        pairs.select(
            F.col("id_a.id").alias("id_a"),
            F.col("id_b.id").alias("id_b"),
            F.bit_count(
                F.col("id_a.simhash").bitwiseXOR(F.col("id_b.simhash"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def substring_fingerprint_pairs(
    docs: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    gram_len: int = 40,
    sample_mod: int = 8,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """(id_a, id_b, shared_grams) — exact-substring dup candidates.

    Content-defined sampling (position-independent, unlike strided
    sampling): every char gram_len-gram is hashed with a polynomial
    window hash (computed for ALL positions at once via a numpy
    sliding-window matmul in uint64 mod-2^64 arithmetic), and only
    grams with ``hash % sample_mod == 0`` are kept. Identical
    substrings sample identical grams regardless of their offset, so a
    common substring of m chars collides with
    P ≈ 1 - (1-1/s)^(m-gram_len). Only the ~1/sample_mod sampled gram
    hashes cross the Arrow boundary and reach the shuffle.
    """
    base = 1099511628211  # FNV-prime multiplier (odd -> good mixing mod 2^64)
    mod = np.uint64(sample_mod)
    # prefix-product machinery: h_p = sum_j c[p+j]*base^(L-1-j)  (mod 2^64)
    #                               = base^(L-1+p) * (T[p+L] - T[p])
    # with T[k] = sum_{i<k} c[i]*inv^i and inv = base^-1 mod 2^64 (base is
    # odd, so invertible). One cumsum + O(1) work per window replaces the
    # L strided multiply-add passes of the naive kernel — ~30x less
    # memory traffic, which is what decides multi-core scaling here.
    PBLK = 1 << 20
    inv = pow(base, -1, 1 << 64)
    _pow_tab = np.empty(PBLK, dtype=np.uint64)
    _inv_tab = np.empty(PBLK, dtype=np.uint64)
    _pow_tab[0] = 1
    _inv_tab[0] = 1
    np.multiply.accumulate(
        np.full(PBLK - 1, base, dtype=np.uint64), out=_pow_tab[1:]
    )
    np.multiply.accumulate(
        np.full(PBLK - 1, np.uint64(inv), dtype=np.uint64), out=_inv_tab[1:]
    )
    pow_blk = np.uint64(pow(base, PBLK, 1 << 64))
    inv_blk = np.uint64(pow(inv, PBLK, 1 << 64))
    base_lm1 = np.uint64(pow(base, gram_len - 1, 1 << 64))

    @F.pandas_udf(ArrayType(LongType()))
    def sampled_grams(texts: pd.Series) -> pd.Series:
        # whole-batch: concatenate all docs' char codes, compute every
        # window hash via the prefix-sum identity above (hash values are
        # identical to the direct polynomial), mask out windows that
        # cross document boundaries, then scatter sampled hashes back to
        # their documents via searchsorted.
        n_docs = len(texts)
        codes_list = []
        lens = np.zeros(n_docs, dtype=np.int64)
        for i, t in enumerate(texts):
            if t is None:
                continue
            c = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
            lens[i] = len(c)
            codes_list.append(c)
        total = int(lens.sum())
        if total < gram_len:
            return pd.Series([[] for _ in range(n_docs)], index=texts.index)
        flat = np.concatenate(codes_list)  # uint32; upcast per block only
        starts = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        n_win = total - gram_len + 1
        # T[k] = sum_{i<k} c[i]*inv^i (mod 2^64), built blockwise so the
        # inv^i table stays cache-resident
        T = np.empty(total + 1, dtype=np.uint64)
        T[0] = 0
        scale = np.uint64(1)
        for w0 in range(0, total, PBLK):
            w1 = min(w0 + PBLK, total)
            T[w0 + 1 : w1 + 1] = (
                flat[w0:w1].astype(np.uint64) * (_inv_tab[: w1 - w0] * scale)
            )
            # scalar uint64 overflow warns in numpy; wrap via Python ints
            scale = np.uint64((int(scale) * int(inv_blk)) & 0xFFFFFFFFFFFFFFFF)
        np.cumsum(T, out=T)
        pos_parts, val_parts = [], []
        scale = base_lm1
        for w0 in range(0, n_win, PBLK):
            w1 = min(w0 + PBLK, n_win)
            hb = (_pow_tab[: w1 - w0] * scale) * (
                T[w0 + gram_len : w1 + gram_len] - T[w0:w1]
            )
            scale = np.uint64((int(scale) * int(pow_blk)) & 0xFFFFFFFFFFFFFFFF)
            sel = np.flatnonzero(hb % mod == 0)
            if sel.size:
                pos_parts.append(sel + w0)
                val_parts.append(hb[sel])
        if not pos_parts:
            return pd.Series([[] for _ in range(n_docs)], index=texts.index)
        pos = np.concatenate(pos_parts)
        vals_u = np.concatenate(val_parts)
        # a window at global position p belongs to doc i iff it lies
        # fully inside [starts[i], starts[i]+lens[i]-gram_len]
        doc_idx = np.searchsorted(starts, pos, side="right") - 1
        valid = pos <= starts[doc_idx] + lens[doc_idx] - gram_len
        doc_idx = doc_idx[valid]
        vals = vals_u[valid].astype(np.int64)
        out = [[] for _ in range(n_docs)]
        bounds = np.searchsorted(doc_idx, np.arange(n_docs + 1))
        for i in range(n_docs):
            seg = vals[bounds[i] : bounds[i + 1]]
            if len(seg):
                out[i] = np.unique(seg).tolist()
        return pd.Series(out, index=texts.index)

    grams = (
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
        .where(F.length("_t") >= gram_len)
        .select("id", F.explode(sampled_grams(F.col("_t"))).alias("g"))
    )
    return (
        _bucket_pairs(grams, ["g"], "id", max_bucket_size)
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared_grams"))
    )


def exact_duplicates(
    docs: DataFrame, id_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """(id, group_id, n_dups) for byte-identical texts — hash groupBy.

    group_id = min id in the group; only groups with >1 member returned.
    """
    h = docs.select(
        F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("text_md5")
    )
    groups = h.groupBy("text_md5").agg(
        F.min("id").alias("group_id"), F.count("*").alias("n_dups")
    )
    return (
        h.join(groups.where(F.col("n_dups") > 1), "text_md5")
        .select("id", "group_id", "n_dups")
    )


def jaccard_verify(
    pairs: DataFrame,
    signatures: DataFrame,
    threshold: float = 0.7,
    hashes_col: str = "shingle_hashes",
    minhash_prefilter_margin: float | None = 0.2,
) -> DataFrame:
    """Verify candidate pairs with *exact* shingle-set Jaccard.

    Joins the (distinct-shingle-hash) arrays back onto the pairs and
    computes |A∩B| / |A∪B| with array_intersect/array_union — JVM-side,
    no UDF. The SymSpell analogue is the post-candidate distance verify
    (symspellpy.py:582-584) with to_similarity thresholding
    (helpers.py:253-265).

    When the signatures carry a ``minhash`` column and
    ``minhash_prefilter_margin`` is set, pairs whose MinHash Jaccard
    *estimate* falls below ``threshold - margin`` are discarded before
    the exact verify. The estimate is a zip_with equality count over the
    (much smaller) 128-long signature, so candidate floods (e.g. SimHash
    Hamming-close but Jaccard-far pairs on topically uniform corpora)
    never reach the expensive array intersection. Chernoff bound at
    margin 0.2 / 128 perms: P(drop | true j >= threshold) < 4e-5 —
    inside the 0.99-recall budget.
    """
    use_prefilter = (
        minhash_prefilter_margin is not None and "minhash" in signatures.columns
    )
    # The pairs relation is narrow (two ids) but the joined relation is
    # wide (signature arrays), and the per-row intersect/union work is
    # the stage's real cost. AQE sizes the post-shuffle partitioning
    # from the NARROW pre-join bytes and would coalesce to one or two
    # partitions, serializing the verify — force a row-balanced
    # partitioning first.
    spark = pairs.sparkSession
    pairs = pairs.repartition(spark.sparkContext.defaultParallelism * 2, "id_a")
    cols = ["id", hashes_col] + (["minhash"] if use_prefilter else [])
    sig = signatures.select(*cols)
    a = sig.select(
        F.col("id").alias("id_a"),
        F.col(hashes_col).alias("_ha"),
        *([F.col("minhash").alias("_ma")] if use_prefilter else []),
    )
    b = sig.select(
        F.col("id").alias("id_b"),
        F.col(hashes_col).alias("_hb"),
        *([F.col("minhash").alias("_mb")] if use_prefilter else []),
    )
    joined = pairs.join(a, "id_a").join(b, "id_b")
    if use_prefilter:
        est = F.aggregate(
            F.zip_with("_ma", "_mb", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, v: acc + v,
        ) / F.size("_ma")
        joined = joined.where(
            est >= F.lit(threshold - minhash_prefilter_margin)
        ).drop("_ma", "_mb")
    return (
        joined.withColumn(
            "jaccard",
            F.size(F.array_intersect("_ha", "_hb"))
            / F.size(F.array_union("_ha", "_hb")),
        )
        .drop("_ha", "_hb")
        .where(F.col("jaccard") >= threshold)
    )


def select_matches(
    verified_pairs: DataFrame,
    verbosity=None,
    score_col: str = "jaccard",
    id_col: str = "id_a",
) -> DataFrame:
    """Verbosity-style selection of verified matches per document
    (reference Verbosity semantics, verbosity.py:24-38, transplanted to
    pair verification): TOP keeps the single best match per ``id_col``,
    CLOSEST keeps all matches tied at the best score, ALL keeps every
    verified match.
    """
    from pyspark.sql import Window

    from symspellpy_spark.config import Verbosity

    if verbosity is None:
        verbosity = Verbosity.ALL
    if verbosity == Verbosity.ALL:
        return verified_pairs
    w = Window.partitionBy(id_col)
    if verbosity == Verbosity.TOP:
        ranked = verified_pairs.withColumn(
            "__rn",
            F.row_number().over(
                w.orderBy(F.col(score_col).desc(), F.col("id_b").asc())
            ),
        )
        return ranked.where(F.col("__rn") == 1).drop("__rn")
    # CLOSEST: all matches at the maximal score
    return (
        verified_pairs.withColumn("__best", F.max(score_col).over(w))
        .where(F.col(score_col) == F.col("__best"))
        .drop("__best")
    )
