"""Structured-Streaming variants of the dedup stages.

Incremental ingestion of a pages stream: per-microbatch signature
computation (stateless — the same pandas UDFs as batch), streaming
exact-dedup against an accumulating state store, and a foreachBatch
LSH pass that appends new candidate pairs against the already-indexed
corpus (the standard "stream joined against its own history" shape).

The reference has no streaming surface (SURVEY.md §2.6) — this is the
incremental analogue of create_dictionary_entry's one-row-at-a-time
index maintenance (symspellpy.py:194-256) lifted to document streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from symspellpy_spark.operators.dedup import (
    minhash_signatures,
    normalized_tokens,
    shingles,
    simhash_signatures,
)

__all__ = [
    "stream_signatures",
    "streaming_exact_dedup",
    "run_incremental_lsh",
    "run_incremental_winnowing",
    "streaming_simhash_pairs",
    "compact_band_index",
    "compact_fingerprint_index",
    "index_exists",
]


def stream_signatures(
    pages_stream: DataFrame,
    shingle_k: int = 5,
    num_perm: int = 128,
    seed: int = 1337,
) -> DataFrame:
    """Streaming DF -> streaming DF of (id, shingle_hashes, minhash,
    simhash). Stateless: works under any output mode."""
    toks = normalized_tokens(pages_stream, id_col="url", text_col="text")
    sig = minhash_signatures(shingles(toks, k=shingle_k), num_perm=num_perm, seed=seed)
    return simhash_signatures(sig).select("id", "shingle_hashes", "minhash", "simhash")


def streaming_exact_dedup(
    pages_stream: DataFrame,
    watermark_col: str = "warc_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming aggregation: per text-hash first-seen url + dup count.

    Complete/update-mode aggregation keyed on md5(text); late rows beyond
    the watermark are dropped.
    """
    return (
        pages_stream.withWatermark(watermark_col, watermark)
        .select(F.col("url"), F.md5("text").alias("text_md5"), F.col(watermark_col))
        .groupBy("text_md5")
        .agg(
            F.min("url").alias("first_url"),
            F.count("*").alias("n_seen"),
        )
    )


def streaming_simhash_pairs(
    pages_stream: DataFrame,
    max_hamming: int = 8,
    n_blocks: int | None = None,
    max_bucket_size: int = 512,
    id_col: str = "url",
    text_col: str = "text",
    sig_fn=None,
) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``):
    continuous SimHash near-dup pair detection against the stream's own
    history.

    Each SimHash bit-block bucket keeps the (id, simhash) pairs it has
    seen as group state; every arriving document is compared against
    that state and emits ``(id_a, id_b, hamming)`` rows for pairs inside
    the Hamming ball. Pigeonhole guarantee as in the batch operator
    (``simhash_candidate_pairs``): with ``n_blocks > max_hamming``
    blocks, any qualifying pair shares at least one intact block, so no
    pair is missed while both endpoints' buckets are under
    ``max_bucket_size`` (beyond it the bucket stops growing — the
    streaming analogue of the batch cap). A pair sharing several intact
    blocks is emitted once per such block; dedupe downstream if exact
    multiplicity matters.

    ``sig_fn`` (stream -> (id, simhash) stream, stateless expressions
    only) overrides the default tokenize+simhash stage — the same plug
    point as ``run_incremental_lsh``'s ``signatures_fn``, used to pin
    the exact signature config of a batch run the drained stream must
    converge to.
    """
    if n_blocks is None:
        n_blocks = max_hamming + 1
    width = 64 // n_blocks
    mask = (1 << width) - 1 if width < 64 else -1

    if sig_fn is not None:
        sig = sig_fn(pages_stream)
    else:
        toks = normalized_tokens(pages_stream, id_col=id_col, text_col=text_col)
        sig = simhash_signatures(toks).select("id", "simhash")
    blocks = [
        F.struct(
            F.lit(i).alias("block_id"),
            F.shiftrightunsigned(F.col("simhash"), i * width)
            .bitwiseAND(F.lit(mask))
            .alias("block_value"),
        )
        for i in range(n_blocks)
    ]
    exploded = sig.select(
        "id", "simhash", F.explode(F.array(*blocks)).alias("b")
    ).select(
        "id",
        "simhash",
        F.col("b.block_id").alias("block_id"),
        F.col("b.block_value").alias("block_value"),
    )

    from pyspark.sql.streaming.state import GroupStateTimeout

    # id type follows the signature relation's id column (urls are
    # strings, the pipeline's internal ids are 8-byte longs) — a
    # hardcoded string schema would break the stateful operator at
    # runtime for long ids
    id_type = dict(sig.dtypes)["id"]

    u64 = (1 << 64) - 1

    def detect(key, pdfs, state):
        import numpy as np
        import pandas as pd

        if state.exists:
            ids, sims = state.get
            ids, sims = list(ids), list(sims)
        else:
            ids, sims = [], []
        # vectorized Hamming against the whole bucket state: xor the
        # uint64 signature array, popcount via unpackbits (numpy<2 has
        # no bitwise_count) — O(bucket) numpy per arriving doc instead
        # of a pure-Python compare loop
        arr = np.array(sims, dtype=np.int64).astype(np.uint64)
        id_arr = np.array(ids, dtype=object)
        out = []
        for pdf in pdfs:
            for doc_id, sh in zip(pdf["id"], pdf["simhash"]):
                sh_i = int(sh)
                if len(arr):
                    x = arr ^ np.uint64(sh_i & u64)
                    hd = np.unpackbits(
                        x.view(np.uint8).reshape(-1, 8), axis=1
                    ).sum(axis=1)
                    for j in np.nonzero(hd <= max_hamming)[0]:
                        prev_id = id_arr[j]
                        if prev_id == doc_id:
                            continue
                        a, b = sorted((doc_id, prev_id))
                        out.append((a, b, int(hd[j])))
                if len(ids) < max_bucket_size:
                    ids.append(doc_id)
                    sims.append(sh_i)
                    arr = np.append(arr, np.uint64(sh_i & u64))
                    id_arr = np.append(id_arr, doc_id)
        state.update((ids, sims))
        yield pd.DataFrame(out, columns=["id_a", "id_b", "hamming"])

    return exploded.groupBy("block_id", "block_value").applyInPandasWithState(
        detect,
        outputStructType=f"id_a {id_type}, id_b {id_type}, hamming int",
        stateStructType=f"ids array<{id_type}>, sims array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def index_exists(spark: SparkSession, path: str) -> bool:
    """Explicit history-existence probe (any Hadoop FS scheme)."""
    fs, jpath = _hadoop_fs(spark, path)
    return bool(fs.exists(jpath))


def _swap_index(spark: SparkSession, index_path: str, tmp: str) -> None:
    """Swap a freshly written ``tmp`` dir into place as ``index_path``.

    Protocol: rename the live index ASIDE (never delete-then-rename: a
    crash in that gap would lose the whole index and ``index_exists``
    would silently restart the stream with empty history), rename tmp
    into place, then delete the old dir. Each rename's boolean return
    is checked and a failed swap raises — with a best-effort restore of
    the old index — so a half-swap surfaces loudly instead of reading
    as no-history. (foreachBatch is sequential, so no concurrent reader
    mid-swap.)
    """
    old = index_path.rstrip("/") + "__old"
    fs, jidx = _hadoop_fs(spark, index_path)
    _, jtmp = _hadoop_fs(spark, tmp)
    _, jold = _hadoop_fs(spark, old)
    fs.delete(jold, True)  # leftover from a previously failed compaction
    if not fs.rename(jidx, jold):
        raise IOError(f"_swap_index: rename {index_path} -> {old} failed")
    if not fs.rename(jtmp, jidx):
        restored = fs.rename(jold, jidx)
        raise IOError(
            f"_swap_index: rename {tmp} -> {index_path} failed"
            f" (old index {'restored' if restored else 'LEFT AT ' + old})"
        )
    fs.delete(jold, True)


def compact_band_index(spark: SparkSession, index_path: str, files_per_band: int = 1) -> None:
    """Rewrite the append-only band index into few sorted files.

    Appends accumulate one file set per micro-batch; without compaction
    the per-batch probe pays O(#batches) file listings/opens even though
    the row count is just O(history). Swap via :func:`_swap_index`.
    """
    tmp = index_path.rstrip("/") + "__compact_tmp"
    (
        spark.read.parquet(index_path)
        .repartition(files_per_band * 32, "band_id", "band_hash")
        .sortWithinPartitions("band_id", "band_hash")
        .write.mode("overwrite")
        .parquet(tmp)
    )
    _swap_index(spark, index_path, tmp)


def compact_fingerprint_index(
    spark: SparkSession,
    index_path: str,
    max_bucket_size: int = 1000,
    files: int = 32,
) -> None:
    """Rewrite the append-only winnowing fingerprint index into few
    sorted files, DROPPING fingerprints whose accumulated bucket exceeds
    ``max_bucket_size`` — the streaming enforcement of the batch cap
    semantics (``_bucket_pairs`` drops monster buckets: a fingerprint
    shared by more than ``max_bucket_size`` documents is boilerplate,
    evidence of nothing, and its probe join would otherwise fan out by
    the full bucket size on every micro-batch forever). A dropped
    fingerprint re-accretes from later batches but is re-dropped at the
    next compaction, so a boilerplate bucket's join fan-out is bounded
    to ``compact_every`` epochs of growth rather than the stream's
    lifetime. Swap via :func:`_swap_index`.
    """
    from pyspark.sql import Window

    tmp = index_path.rstrip("/") + "__compact_tmp"
    w = Window.partitionBy("fingerprint")
    (
        spark.read.parquet(index_path)
        .withColumn("_bs", F.count("*").over(w))
        .where(F.col("_bs") <= max_bucket_size)
        .drop("_bs")
        .repartition(files, "fingerprint")
        .sortWithinPartitions("fingerprint")
        .write.mode("overwrite")
        .parquet(tmp)
    )
    _swap_index(spark, index_path, tmp)


def run_incremental_lsh(
    spark: SparkSession,
    pages_stream: DataFrame,
    index_path: str,
    pairs_path: str,
    bands: int = 32,
    num_perm: int = 128,
    checkpoint: str | None = None,
    compact_every: int = 16,
    signatures_fn=None,
    available_now: bool = False,
):
    """foreachBatch driver: each micro-batch's signatures are banded,
    joined against the accumulated band index (parquet), new candidate
    pairs appended, and the batch's bands appended to the index.

    This is the streaming shape of lsh_candidate_pairs: batch-vs-history
    instead of self-join, so each arriving page only pays one probe of
    the existing index (batch side broadcast — history never shuffles),
    plus a batch-internal self-join so same-batch duplicates are not
    missed. History presence is checked explicitly (``index_exists``):
    any read error on an EXISTING index — corruption, schema drift,
    permissions — now fails the batch loudly instead of silently
    dropping all future pairs. Every ``compact_every`` epochs the
    append-only index is compacted (``compact_band_index``) so
    per-batch file-listing cost stops growing with batch count.

    ``signatures_fn`` (batch DataFrame -> (id, minhash) DataFrame)
    overrides the default tokenize+shingle+minhash stage so a caller
    can pin the exact signature config of a batch run it must converge
    to (the drained stream's accumulated pair set equals the batch
    operator's candidate set for the same signatures, batching-
    invariant). ``available_now`` runs with the availableNow trigger:
    process everything already in the source (in maxFilesPerTrigger-
    sized micro-batches), then stop — the drain mode the equivalence
    tests and the contract entry use.
    """
    from symspellpy_spark.operators.dedup import _banded

    def stream_signatures_batch(batch_df: DataFrame, num_perm: int) -> DataFrame:
        toks = normalized_tokens(batch_df, id_col="url", text_col="text")
        return minhash_signatures(shingles(toks, k=5), num_perm=num_perm)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        sess = batch_df.sparkSession
        # a micro-batch arrives partitioned by its source files (often a
        # handful), and the signature stage inherits that — the whole
        # tokenize/shingle/minhash pass then runs on a few cores. The
        # batch is small by construction, so the re-spread shuffle is
        # cheap wherever the guard fires (same treatment as the batch
        # kernels' under-parallelism guards)
        para = sess.sparkContext.defaultParallelism
        if batch_df.rdd.getNumPartitions() < para:
            batch_df = batch_df.repartition(para)
        if signatures_fn is not None:
            sig = signatures_fn(batch_df)
        else:
            sig = stream_signatures_batch(batch_df, num_perm=num_perm)
        # persist + explicit unpersist, NOT localCheckpoint: checkpoint
        # RDD blocks are never context-cleaned in long-lived sessions
        # (see scoped_cache.py), so a per-micro-batch checkpoint accretes
        # executor storage without bound over a stream's lifetime
        banded = _banded(sig.select("id", "minhash"), bands, num_perm).persist()
        try:
            _process_batch(sess, banded, epoch_id)
        finally:
            banded.unpersist()

    def _process_batch(sess, banded, epoch_id: int) -> None:
        probe = F.broadcast(banded)
        within = banded.join(
            probe.select(
                "band_id", "band_hash", F.col("id").alias("id_b")
            ),
            ["band_id", "band_hash"],
        ).where(F.col("id") < F.col("id_b"))
        if index_exists(sess, index_path):
            history = sess.read.parquet(index_path)
            against_history = probe.join(
                history.withColumnRenamed("id", "id_b"),
                ["band_id", "band_hash"],
            ).where(F.col("id") != F.col("id_b"))
            cand = within.unionByName(against_history)
        else:
            cand = within
        new_pairs = (
            cand.select(
                F.least("id", "id_b").alias("id_a"),
                F.greatest("id", "id_b").alias("id_b"),
            )
            .distinct()
        )
        new_pairs.write.mode("append").parquet(pairs_path)
        banded.write.mode("append").parquet(index_path)
        if compact_every and (epoch_id + 1) % compact_every == 0:
            compact_band_index(sess, index_path)

    writer = pages_stream.writeStream.foreachBatch(process)
    if available_now:
        writer = writer.trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def run_incremental_winnowing(
    spark: SparkSession,
    pages_stream: DataFrame,
    index_path: str,
    pairs_path: str,
    k: int = 8,
    window: int = 4,
    id_col: str = "url",
    text_col: str = "text",
    checkpoint: str | None = None,
    compact_every: int = 16,
    max_bucket_size: int = 1000,
    available_now: bool = False,
):
    """foreachBatch driver: the streaming shape of
    :func:`~symspellpy_spark.operators.dedup.winnowing_candidate_pairs`
    — continuous local-match (MOSS) candidate detection against the
    stream's own history.

    Each micro-batch's winnowing fingerprints come out of the doc-local
    Arrow kernel (stateless, no shuffle — one mapInPandas over
    (id, text)), are probed against the accumulated fingerprint index
    (batch side broadcast — history never shuffles) plus a
    batch-internal self-join so same-batch matches are not missed, new
    pairs are appended, and the batch's fingerprints are appended to
    the index. Every ``compact_every`` epochs the index is compacted
    (:func:`compact_fingerprint_index`), which also enforces the
    boilerplate-bucket cap: between compactions a hot fingerprint's
    probe fan-out can transiently exceed ``max_bucket_size`` (bounded
    by ``compact_every`` batches of growth), after which the bucket is
    dropped — the incremental analogue of the batch monster-bucket
    drop. Within a single batch, fingerprints occurring more than
    ``max_bucket_size`` times are dropped before any join.

    The guarantee carried over from batch winnowing: any shared
    substring of length >= window + k - 1 between two documents —
    whether they arrive in the same micro-batch or epochs apart —
    yields a shared fingerprint and hence a candidate pair (while
    neither side's bucket is over the cap).
    """
    from pyspark.sql import Window

    from symspellpy_spark.operators.dedup import winnowing_fingerprints

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        sess = batch_df.sparkSession
        w = Window.partitionBy("fingerprint")
        fps = (
            winnowing_fingerprints(
                batch_df, k=k, window=window, id_col=id_col,
                text_col=text_col, positions=False,
            )
            # positions=False dedups (id, fingerprint) inside the kernel,
            # so no distinct exchange is needed before the bucket cap
            .withColumn("_bs", F.count("*").over(w))
            .where(F.col("_bs") <= max_bucket_size)
            .drop("_bs")
            # persist + explicit unpersist, NOT localCheckpoint (see
            # run_incremental_lsh: checkpoint RDD blocks accrete over a
            # stream's lifetime)
            .persist()
        )
        try:
            _process_batch(sess, fps, epoch_id)
        finally:
            fps.unpersist()

    def _process_batch(sess, fps: DataFrame, epoch_id: int) -> None:
        probe = F.broadcast(fps)
        within = fps.join(
            probe.select("fingerprint", F.col("id").alias("id_b")),
            ["fingerprint"],
        ).where(F.col("id") < F.col("id_b"))
        if index_exists(sess, index_path):
            history = sess.read.parquet(index_path)
            against_history = probe.join(
                history.withColumnRenamed("id", "id_b"), ["fingerprint"]
            ).where(F.col("id") != F.col("id_b"))
            cand = within.unionByName(against_history)
        else:
            cand = within
        new_pairs = cand.select(
            F.least("id", "id_b").alias("id_a"),
            F.greatest("id", "id_b").alias("id_b"),
        ).distinct()
        new_pairs.write.mode("append").parquet(pairs_path)
        fps.write.mode("append").parquet(index_path)
        if compact_every and (epoch_id + 1) % compact_every == 0:
            compact_fingerprint_index(
                sess, index_path, max_bucket_size=max_bucket_size
            )

    writer = pages_stream.writeStream.foreachBatch(process)
    if available_now:
        writer = writer.trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
