"""Deduplication operators: exact → fingerprint → fuzzy (MinHash/SimHash).

Design rules for 100 TB:
- **Never all-pairs.** Every fuzzy family generates *candidate pairs* by
  joining on a bucketing key (band signature / fingerprint chunk / shared
  token), so the shuffle is keyed and skew is bounded by bucket size; the
  exact similarity is then verified only on candidates.
- **Exact dedup is one keyed shuffle**: ``groupBy(fingerprint)`` compiles
  to partial+final HashAggregate (map-side combined).
- All hashing uses ``xxhash64`` (JVM-side).  The Python touchpoints are
  the Arrow-vectorized signature folds
  (:func:`minhash_signature_vectorized`, :func:`simhash_vectorized`) —
  Spark evaluates higher-order-function lambdas interpreted (no
  codegen), so a numpy matrix fold beats the interpreted per-token
  array passes by ~10x; the integer math is exact and bit-identical to
  the JVM expression forms (differential-tested).
- **Pin lifetime**: the fuzzy builders ``persist()`` internal frames
  (signatures, counted buckets) so multi-consumer plans compute them
  once.  Each builder releases the pins of its own PREVIOUS invocation
  (one live generation per operator — see ``_fresh_pins``), and
  :func:`release_pins` drops everything; a long-lived session calling
  these per batch therefore holds at most one generation per operator
  (or run the streaming admission path, which manages its own
  per-batch checkpoints).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sql_autoloader_spark.functions.text import (
    bind_once,
    fingerprint_md5,
    tokens,
    word_shingles,
)

# The 31-bit Mersenne prime: with h folded into [0, p) and a, b < p the
# permutation product a*h < 2^62 stays inside int64 even under ANSI
# overflow checking (a 61-bit prime would overflow the multiply).
_MERSENNE31 = (1 << 31) - 1

# -- persist-pin lifetime (round 16, guide §5) -------------------------------
#
# The fuzzy builders persist() internal frames (signatures, banded
# buckets, counted buckets) so multi-consumer plans compute them once.
# The RESULT frame is lazy — the pins must outlive the builder call and
# survive until the caller's action — so they cannot be released inside
# the builder.  Without any release, a long-lived session issuing these
# per batch accumulates dead cache in the session CacheManager and
# forces eviction churn at scale.  The registry below bounds that to ONE
# live generation per operator: each new invocation releases the
# previous invocation's pins, and :func:`release_pins` drops everything
# (for callers that know their actions are done).  Unpersist only drops
# the cache — a late consumer of an old frame recomputes correctly, so
# even two THREADS racing the same operator (one rotating the other's
# pins away mid-query) degrade to recompute, never to wrong results.
# No registered query calls the same pinned operator twice in one
# composed plan (statically checked in r16).

_PIN_REGISTRY: dict[str, list[DataFrame]] = {}


def _fresh_pins(op: str) -> list[DataFrame]:
    """Release the previous invocation's pins for *op*; return (and
    register) the list the new invocation should append its pins to."""
    for f in _PIN_REGISTRY.pop(op, []):
        try:
            f.unpersist()
        except Exception:  # noqa: BLE001, S110 — session may be gone
            pass
    pins: list[DataFrame] = []
    _PIN_REGISTRY[op] = pins
    return pins


def release_pins() -> None:
    """Release every internal persist() pin the fuzzy builders (here and
    in :mod:`similarity`) have recorded.  Safe at any time: downstream
    frames recompute from lineage if re-executed after release."""
    for op in list(_PIN_REGISTRY):
        for f in _PIN_REGISTRY.pop(op, []):
            try:
                f.unpersist()
            except Exception:  # noqa: BLE001, S110 — session may be gone
                pass


def spread_for_compute(df: DataFrame, *, barrier: bool = True) -> DataFrame:
    """Repartition a frame whose partition count is far below the
    cluster's parallelism before a CPU-bound per-row stage.

    Parquet splits are sized by bytes (``maxPartitionBytes``), so a
    small-but-compute-heavy input (short docs, expensive hashing) can
    arrive as one split and serialize the whole signature stage onto
    one core.  The shuffle moved here is the *raw* rows — far cheaper
    than computing signatures single-threaded.  No-op when the input is
    already reasonably split (the 100 TB case: thousands of splits).

    The probe uses ``inputFiles()`` (pure metadata) rather than
    ``df.rdd.getNumPartitions()`` — under AQE the latter finalizes the
    physical plan and *executes* upstream shuffle stages just to read a
    count, and that work is not reused by the real query.  A derived
    frame with upstream shuffles reports its source files here; if it
    was shuffled it already carries ``spark.sql.shuffle.partitions``
    parallelism, and the repartition this would add is a no-op-sized
    shuffle of raw rows either way.
    """
    try:
        target = df.sparkSession.sparkContext.defaultParallelism
    except Exception:  # noqa: BLE001 — Connect sessions have no context
        from sql_autoloader_spark.functions.scale import shuffle_partitions

        target = shuffle_partitions(df)
    files = df.inputFiles()
    if not (0 < len(files) * 2 <= target):
        return df
    if not barrier:
        return df.repartition(target)
    # The lazy localCheckpoint is a predicate-pushdown BARRIER, not
    # just a cache: Catalyst pushes deterministic filters below a
    # bare Repartition into the file scan, so a caller's expensive
    # computed-column filter (quality scores, trigram counts) would
    # run inside the original single-split scan task and the
    # repartition would parallelize nothing.  The pin is released when
    # the frame is garbage-collected (ContextCleaner); at real scale
    # the branch never fires and filters push into the many-split scan
    # exactly as they should.  Split count does not bound bytes, so a
    # few huge files fall back to the bare repartition (no pin) — only
    # the caller's own filters lose the barrier there.
    if _local_bytes(files) > _BARRIER_PIN_MAX_BYTES:
        return df.repartition(target)
    return df.repartition(target).localCheckpoint(eager=False)


#: pin cap for the spread barrier: inputs above this skip the
#: localCheckpoint (1 GiB — far above every fixture, far below trouble)
_BARRIER_PIN_MAX_BYTES = 1 << 30


def _local_bytes(files: list[str]) -> int:
    """Total size of local ``file:`` inputs; unknown schemes count 0
    (falls back to pinning — remote stores imply a real cluster where
    the spread branch rarely fires at all)."""
    import os

    total = 0
    for f in files:
        path = f.removeprefix("file:")
        if "://" in f and not f.startswith("file:"):
            continue
        try:
            total += os.path.getsize(path)
        except OSError:
            continue
    return total


def exact_dedup(
    df: DataFrame, subset: list[str], *, id_col: str, hash_key: bool = False
) -> DataFrame:
    """Keep exactly one row (minimal *id_col*) per distinct *subset* value.

    ``min_by`` keeps the whole row in one aggregation pass — one shuffle
    on the dedup key, no self-join, no window (a window over the key would
    shuffle identically but sort within groups for no benefit).

    ``hash_key=True`` groups on the SHA-256 of the subset's JSON
    encoding instead of the raw values: the shuffle KEY drops from full
    document bytes to 32 B/row — the 100 TB path when the dedup column
    is the document text itself (the payload columns still shuffle;
    the key no longer doubles them).  ``to_json(struct(...))`` is an
    injective canonical encoding (escaped, null-omitting but
    column-name-tagged), so groups are identical up to SHA-256
    collisions (~n²/2²⁵⁷ — below hardware error rates).
    """
    if hash_key:
        def canon(c: str) -> Column:
            # Spark's groupBy NORMALIZES float keys (-0.0 folds into
            # 0.0; NaNs compare equal) but a textual encoding would
            # keep them distinct — canonicalize so both paths group
            # identically.  (All NaNs already serialize to one text.)
            dt = df.schema[c].dataType.simpleString()
            col = F.col(c)
            if dt in ("float", "double"):
                return F.when(col == F.lit(0.0), F.lit(0.0).cast(dt)).otherwise(col)
            return col

        key = F.sha2(
            F.to_json(F.struct(*[canon(c).alias(c) for c in subset])), 256
        )
        aggs = [F.min(id_col).alias(id_col)] + [
            F.min_by(c, id_col).alias(c)
            for c in df.columns
            if c != id_col
        ]
        return (
            df.groupBy(key.alias("__dedup_key"))
            .agg(*aggs)
            .select(*df.columns)
        )
    others = [c for c in df.columns if c not in subset]
    aggs = [F.min(id_col).alias(id_col)] + [
        F.min_by(c, id_col).alias(c) for c in others if c != id_col
    ]
    return df.groupBy(*subset).agg(*aggs).select(*df.columns)


def fingerprint_dedup_stats(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Group documents by normalized-text fingerprint.

    Returns ``(fp, keep_id, n_copies)`` — the survivor id plus duplicate
    count per fingerprint. One keyed shuffle; the md5 fingerprint (32-hex)
    is the shuffle key, so data volume after the map side is ~48 bytes/doc
    regardless of document size.

    The normalization+hash is the CPU; spread it across cores first —
    a single-file (or single-row-group) corpus otherwise serializes the
    whole regex pass onto one scan task (no-op at real scale).
    ``barrier=False``: nothing downstream filters a computed column, so
    the checkpoint barrier would only materialize the raw documents
    into executor storage for no pushdown protection — a plain
    repartition hashes them straight off the shuffle (x10: 0.88 →
    0.71 s, and no corpus-sized cache write at real scale).
    """
    return (
        spread_for_compute(
            df.select(id_col, text_col), barrier=False
        ).select(
            fingerprint_md5(F.col(text_col)).alias("fp"),
            F.col(id_col),
        )
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        )
    )


def token_jaccard_pairs(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    threshold: float,
    shingle_words: int = 1,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact Jaccard similarity over token (or word-shingle) *sets* for
    every document pair sharing at least one token.

    Returns ``(id_a, id_b, jaccard)`` with ``id_a < id_b`` and
    ``jaccard >= threshold``.

    Plan shape: explode distinct shingles → self-equi-join on the shingle
    (keyed shuffle; candidate generation) → count intersections per pair →
    join per-doc set sizes (AQE-chosen strategy — the size table is one
    row per doc, corpus-proportional, so never force-broadcast)
    → exact Jaccard filter.  The join key is the shingle, so ubiquitous
    shingles create skew: *max_shingle_freq* drops shingles appearing in
    more than that many documents (stop-shingles) before the self-join —
    a shingle in f docs generates f·(f-1)/2 candidate pairs that
    near-certainly fail the threshold anyway.  NOTE: with the cap set,
    stop-shingles are excluded from the intersection counts too, so
    reported Jaccard is biased *low* (conservative) for pairs sharing
    stop-shingles; leave the cap off for exact results (the default,
    used by the sf0.01 oracle).  :func:`minhash_lsh_pairs` is the
    sub-quadratic scale path.
    """
    shingle = (
        tokens(F.col(text_col))
        if shingle_words == 1
        else word_shingles(F.col(text_col), shingle_words)
    )
    # spread first: shingle construction is the CPU-bound map stage and
    # must not inherit a single byte-sized parquet split.  No barrier —
    # the eager checkpoint on `sets` below is the pin; a second raw-row
    # pin would be a pure duplicate materialization
    sets = spread_for_compute(df, barrier=False).select(
        F.col(id_col).alias("doc"), F.array_distinct(shingle).alias("sh")
    )
    # pin: referenced four times below (two join sides + two size maps).
    # persist, not localCheckpoint: building the frame must not run jobs
    # (plan audits and tests construct without executing), and persist
    # keeps the lineage inspectable and recomputable — partitions
    # materialize on the query's first action and are reused after
    pins = _fresh_pins("token_jaccard_pairs")
    sets = sets.persist()
    pins.append(sets)
    sizes = sets.select("doc", F.size("sh").cast("bigint").alias("sz"))
    exploded = sets.select("doc", F.explode("sh").alias("s"))

    if max_shingle_freq is not None:
        hot = (
            exploded.groupBy("s")
            .agg(F.count(F.lit(1)).alias("f"))
            .where(F.col("f") > max_shingle_freq)
            .select("s")
        )
        # no forced broadcast: the stop-shingle set is corpus-dependent
        # (a low cap makes it a large fraction of all distinct shingles);
        # AQE broadcasts it when it is actually small and shuffles the
        # anti-join otherwise
        exploded = exploded.join(hot, on="s", how="left_anti")

    left = exploded.withColumnsRenamed({"doc": "id_a"})
    right = exploded.withColumnsRenamed({"doc": "id_b"})
    inter = (
        left.join(right, on="s")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("inter"))
    )
    # sizes is one row per doc — corpus-proportional, so no forced
    # broadcast: AQE broadcasts it at small scale and shuffles at 100 TB
    return (
        inter.join(sizes.withColumnsRenamed({"doc": "id_a", "sz": "sz_a"}), on="id_a")
        .join(sizes.withColumnsRenamed({"doc": "id_b", "sz": "sz_b"}), on="id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _gram_keys(text_col: str, ngram_words: int, hashed: bool) -> Column:
    """Word n-gram keys of a text column: exact space-joined strings
    (portable, oracle-checkable) or xxhash64 over windows of per-token
    hashes (8-byte keys, strings never materialized — ~3× cheaper map
    stage; used by the span ops' ``hash_grams`` scale path)."""
    if not hashed:
        return word_shingles(F.col(text_col), ngram_words)

    def windows(th: Column) -> Column:
        count = F.size(th) - F.lit(ngram_words - 1)
        return F.when(count <= 0, F.array().cast("array<bigint>")).otherwise(
            F.transform(
                F.sequence(F.lit(0), count - F.lit(1)),
                lambda i: F.xxhash64(
                    *[
                        F.element_at(th, i + F.lit(w + 1))
                        for w in range(ngram_words)
                    ]
                ),
            )
        )

    # bind the token-hash array once — element_at in the window lambda
    # would otherwise re-run the whole tokenize+hash per gram word
    return bind_once(
        F.transform(tokens(F.col(text_col)), lambda t: F.xxhash64(t)),
        windows,
    )


def dup_span_coverage(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    ngram_words: int = 8,
    hash_grams: bool = False,
) -> DataFrame:
    """Cross-document duplicate-span coverage: for each document, the
    fraction of its word *ngram_words*-gram positions whose n-gram also
    occurs in at least one OTHER document.

    This is the document-level restatement of substring-level training
    -data dedup (Lee et al., *Deduplicating Training Data Makes Language
    Models Better*, ACL 2022): instead of a distributed suffix array it
    measures how much of a document is covered by spans duplicated
    elsewhere in the corpus — the signal used to drop boilerplate-heavy
    documents or to target span-removal.  Complements
    :func:`token_jaccard_pairs` (pairwise, set-level) and the per-doc
    ``dup_frac`` repetition score (intra-document only).

    Returns ``(id_col, n_grams, dup_grams, dup_frac)`` for every
    document with at least one n-gram (≥ *ngram_words* words).

    Plan shape — two keyed aggregations and one join, never all-pairs:
    explode (doc, gram, per-doc position count) → per-gram distinct-doc
    count (corpus vocabulary, one shuffle) → join back on the gram →
    per-doc sum of positions whose gram has ``n_docs >= 2``.  All
    n-gram construction is JVM-side array expressions (zero Python).
    With ``hash_grams=True`` gram keys are built as ``xxhash64`` over
    windows of per-token hashes — the n-gram STRINGS are never
    materialized (the ``slice``+``concat_ws`` higher-order lambdas are
    interpreted and dominate the map stage ~3:1, the same finding as
    the MinHash signature path) and the join/shuffle key is 8 bytes
    instead of the full n-gram string, the right trade at 100 TB where
    the exploded gram table dominates the shuffle (collision odds
    ~v²/2⁶⁵ for v distinct grams conflate two grams' doc counts,
    immaterial for a filter signal).  The default keeps exact strings
    so results are portably exact (the sf0.01 oracle path).
    """
    # spread first: n-gram construction is the CPU-bound map stage and
    # must not inherit a single byte-sized parquet split
    grams = spread_for_compute(df, barrier=False).select(
        F.col(id_col).alias("doc"),
        F.explode(_gram_keys(text_col, ngram_words, hash_grams)).alias("g"),
    )
    # one row per (doc, gram) with its position count; consumed twice
    # (the vocabulary aggregate and the join-back), so pin it — it is
    # the distinct gram-per-doc table, far smaller than the exploded
    # positions stream it collapses
    per_doc = (
        grams.groupBy("doc", "g")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        # persist, not localCheckpoint: no job at build time, lineage
        # stays inspectable (the no-Python/no-cartesian plan tests read
        # through this pin), partitions still materialize exactly once
        .persist()
    )
    _fresh_pins("dup_span_coverage").append(per_doc)
    # corpus vocabulary: in how many distinct docs does each gram occur?
    # (input is already distinct per (doc, gram), so a plain count)
    vocab = per_doc.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    # join back on the gram.  No forced broadcast: the vocabulary is
    # corpus-proportional; AQE broadcasts it at small scale only.  Skew
    # is structurally bounded — both sides are distinct on the gram, so
    # a ubiquitous gram contributes f rows × 1 row, never f × f.
    return (
        per_doc.join(vocab, on="g")
        .groupBy("doc")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_grams"),
            F.sum(F.when(F.col("n_docs") >= 2, F.col("cnt")).otherwise(0))
            .cast("bigint")
            .alias("dup_grams"),
        )
        .select(
            F.col("doc").alias(id_col),
            "n_grams",
            "dup_grams",
            F.round(
                F.col("dup_grams") / F.col("n_grams").cast("double"), 6
            ).alias("dup_frac"),
        )
    )


def span_leakage(
    probe: DataFrame,
    reference: DataFrame,
    *,
    id_col: str,
    text_col: str,
    ngram_words: int = 8,
    hash_grams: bool = False,
) -> DataFrame:
    """Per-document span leakage of *probe* against *reference*: for
    each probe document, the fraction of its word n-gram positions
    whose n-gram occurs anywhere in the reference corpus.

    The operational form of train→eval decontamination: score every
    eval/val document by how much of it is covered by spans the
    training split already contains, then drop documents above a
    threshold (the document-level report behind the corpus-level
    contamination *rate*).  Equally useful crawl-vs-existing-corpus:
    probe a new crawl against the current corpus before admission.

    Returns ``(id_col, n_grams, leaked_grams, leaked_frac)`` for every
    probe document with at least one n-gram.

    Plan shape: reference distinct-gram vocabulary (one aggregate —
    grams deduplicated corpus-wide, so the join side is vocabulary-
    sized, not corpus-sized) → left join probe's per-(doc, gram)
    position counts on the gram → per-doc aggregate.  All n-gram
    construction is JVM-side array expressions.  ``hash_grams=True``
    joins on xxhash64 keys built from windows of per-token hashes —
    strings never materialized, 8-byte shuffle keys, the 100 TB path
    (collision odds ~v²/2⁶⁵ overstate leakage immaterially for a
    filter signal).
    """
    gram = _gram_keys(text_col, ngram_words, hash_grams)
    ref_grams = spread_for_compute(reference, barrier=False).select(
        F.explode(gram).alias("g")
    )
    probe_grams = spread_for_compute(probe, barrier=False).select(
        F.col(id_col).alias("doc"), F.explode(gram).alias("g")
    )
    vocab = ref_grams.distinct().withColumn("__hit", F.lit(1))
    per_doc = probe_grams.groupBy("doc", "g").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    # left join on the gram; both sides distinct on the gram per key
    # group, so a ubiquitous gram contributes f × 1 rows, never f × f.
    # No forced broadcast — the vocabulary is corpus-proportional.
    return (
        per_doc.join(vocab, on="g", how="left")
        .groupBy("doc")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_grams"),
            F.sum(F.when(F.col("__hit").isNotNull(), F.col("cnt")).otherwise(0))
            .cast("bigint")
            .alias("leaked_grams"),
        )
        .select(
            F.col("doc").alias(id_col),
            "n_grams",
            "leaked_grams",
            F.round(
                F.col("leaked_grams") / F.col("n_grams").cast("double"), 6
            ).alias("leaked_frac"),
        )
    )


def minhash_signature(
    shingles: Column, *, num_hashes: int, seed: int = 42
) -> Column:
    """MinHash signature (array<bigint>, length *num_hashes*).

    Universal-hash permutations ``(a_i * h + b_i) mod p`` over the
    xxhash64 of each shingle, folded into ``[0, p)`` first so the modular
    products stay positive.  Entirely ``transform``/``aggregate`` — JVM
    expression tree, no UDF, no shuffle.
    """
    base = F.transform(
        shingles, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE31))
    )
    # bind the folded hash array once — every permutation's transform
    # references it, and interpreted HOFs re-evaluate per reference
    return bind_once(
        base,
        lambda h: minhash_signature_from_hashes(
            h, num_hashes=num_hashes, seed=seed
        ),
    )


def minhash_signature_from_hashes(
    hashes: Column, *, num_hashes: int, seed: int = 42
) -> Column:
    """Signature from an already-hashed shingle array (values in
    ``[0, p)``).  Keeping the base-hash array as its own (materialized)
    column keeps this expression tree small — inlining the xxhash64
    base into all *num_hashes* permutations makes Catalyst analysis
    itself a bottleneck on wide signatures."""
    params = _minhash_params(num_hashes, seed)
    return F.array(
        *[
            F.array_min(
                F.transform(
                    hashes,
                    lambda h: (
                        (F.lit(a) * h + F.lit(b)) % F.lit(_MERSENNE31)
                    ),
                )
            )
            for a, b in params
        ]
    )


def _minhash_params(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, _MERSENNE31), rng.randrange(0, _MERSENNE31))
        for _ in range(num_hashes)
    ]


def minhash_signature_vectorized(
    hashes: Column, *, num_hashes: int, seed: int = 42
) -> Column:
    """Arrow-vectorized MinHash permutations (numpy), bit-identical to
    :func:`minhash_signature_from_hashes`.

    Spark evaluates higher-order-function lambdas *interpreted* (no
    codegen), so the pure-JVM signature costs ~num_hashes passes per
    shingle — the dominant cost of the whole LSH pipeline.  Here the
    base xxhash64 values stay JVM-side; only the (a*h+b) mod p min-fold
    runs in numpy: values < 2^31 keep a*h < 2^62, exact in int64, so
    results match the JVM expression exactly.  This is the 100 TB path:
    one Arrow batch transfer of int64 arrays, vectorized O(shingles ×
    num_hashes) per batch.
    """
    from pyspark.sql.functions import pandas_udf

    params = _minhash_params(num_hashes, seed)
    a = np.array([p[0] for p in params], dtype=np.int64)
    b = np.array([p[1] for p in params], dtype=np.int64)

    @pandas_udf("array<bigint>")
    def sign(batch: pd.Series) -> pd.Series:
        # Whole-batch vectorization: concatenate every row's shingle
        # hashes into ONE flat int64 array, then per permutation run a
        # single modular-affine pass + np.minimum.reduceat at the row
        # offsets — num_hashes passes over the batch total instead of
        # one small (num_hashes × n) matrix per row (per-row numpy
        # dispatch overhead dominated the old form).  Working set stays
        # ~2 flat arrays regardless of num_hashes.
        lengths = np.fromiter(
            (0 if hs is None else len(hs) for hs in batch),
            dtype=np.int64,
            count=len(batch),
        )
        nonempty = lengths > 0
        if not nonempty.any():
            # bit-parity with the JVM form: array_min over an empty
            # shingle set yields NULL per permutation (a sentinel
            # value here would band all empty docs into one bucket
            # in one engine and not the other)
            return pd.Series([[None] * num_hashes for _ in batch])
        flat = np.concatenate(
            [np.asarray(hs, dtype=np.int64) for hs in batch if hs is not None and len(hs)]
        )
        ne_lengths = lengths[nonempty]
        # (num_hashes, n_nonempty_rows): values < 2^31 keep a*h < 2^62,
        # exact in int64 — bit-identical to the JVM expression.  Two
        # regimes (measured): short docs → reduceat streams the whole
        # batch per permutation (amortizes numpy dispatch, ~2× faster);
        # long docs → a per-row (num_hashes × n) block stays cache-hot
        # while reduceat's num_hashes full passes thrash memory (~2×
        # slower).  Crossover ≈ 1k shingles/doc.
        if flat.size // max(len(ne_lengths), 1) <= 1024:
            offsets = np.zeros(len(ne_lengths), dtype=np.int64)
            np.cumsum(ne_lengths[:-1], out=offsets[1:])
            mins = np.empty((num_hashes, len(ne_lengths)), dtype=np.int64)
            for i in range(num_hashes):
                mins[i] = np.minimum.reduceat(
                    (a[i] * flat + b[i]) % _MERSENNE31, offsets
                )
            sigs = mins.T
        else:
            sigs = np.empty((len(ne_lengths), num_hashes), dtype=np.int64)
            pos = 0
            for j, n in enumerate(ne_lengths):
                h = flat[pos : pos + n]
                pos += n
                sigs[j] = (
                    (a[:, None] * h[None, :] + b[:, None]) % _MERSENNE31
                ).min(axis=1)
        out, j = [], 0
        for n in lengths:
            if n == 0:
                out.append([None] * num_hashes)
            else:
                out.append(sigs[j])
                j += 1
        return pd.Series(out)

    return sign(hashes)


def minhash_lsh_pairs(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_words: int = 3,
    verify: bool = True,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding.

    Candidate pairs = documents agreeing on *any* band of the signature
    (band = ``num_hashes // bands`` consecutive minhashes, hashed to one
    bucket key).  With r rows/band, P(candidate) = 1-(1-j^r)^bands — the
    classic S-curve; 32 hashes / 8 bands targets j ≳ 0.6.

    Scale: the only shuffles are (1) the band-bucket self-join, keyed on
    ``(band_index, bucket_hash)``; (2) the candidate-pair dedup.  Bucket
    skew (giant near-dup clusters — boilerplate pages, empty documents)
    is the known hazard: a bucket of f members makes f·(f-1)/2 pairs.
    ``max_bucket_size`` bounds that: buckets over the cap switch from
    all-pairs to a *representative star* — every member pairs with the
    bucket's minimum doc id only (linear in bucket size).  This is a
    deliberate recall trade: star pairs still pass exact verification,
    so a member whose similarity TO THE REPRESENTATIVE is below
    *threshold* drops out even if it is a true near-dup of some other
    bucket member.  Size the cap so only degenerate buckets (boilerplate
    / empty-text clusters, where members are near-identical and any
    representative works) exceed it — the standard trade at web scale.  With ``verify=True`` candidates
    are confirmed with the exact shingle-set Jaccard, computed via an
    ``array_intersect`` on the (re-joined) shingle arrays — a broadcast
    join per side when the candidate set is small.

    Returns ``(id_a, id_b[, jaccard])``, ``id_a < id_b``.
    """
    if num_hashes % bands != 0:
        msg = (
            f"bands={bands} must divide num_hashes={num_hashes}: a "
            "remainder would silently drop trailing minhashes and change "
            "the recall S-curve from what was requested."
        )
        raise ValueError(msg)
    rows_per_band = num_hashes // bands

    # Shingle *hashes* built without materializing shingle strings:
    # per-token xxhash64 first, then one xxhash64 over each window of
    # `shingle_words` consecutive token hashes.  Building the string
    # shingles (slice + concat_ws, both interpreted HOF lambdas) costs
    # ~10x more than everything else in this pipeline combined; the
    # hash-only form is a single cheap lambda per shingle.  The verify
    # Jaccard therefore runs over hashed shingle *sets* — identical to
    # the string-set Jaccard up to ~n²/2³² hash collisions.
    docs = (
        spread_for_compute(df).select(
            F.col(id_col).alias("doc"),
            F.transform(
                tokens(F.col(text_col)), lambda t: F.xxhash64(t)
            ).alias("th"),
        )
        .where(F.size("th") >= shingle_words)
        .select(
            "doc",
            F.array_distinct(
                F.transform(
                    F.sequence(
                        F.lit(0), F.size("th") - F.lit(shingle_words)
                    ),
                    lambda i: F.pmod(
                        F.xxhash64(
                            *[
                                F.element_at("th", i + F.lit(w + 1))
                                for w in range(shingle_words)
                            ]
                        ),
                        F.lit(_MERSENNE31),
                    ),
                )
            ).alias("sh"),
        )
    )
    signed = docs.select(
        "doc",
        "sh",
        minhash_signature_vectorized(
            F.col("sh"), num_hashes=num_hashes
        ).alias("sig"),
    )
    # Pin the signatures: the band self-join references this frame on both
    # sides and the verify stage twice more — without materialization the
    # (large) signature expression tree is re-analyzed and re-executed 4x.
    # persist (not localCheckpoint): no job at build time, lineage stays
    # inspectable, and the signature table it holds is tiny
    # (~(8*num_hashes + shingles) bytes per doc).
    pins = _fresh_pins("minhash_lsh_pairs")
    signed = signed.persist()
    pins.append(signed)

    banded = signed.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")
    # One (band, bucket) exchange, computed once into cache: both sides
    # of the self-join (and, on the capped path, the bucket-count
    # aggregate and its join back) consume this partitioning, so the
    # banded frame crosses the network once instead of once per
    # consumer — ReuseExchange does not deduplicate the self-join's two
    # ensured exchanges on its own (measured x10: 3.7 s → 2.5 s).  The
    # cache lives one generation like ``signed`` above and is the
    # smaller of the two (3 numeric cols/row vs full shingle arrays +
    # signatures).
    banded = banded.repartition(F.col("band"), F.col("bucket")).persist()
    pins.append(banded)

    if max_bucket_size is not None:
        # one map-side-combined count per (band, bucket); the join back is
        # on the same key the self-join uses, so no extra repartitioning
        counts = banded.groupBy("band", "bucket").agg(
            F.count(F.lit(1)).alias("__f"),
            F.min("doc").alias("__rep"),
        )
        # pin the counted-bucket frame: the keys filter, the star branch,
        # and BOTH sides of the self-join below read it — persisting runs
        # the bucket-count aggregate + join ONCE instead of per consumer
        # (lazy: no job until the query's first action)
        sized = banded.join(counts, on=["band", "bucket"]).persist()
        pins.append(sized)
        banded = sized.where(F.col("__f") <= max_bucket_size).drop(
            "__f", "__rep"
        )
        star = (
            sized.where(
                (F.col("__f") > max_bucket_size)
                & (F.col("doc") > F.col("__rep"))
            )
            .select(
                F.col("__rep").alias("id_a"), F.col("doc").alias("id_b")
            )
            .distinct()
        )
    else:
        star = None

    # candidate dedup keyed on id_a ALONE: hashpartitioning(id_a)
    # satisfies the (id_a, id_b) clustering the aggregate needs AND the
    # id_a equi-join the verify stage opens with, so the dedup and that
    # join share one exchange instead of shuffling the pair set twice
    # (guide: two operations keyed the same way can share an exchange;
    # plan-pinned in tests/test_plans.py).
    pairs = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.bucket") == F.col("r.bucket"),
                F.col("l.doc") < F.col("r.doc"),
            ],
        )
        .select(
            F.col("l.doc").alias("id_a"), F.col("r.doc").alias("id_b")
        )
        .repartition(F.col("id_a"))
        .dropDuplicates(["id_a", "id_b"])
    )
    if star is not None:
        pairs = (
            pairs.unionByName(star)
            .repartition(F.col("id_a"))
            .dropDuplicates(["id_a", "id_b"])
        )

    if not verify:
        return pairs

    # No broadcast hint on the pairs side: at corpus scale the
    # candidate set can be arbitrarily large (a hint would pin an OOM
    # risk into the plan); AQE broadcasts it at runtime when small —
    # measured identical locally.
    sh = signed.select("doc", "sh")
    # union size derived as |a| + |b| - |intersect| (exact: both sides
    # are array_distinct sets, and the integer arithmetic is lossless in
    # doubles) — one array traversal per pair instead of two; the
    # quotient is bit-identical to the array_union form.
    isect = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    return (
        pairs.join(sh.withColumnsRenamed({"doc": "id_a", "sh": "sh_a"}), on="id_a")
        .join(sh.withColumnsRenamed({"doc": "id_b", "sh": "sh_b"}), on="id_b")
        .withColumn(
            "jaccard",
            F.round(
                isect / (F.size("sh_a") + F.size("sh_b") - isect),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(col: Column, *, bits: int = 64) -> Column:
    """64-bit SimHash of the token multiset.

    Per token: xxhash64 → for each bit position add +1/-1 to the position
    counter; fingerprint bit = sign of the counter.  Expressed as one
    ``aggregate`` over an int64-vector accumulator — no shuffle, no UDF.
    """
    toks = tokens(col)
    zero = F.array_repeat(F.lit(0).cast("bigint"), bits)
    # bit positions are unrolled as Python ints (shift amounts must be
    # literals); the per-token ±1 vector is one array expression
    acc = F.aggregate(
        toks,
        zero,
        lambda a, t: F.zip_with(
            a,
            F.array(
                *[
                    F.when(
                        F.shiftright(F.xxhash64(t), i).bitwiseAND(F.lit(1))
                        == 1,
                        F.lit(1).cast("bigint"),
                    ).otherwise(F.lit(-1).cast("bigint"))
                    for i in range(bits)
                ]
            ),
            lambda x, y: x + y,
        ),
    )
    fp = F.lit(0).cast("bigint")
    for i in range(bits):
        # bit 63 is the int64 sign bit: its set-value is -2^63
        bit_value = (1 << i) if i < 63 else -(1 << 63)
        fp = fp.bitwiseOR(
            F.when(F.element_at(acc, i + 1) > 0, F.lit(bit_value))
            .otherwise(F.lit(0))
            .cast("bigint")
        )
    return fp


def simhash_vectorized(hashes: Column, *, bits: int = 64) -> Column:
    """Arrow-vectorized SimHash fold, bit-identical to :func:`simhash`.

    Same split as :func:`minhash_signature_vectorized`: the per-token
    ``xxhash64`` stays JVM-side (pass ``transform(tokens, xxhash64)``),
    and only the bit-count fold runs in numpy — the pure-expression
    version evaluates 64 interpreted branch expressions per token
    inside a higher-order ``aggregate`` (no codegen), which dominates
    the whole SimHash pipeline.  numpy ``>>`` on int64 is an arithmetic
    shift exactly like Spark's ``shiftright``, so bit extraction
    matches the JVM for negative hashes too.
    """
    from pyspark.sql.functions import pandas_udf

    positions = np.arange(bits, dtype=np.int64)

    @pandas_udf("bigint")
    def fold(batch: pd.Series) -> pd.Series:
        out = []
        for hs in batch:
            if hs is None or len(hs) == 0:
                out.append(0)
                continue
            h = np.asarray(hs, dtype=np.int64)
            # (n_tokens, bits) bit matrix -> per-bit +/-1 counters
            bitm = (h[:, None] >> positions[None, :]) & np.int64(1)
            counters = (2 * bitm - 1).sum(axis=0)
            fp = int(
                np.bitwise_or.reduce(
                    np.where(
                        counters > 0,
                        np.uint64(1) << positions.astype(np.uint64),
                        np.uint64(0),
                    )
                )
            )
            out.append(fp - (1 << 64) if fp >= (1 << 63) else fp)
        return pd.Series(out, dtype="int64")

    return fold(hashes)


def simhash_fingerprints(
    df: DataFrame, *, id_col: str, text_col: str
) -> DataFrame:
    """``(doc, fp)`` — the exact signature frame
    :func:`simhash_pairs` buckets.  Public so the correctness
    certificate (``docs_simhash_pairs``) can brute-force Hamming over
    the IDENTICAL signature space the pigeonhole path sees — any
    drift between the two would be a bug in the certificate itself.

    No barrier: nothing filters on computed columns before the
    caller's pin (simhash_pairs persists the result before its
    self-join).
    """
    return spread_for_compute(df, barrier=False).select(
        F.col(id_col).alias("doc"),
        simhash_vectorized(
            F.transform(tokens(F.col(text_col)), lambda t: F.xxhash64(t))
        ).alias("fp"),
    )


def simhash_pairs(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    chunks: int | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance ≤ *max_hamming*.

    Pigeonhole bucketing: split the 64-bit fingerprint into *chunks*
    pieces; any pair within Hamming distance ``chunks - 1`` agrees on at
    least one chunk, so the candidate join is keyed on
    ``(chunk_index, chunk_value)`` — never all-pairs.  The recall
    guarantee therefore REQUIRES ``chunks >= max_hamming + 1``; by
    default chunks is derived as exactly that, and an explicit smaller
    value is rejected.  Verification = ``bit_count(xor)``.
    ``max_bucket_size`` bounds chunk-bucket skew exactly like
    :func:`minhash_lsh_pairs`: oversized buckets pair each member with
    the bucket minimum only (linear in cluster size).  NOTE this trades
    the pigeonhole recall guarantee *inside* capped buckets: a member
    with ``hamming(rep, doc) > max_hamming`` loses its star link even
    when it is within ``max_hamming`` of another member — size the cap
    so only degenerate near-identical clusters exceed it.

    Returns ``(id_a, id_b, hamming)``.
    """
    if chunks is None:
        chunks = max_hamming + 1
    if chunks < max_hamming + 1:
        msg = (
            f"chunks={chunks} cannot guarantee recall for "
            f"max_hamming={max_hamming}; need chunks >= max_hamming + 1."
        )
        raise ValueError(msg)
    # 2..64 chunks: a single 64-bit chunk would need an unrepresentable
    # (1<<64)-1 mask, and two chunks are equivalent for max_hamming=0
    chunks = min(max(chunks, 2), 64)
    # distribute the 64 bits into exactly `chunks` contiguous pieces
    # (sizes differ by at most 1), so the pigeonhole count is honest
    base, extra = divmod(64, chunks)
    widths = [base + (1 if i < extra else 0) for i in range(chunks)]
    offsets = [sum(widths[:i]) for i in range(chunks)]
    fingerprinted = simhash_fingerprints(
        df, id_col=id_col, text_col=text_col
    )
    # pin before the chunk self-join (see minhash_lsh_pairs): the simhash
    # aggregate tree is large and would otherwise run once per join side.
    # persist: lazy (no build-time job), lineage inspectable, reused by
    # every chunk of the self-join once materialized
    pins = _fresh_pins("simhash_pairs")
    fingerprinted = fingerprinted.persist()
    pins.append(fingerprinted)
    chunked = fingerprinted.select(
        "doc",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftright(F.col("fp"), offsets[i])
                        .bitwiseAND(F.lit((1 << widths[i]) - 1))
                        .alias("cv"),
                    )
                    for i in range(chunks)
                ]
            )
        ).alias("ch"),
    ).select("doc", "fp", "ch.ci", "ch.cv")

    star = None
    if max_bucket_size is not None:
        counts = chunked.groupBy("ci", "cv").agg(
            F.count(F.lit(1)).alias("__f"),
            F.min("doc").alias("__rep"),
            F.min_by("fp", "doc").alias("__rep_fp"),
        )
        # pin (see minhash_lsh_pairs): filter, star, and both self-join
        # sides consume this frame — one bucket-count aggregate, not four
        sized = chunked.join(counts, on=["ci", "cv"]).persist()
        pins.append(sized)
        chunked = sized.where(F.col("__f") <= max_bucket_size).drop(
            "__f", "__rep", "__rep_fp"
        )
        star = (
            sized.where(
                (F.col("__f") > max_bucket_size)
                & (F.col("doc") > F.col("__rep"))
            )
            .select(
                F.col("__rep").alias("id_a"),
                F.col("doc").alias("id_b"),
                F.bit_count(
                    F.col("fp").bitwiseXOR(F.col("__rep_fp"))
                ).cast("int").alias("hamming"),
            )
            .distinct()
        )

    cand = (
        chunked.alias("l")
        .join(
            chunked.alias("r"),
            on=[
                F.col("l.ci") == F.col("r.ci"),
                F.col("l.cv") == F.col("r.cv"),
                F.col("l.doc") < F.col("r.doc"),
            ],
        )
        .select(
            F.col("l.doc").alias("id_a"),
            F.col("r.doc").alias("id_b"),
            F.bit_count(
                F.col("l.fp").bitwiseXOR(F.col("r.fp"))
            ).cast("int").alias("hamming"),
        )
        .distinct()
    )
    if star is not None:
        cand = cand.unionByName(star).distinct()
    return cand.where(F.col("hamming") <= max_hamming)


#: ``algorithm="auto"`` switches to the star algorithm outright above
#: this many (symmetric) edges: per-round cost is similar for both, but
#: a deep chain costs label propagation ``max_iterations`` wasted
#: edge-list shuffles before the fallback — a risk worth pre-empting
#: only when each shuffle is expensive.  ~50M edges ≈ a few GB keyed
#: shuffle per round.
STAR_EDGE_THRESHOLD = 50_000_000

#: ``algorithm="auto"`` solves the labeling on the driver at or below
#: this many (symmetric) edges.  Every distributed round costs 2 driver
#: jobs + a keyed shuffle regardless of size — on the small edge lists
#: near-dup dedup actually produces (pairs ≪ corpus), the whole loop is
#: scheduling floor, measured 2.2–2.8 s / ~43 jobs on a 144-pair graph.
#: Below the bound the edge list is collected ONCE (same contract as a
#: broadcast-join build side: ≤ ~16 MB at the bound vs Spark's own 8 GB
#: broadcast cap), labeled with vectorized numpy min-relax + pointer
#: jumping, and returned as a JVM ``LocalRelation`` — one job, zero
#: shuffles, exact same labels.  Above the bound nothing changes.
LOCAL_EDGE_THRESHOLD = 1_000_000


def connected_components(
    pairs: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 25,
    algorithm: str = "auto",
) -> DataFrame:
    """Duplicate-cluster formation: connected components over a
    candidate-pair edge list (the step after :func:`minhash_lsh_pairs` /
    :func:`token_jaccard_pairs` that turns pairs into dedup groups, so a
    keep-one policy can be applied per cluster).

    Two algorithms, selected by ``algorithm``:

    - ``"label"`` — min-label propagation: every node starts labeled
      with its own id and repeatedly takes the minimum label in its
      neighborhood until a full round changes nothing.  Rounds needed =
      graph diameter; near-dup clusters are shallow (stars/short
      chains), so this converges in a handful of rounds even at corpus
      scale — each round is one keyed shuffle of the *edge list*
      (pairs-sized, far smaller than the corpus).  Raises
      ``RuntimeError`` at the iteration cap — silently returning
      half-propagated labels would split one real duplicate cluster
      into several and let extra "best" docs survive a keep-one policy.
    - ``"star"`` — alternating large-star/small-star (Kiveris et al.,
      *Connected Components in MapReduce and Beyond*, SoCC 2014):
      each round rewires every node's larger neighbors (large-star)
      then its smaller neighbors (small-star) to the neighborhood
      minimum, collapsing components into stars in O(log²)
      rounds **independent of graph diameter** — the scale path for
      adversarial chains.
    - ``"auto"`` (default) — picks by edge count: above
      :data:`STAR_EDGE_THRESHOLD` edges, the star algorithm from the
      start — at corpus scale an undetected deep chain would waste
      ``max_iterations`` full edge-list shuffles before the fallback
      kicks in, and the star rounds are diameter-independent (the
      count is free: the edge list was just eagerly checkpointed).  At
      or below :data:`LOCAL_EDGE_THRESHOLD` edges, the labeling is
      solved on the driver instead (:func:`_local_components`): every
      distributed round is 2 driver jobs + a keyed shuffle whatever
      the size, so on the small pair graphs dedup produces the loop is
      pure scheduling floor — the bounded edge list is collected once
      (broadcast-build-sized by contract) and labeled in vectorized
      numpy, exactly.  Between the bounds, label propagation (cheapest
      on shallow graphs), falling back to the star algorithm if the
      cap is hit instead of raising.

    Each round's state is pinned with ``localCheckpoint`` to keep the
    plan flat (iterative lineage otherwise grows exponentially;
    checkpoint storage is released with the session — on a long-lived
    cluster session, checkpoint to a reaper-managed dir instead if
    rounds × edge size matters).

    Returns ``(id, component)`` for every node in *pairs*, where
    ``component`` is the smallest node id in the cluster.
    """
    if algorithm not in ("auto", "label", "star"):
        msg = f"unknown connected-components algorithm: {algorithm!r}"
        raise ValueError(msg)
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if algorithm == "star":
        return _star_components(edges, max_iterations=max_iterations)
    if algorithm == "auto":
        n_edges = edges.count()
        if n_edges > STAR_EDGE_THRESHOLD:
            return _star_components(edges, max_iterations=max_iterations)
        if n_edges <= LOCAL_EDGE_THRESHOLD:
            local = _local_components(edges)
            if local is not None:
                return local
    labels = (
        edges.select("a")
        .distinct()
        .select(F.col("a").alias("id"), F.col("a").alias("comp"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iterations):
        nbr = (
            edges.join(
                labels.withColumnsRenamed({"id": "b", "comp": "nbr_comp"}),
                on="b",
            )
            .groupBy("a")
            .agg(F.min("nbr_comp").alias("min_nbr"))
            .withColumnsRenamed({"a": "id"})
        )
        # the change flag rides the same checkpointed pass (new < old
        # iff a neighbor label undercuts the current one), so detecting
        # convergence is a limit-1 scan of the cached partitions — not
        # the old-vs-new join (a full extra shuffle) per round
        new_labels = (
            labels.join(nbr, on="id", how="left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce("min_nbr", F.col("comp"))
                ).alias("comp"),
                (
                    F.coalesce("min_nbr", F.col("comp")) < F.col("comp")
                ).alias("__chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.where(F.col("__chg")).limit(1).count()
        labels = new_labels.drop("__chg")
        if changed == 0:
            converged = True
            break
    if not converged:
        if algorithm == "auto":
            # deeper than label propagation's round budget — switch to
            # the diameter-independent algorithm
            return _star_components(edges, max_iterations=max_iterations)
        msg = (
            f"connected_components did not converge in {max_iterations} "
            "rounds — the pair graph has a longer path than expected for "
            "near-dup clusters; raise max_iterations (rounds needed = "
            "graph diameter) or use algorithm='star' (rounds needed = "
            "O(log²) regardless of diameter)."
        )
        raise RuntimeError(msg)
    return labels.select("id", F.col("comp").alias("component"))


def _local_components(edges: DataFrame) -> DataFrame | None:
    """Exact min-id components of a bounded symmetric edge list, solved
    on the driver (``algorithm="auto"`` at or below
    :data:`LOCAL_EDGE_THRESHOLD` — see that constant for the economics).

    The caller has already materialized (``localCheckpoint``) and
    counted *edges*, proving the collect below is bounded the way a
    broadcast-join build side is; the result rows (≤ node count ≤ edge
    count) return as a JVM ``LocalRelation`` via :func:`local_frame`.

    Labeling is vectorized numpy.  Ids map to dense ranks over the
    SORTED node vector (rank order == id order, so the min rank per
    component is the min id), then edge min-relaxation alternates with
    pointer jumping until fixpoint.  Every step only lowers a label and
    keeps it inside its own component, so at the fixpoint each edge has
    equal labels on both ends (the edge list is symmetric), labels are
    constant per component, and the shared value is the component
    minimum — identical to the distributed propagation's answer.

    Returns ``None`` for inputs the vectorized path does not cover —
    non-fixed-width ids (string/binary/decimal: the edge-count bound
    would no longer bound the collected BYTES) and NULL ids — letting
    the caller fall through to the distributed loop.
    """
    from pyspark.sql.types import (
        ByteType,
        DateType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
        TimestampNTZType,
        TimestampType,
    )

    from sql_autoloader_spark.ops.dataframe_ops import (
        arrow_driver_transfer,
        local_frame,
    )

    spark = edges.sparkSession
    id_dt = edges.schema["a"].dataType
    if not isinstance(
        id_dt,
        (
            ByteType,
            ShortType,
            IntegerType,
            LongType,
            FloatType,
            DoubleType,
            DateType,
            TimestampType,
            TimestampNTZType,
        ),
    ):
        return None  # wide ids: keep the ≤16 MB collect contract
    id_type = id_dt.simpleString()
    schema = f"id {id_type}, component {id_type}"
    with arrow_driver_transfer(spark):
        pdf = edges.toPandas()
    if len(pdf) == 0:
        return local_frame(spark, pdf, schema)
    if pdf["a"].isna().any() or pdf["b"].isna().any():
        return None
    nodes = np.sort(pdf["a"].drop_duplicates().to_numpy())
    # the edge list is symmetric, so column a alone covers every node
    a = np.searchsorted(nodes, pdf["a"].to_numpy())
    b = np.searchsorted(nodes, pdf["b"].to_numpy())
    labels = np.arange(len(nodes))
    while True:
        before = labels
        relaxed = labels.copy()
        # unbuffered min: duplicate a-ranks each apply (SPARK's groupBy
        # min equivalent); symmetric edges make one direction enough
        np.minimum.at(relaxed, a, labels[b])
        labels = relaxed
        while True:  # full path compression
            jumped = labels[labels]
            if np.array_equal(jumped, labels):
                break
            labels = jumped
        if np.array_equal(labels, before):
            break
    out = pd.DataFrame({"id": nodes, "component": nodes[labels]})
    return local_frame(spark, out, schema)


def _star_components(edges: DataFrame, *, max_iterations: int) -> DataFrame:
    """Alternating large-star/small-star over a symmetric edge list.

    Kiveris et al. (SoCC 2014), restated declaratively: per round,

    - *large-star*: for every node ``a``, point each strictly-larger
      neighbor at ``min(Γ(a) ∪ {a})`` — long tails collapse toward
      small ids without ever increasing the minimum;
    - *small-star*: orient edges big→small, then point each node and
      its smaller neighbors at the group minimum — stars flatten.

    The edge set reaches a fixpoint (every component a star centered at
    its minimum id) in O(log²) rounds independent of diameter; each
    round is two keyed shuffles of the edge list.  The iteration cap is
    a runaway guard only — 2^(2^max_iterations) nodes would be needed
    to exhaust the default budget.
    """
    # canonical big→small orientation; every a > b
    current = (
        edges.where(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    count = current.count()
    converged = False
    for _ in range(max_iterations):
        sym = current.unionByName(
            current.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        # large-star: v -> min(Γ(a) ∪ {a}) for every neighbor v > a
        mins = sym.groupBy("a").agg(F.min("b").alias("mn"))
        large = (
            sym.join(mins, on="a")
            .withColumn("mn", F.least("mn", F.col("a")))
            .where(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("mn").alias("b"))
            .distinct()
        )
        # small-star on the (already big→small) output: group by the big
        # end, point the group (and the big end itself) at the minimum
        mins2 = large.groupBy("a").agg(F.min("b").alias("mn"))
        small = (
            large.join(mins2, on="a")
            .where(F.col("b") != F.col("mn"))
            .select(F.col("b").alias("a"), F.col("mn").alias("b"))
            .unionByName(mins2.select("a", F.col("mn").alias("b")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        new_count = small.count()
        if new_count == count and small.subtract(current).isEmpty():
            current = small
            converged = True
            break
        current, count = small, new_count
    if not converged:
        # same contract as the label path: silently returning a
        # non-fixpoint edge set would split real clusters
        msg = (
            f"star connected-components did not converge in "
            f"{max_iterations} rounds — raise max_iterations (the "
            "required rounds grow with log² of the largest component)."
        )
        raise RuntimeError(msg)
    # fixpoint: every edge points a node at its component minimum
    labels = current.select(
        F.col("a").alias("id"), F.col("b").alias("component")
    ).unionByName(
        current.select("b")
        .distinct()
        .select(F.col("b").alias("id"), F.col("b").alias("component"))
    )
    # nodes appearing only in self-pairs were dropped by canonicalization;
    # give them singleton components so the node set matches the input
    nodes = edges.select(F.col("a").alias("id")).distinct()
    return nodes.join(labels, on="id", how="left").select(
        "id", F.coalesce("component", F.col("id")).alias("component")
    )
