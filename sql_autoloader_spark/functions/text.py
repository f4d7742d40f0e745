"""Text-analysis operators for large-scale document pipelines.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen'd) — no Python UDFs.  Each operator is a narrow
projection so Catalyst prunes the parquet scan down to the text column.

Scale notes (100 TB):
- Every function here is a *map-side* transform: zero shuffles, embarrassingly
  parallel over input splits, limited only by scan bandwidth.
- ``language_id``'s replace-based counting is O(len(text) * n_keywords) per
  row inside codegen — no regex backtracking, no dictionary broadcast needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Stopword marker sets per language, chosen to be disjoint enough for a
# deterministic arg-max. Scoring = total occurrence count of ``_ word _``
# patterns; the padded-space trick avoids regexes in the hot path.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to ", " in "],
    "es": [" el ", " que ", " los ", " una ", " por "],
    "de": [" der ", " und ", " die ", " nicht ", " ist "],
    "fr": [" le ", " et ", " les ", " des ", " une "],
}
# Order decides ties: first language with the max score wins.
LANG_ORDER: list[str] = ["en", "es", "de", "fr"]

_CJK_RANGE = "[一-鿿]"


def bind_once(expr: Column, f) -> Column:
    """Evaluate *expr* once per row and pass it to *f* as a bound
    lambda variable.

    Spark's interpreted higher-order-function lambdas do NOT hoist or
    common-subexpression-eliminate: an array expression referenced
    inside a ``transform`` body is re-evaluated at EVERY element access
    (measured 6-40× blowup for shingle windows over an inlined token
    array).  Wrapping in ``transform(array(expr), f)[1]`` forces a
    single evaluation — the lambda variable is a plain value lookup.
    Use this whenever a non-trivial expression is referenced more than
    once inside a HOF body; a named projection column achieves the same
    but changes the DataFrame shape.
    """
    return F.element_at(F.transform(F.array(expr), f), 1)


def occurrences(col: Column, needle: str) -> Column:
    """Occurrence count of *needle* in *col* via length arithmetic.

    ``(len(s) - len(replace(s, needle, ''))) / len(needle)`` — pure string
    ops, deterministic, expressible identically in any SQL dialect (the
    DuckDB correctness oracle uses the same formula).
    """
    removed = F.replace(col, F.lit(needle))
    return (
        (F.length(col) - F.length(removed)) / F.lit(len(needle))
    ).cast("bigint")


def token_count(col: Column) -> Column:
    """Whitespace-token count; empty/blank text counts 0 tokens."""
    trimmed = F.trim(col)
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    ).cast("bigint")


def tokens(col: Column) -> Column:
    """Lower-cased whitespace tokens as an array (empty array for blank)."""
    trimmed = F.trim(F.lower(col))
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def word_shingles(col: Column, n: int) -> Column:
    """Word n-gram shingles (space-joined) as an array of strings.

    Built from ``transform`` over token indices — stays JVM-side; the
    shingle array feeds minhash/Jaccard dedup downstream.  The token
    array is bound once per row (:func:`bind_once`), not re-split at
    every window access.
    """

    def shingles(toks: Column) -> Column:
        count = F.size(toks) - F.lit(n - 1)
        # sequence(0, -1) would count *down*; guard the too-short case
        return F.when(count <= 0, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(0), count - F.lit(1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i + F.lit(1), n)),
            )
        )

    return bind_once(tokens(col), shingles)


def char_ngrams(col: Column, n: int) -> Column:
    """Character n-grams of the lower-cased text as an array of strings."""

    def grams(s: Column) -> Column:
        count = F.length(s) - F.lit(n - 1)
        return F.when(count <= 0, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(0), count - F.lit(1)),
                lambda i: F.substring(s, i + F.lit(1), n),
            )
        )

    return bind_once(F.lower(col), grams)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality-scoring features.

    Adds: ``n_chars_obs``, ``n_tokens``, ``alpha_ratio``, ``digit_ratio``,
    ``space_ratio``, ``avg_token_len``, ``quality_score`` (a simple
    length+alpha heuristic in [0,1]).  All ratios are exact integer
    divisions in double precision (deterministic across engines).
    """
    col = F.col(text_col)
    n = F.greatest(F.length(col), F.lit(1)).cast("double")
    alpha = F.length(F.regexp_replace(col, "[^a-zA-Z]", "")).cast("double")
    digit = F.length(F.regexp_replace(col, "[^0-9]", "")).cast("double")
    space = F.length(F.regexp_replace(col, "[^ ]", "")).cast("double")
    n_tok = token_count(col)
    return (
        df.withColumn("n_chars_obs", F.length(col).cast("bigint"))
        .withColumn("n_tokens", n_tok)
        .withColumn("alpha_ratio", F.round(alpha / n, 6))
        .withColumn("digit_ratio", F.round(digit / n, 6))
        .withColumn("space_ratio", F.round(space / n, 6))
        .withColumn(
            "avg_token_len",
            F.round(
                (F.length(F.trim(col)) - F.greatest(n_tok - 1, F.lit(0)))
                .cast("double")
                / F.greatest(n_tok, F.lit(1)).cast("double"),
                6,
            ),
        )
        .withColumn(
            "quality_score",
            F.round(
                F.least(F.length(col).cast("double") / F.lit(500.0), F.lit(1.0))
                * (alpha + space)
                / n,
                6,
            ),
        )
    )


def language_scores(col: Column) -> dict[str, Column]:
    """Per-language marker-occurrence scores (plus CJK char count)."""
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    scores = {
        lang: sum(
            (occurrences(padded, marker) for marker in markers),
            start=F.lit(0).cast("bigint"),
        )
        for lang, markers in LANG_MARKERS.items()
    }
    cjk = F.length(col) - F.length(F.regexp_replace(col, _CJK_RANGE, ""))
    scores["zh"] = cjk.cast("bigint")
    return scores


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language identification (n-gram/stopword scoring).

    CJK characters dominate (any CJK → ``zh``); otherwise the language
    with the highest marker score wins, ties broken by ``LANG_ORDER``;
    all-zero scores → ``und`` (undetermined).
    """
    scores = language_scores(F.col(text_col))
    best = F.greatest(*[scores[lang] for lang in LANG_ORDER])
    pred = F.when(scores["zh"] > 0, F.lit("zh"))
    cond = F.when(best == 0, F.lit("und"))
    for lang in LANG_ORDER:
        cond = cond.when(scores[lang] == best, F.lit(lang))
    pred = pred.otherwise(cond)
    out = df.withColumn("pred_lang", pred)
    for lang in ("zh", *LANG_ORDER):
        out = out.withColumn(f"score_{lang}", scores[lang])
    return out


def normalized(col: Column) -> Column:
    """Canonical text form for fingerprinting: lower, alnum+space only,
    collapsed whitespace.

    Single regex pass: split on non-alnum runs, drop empties, re-join —
    byte-identical to the two-pass ``regexp_replace`` form (replace
    non-alnum with space, collapse ``\\s+``, trim) but ~2× faster on
    java.util.regex, which is the hot loop of every fingerprint/
    token-stats query over a big corpus."""
    return F.array_join(
        F.filter(
            F.split(F.lower(col), "[^a-z0-9]+"), lambda x: x != F.lit("")
        ),
        " ",
    )


def fingerprint_md5(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalized(col))


def rolling_fingerprint(col: Column, *, window: int = 8) -> Column:
    """Rolling-hash document fingerprint: min of xxhash64 over
    character windows of the normalized text (a winnowing-style selector —
    robust to local edits, unlike a whole-document hash).

    xxhash64 is Spark-specific, so correctness checks for this operator
    are rows-only (no portable SQL oracle).
    """
    def fp(s: Column) -> Column:
        count = F.greatest(F.length(s) - F.lit(window - 1), F.lit(1))
        return F.array_min(
            F.transform(
                F.sequence(F.lit(0), count - F.lit(1)),
                lambda i: F.xxhash64(F.substring(s, i + F.lit(1), window)),
            )
        )

    # bind the normalized text once — the window lambda would otherwise
    # re-run the regex normalization at every character offset
    return bind_once(normalized(col), fp)


def tfidf_term_scores(
    df: DataFrame,
    terms: list[str],
    *,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """TF-IDF relevance of each document to a fixed term list.

    ``score = Σ_i (tf_i / n_tokens) · (ln((N+1)/(df_i+1)) + 1)`` — the
    smoothed-idf form, summed in *fixed term order* so the floating-point
    result is deterministic across engines (a groupBy-SUM over per-term
    doubles would be summation-order-dependent).

    Plan shape: one explode + one per-doc aggregate (term counts as
    conditional sums — one shuffle on the doc id), one global aggregate
    for the document frequencies (broadcast back as a single row).  No
    UDF; linear in corpus size.

    Returns ``(id_col, score)`` for documents with score > 0.  A term
    listed twice contributes twice (callers dedupe if that is not the
    intent).
    """
    if not terms:
        msg = "tfidf_term_scores requires at least one term."
        raise ValueError(msg)
    toks = df.select(
        F.col(id_col).alias("__doc"), F.explode(tokens(F.col(text_col))).alias("__t")
    )
    per_doc = toks.groupBy("__doc").agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.count(F.when(F.col("__t") == t, 1)).alias(f"__c{i}")
            for i, t in enumerate(terms)
        ],
    )
    globals_ = toks.agg(
        F.count_distinct("__doc").alias("__nd"),
        *[
            F.count_distinct(F.when(F.col("__t") == t, F.col("__doc"))).alias(
                f"__df{i}"
            )
            for i, t in enumerate(terms)
        ],
    )
    score = None
    for i in range(len(terms)):
        idf = (
            F.log((F.col("__nd") + 1).cast("double") / (F.col(f"__df{i}") + 1))
            + F.lit(1.0)
        )
        part = (
            F.col(f"__c{i}").cast("double") / F.col("__n").cast("double")
        ) * idf
        score = part if score is None else score + part
    return (
        per_doc.join(F.broadcast(globals_))
        .select(F.col("__doc").alias(id_col), score.alias("score"))
        .where(F.col("score") > 0)
    )


#: BPE-style pre-tokenization pattern (GPT-2 flavor, simplified to the
#: regex subset Java and RE2 interpret identically): a token is an
#: optionally space-prefixed letter run, digit run, or punctuation run.
BPE_ISH_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_ish_tokens(col: Column) -> Column:
    """BPE-style pre-tokens (array<string>) via one regex extraction.

    The pattern is the word/number/punctuation split every byte-pair
    tokenizer applies before merges — counting these pre-tokens is the
    standard cheap proxy for model token counts at corpus scale (the
    real BPE merge table would be a broadcast lookup in a pandas UDF).
    JVM-side ``regexp_extract_all``; no UDF, no shuffle.
    """
    return F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 0)


def bpe_ish_token_count(col: Column) -> Column:
    """Count of BPE-style pre-tokens (see :func:`bpe_ish_tokens`)."""
    return F.size(bpe_ish_tokens(col)).cast("bigint")


#: ordered (pattern, placeholder) redaction rules.  Patterns stay inside
#: the regex subset Java (Spark) and RE2-family engines (DuckDB) read
#: identically: character classes, bounded repeats, non-capturing
#: groups, \b word boundaries — no backreferences, no lookaround.
PII_RULES: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}(-[0-9]{3,4})?", "<PHONE>"),
    (r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
)


def pii_counts(col: Column) -> list[Column]:
    """Per-rule match counts (``n_email``, ``n_phone``, ``n_ip``) —
    the audit side of redaction, one JVM regex pass per rule."""
    names = ["n_email", "n_phone", "n_ip"]
    return [
        F.regexp_count(col, F.lit(pat)).cast("bigint").alias(name)
        for (pat, _), name in zip(PII_RULES, names, strict=True)
    ]


def scrub_pii(col: Column) -> Column:
    """Redact emails, phone numbers, and IPv4 addresses with typed
    placeholders.

    A chained ``regexp_replace`` — rule order matters (emails first, so
    digits inside addresses are not half-eaten by the phone rule).
    Pure map stage: zero shuffle, zero Python, whole-stage codegen; at
    100 TB this runs at scan speed as part of any cleaning pipeline.
    """
    out = col
    for pattern, placeholder in PII_RULES:
        out = F.regexp_replace(out, pattern, placeholder)
    return out


#: end-of-word marker used by :func:`learn_bpe_merges`
BPE_EOW = "</w>"


def learn_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    *,
    n_merges: int = 10,
    max_vocab: int = 50_000,
) -> DataFrame:
    """Learn a byte-pair-encoding merge table from a document corpus.

    The tokenizer-training primitive of an LLM data pipeline, split the
    way production BPE trainers split it:

    - **corpus scale (distributed)**: one ``explode`` + ``groupBy`` word
      count over every document — the only pass that touches the 100 TB
      corpus, map-side combined, one shuffle keyed on the word.  The
      vocabulary is capped at the ``max_vocab`` most frequent words
      (deterministic ``count desc, word`` order), which bounds what
      crosses to the driver regardless of corpus size.
    - **vocab scale (driver)**: the classic merge loop over the counted
      vocabulary (pairs weighted by word frequency; ties break on the
      lexicographically smallest pair) — the same split as the IVF
      centroid fit: fit on the aggregate, never on the rows.

    Returns ``(rank, left, right, merged, pair_count)`` — the ordered
    merge table, ready to broadcast to a tokenizer UDF.
    """
    words = (
        df.select(
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("word"))
        .limit(max_vocab)
    )
    vocab: list[tuple[list[str], int]] = [
        (list(r["word"]) + [BPE_EOW], int(r["freq"]))
        for r in words.collect()
    ]

    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for symbols, freq in vocab:
            for a, b in zip(symbols, symbols[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq
        if not counts:
            break
        # deterministic: max count, then lexicographically smallest pair
        (left, right), best = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merged = left + right
        merges.append((rank, left, right, merged, best))
        new_vocab = []
        for symbols, freq in vocab:
            out: list[str] = []
            i = 0
            while i < len(symbols):
                if (
                    i + 1 < len(symbols)
                    and symbols[i] == left
                    and symbols[i + 1] == right
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            new_vocab.append((out, freq))
        vocab = new_vocab

    return df.sparkSession.createDataFrame(
        merges,
        "rank int, left string, right string, merged string, pair_count bigint",
    )


def apply_bpe(
    df: DataFrame,
    merges: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize a corpus with a learned BPE merge table — the *encode*
    half of the tokenizer pipeline (:func:`learn_bpe_merges` is the
    train half).

    Scale split, the production tokenizer-application shape:

    - the merge table (``n_merges`` rows) collects to the driver and
      ships to executors inside the UDF closure;
    - words are ENCODED ONCE PER DISTINCT WORD, not per occurrence: a
      Zipf-distributed corpus has vocabulary ≪ token count, so the
      Arrow-batched encode UDF touches the distinct-word frame only,
      and the corpus-sized side is a plain equi-join (AQE picks
      broadcast when the vocabulary fits);
    - per-document token sequences reassemble JVM-side
      (``collect_list`` of positioned structs → ``array_sort`` →
      ``flatten`` — no Python on the corpus-sized path).

    The encoder merges the lowest-rank adjacent pair first, repeatedly —
    provably equivalent to replaying merges in rank order (the training
    procedure), and differential-tested against that replay.  Returns
    ``(id_col, tokens array<string>, n_tokens)``; words are
    lowercased/whitespace-split exactly as in training, with the
    ``</w>`` end-of-word marker on the final subword.
    """
    import pandas as pd  # noqa: PLC0415 — executor-side import

    ranked = {
        (r["left"], r["right"]): (int(r["rank"]), r["merged"])
        for r in merges.collect()
    }

    def encode_word(word: str) -> list[str]:
        symbols = [*word, BPE_EOW]
        while len(symbols) > 1:
            best_rank = None
            for pair in zip(symbols, symbols[1:]):
                hit = ranked.get(pair)
                if hit is not None and (
                    best_rank is None or hit[0] < best_rank[0]
                ):
                    best_rank = hit
                    best_pair = pair
            if best_rank is None:
                break
            left, right = best_pair
            merged = best_rank[1]
            out: list[str] = []
            i = 0
            while i < len(symbols):
                if (
                    i + 1 < len(symbols)
                    and symbols[i] == left
                    and symbols[i + 1] == right
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            symbols = out
        return symbols

    def encode_batches(it):  # noqa: ANN001, ANN202
        for pdf in it:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "subwords": [encode_word(w) for w in pdf["word"]],
                }
            )

    positioned = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("__pos", "word"),
    ).where(F.col("word") != "")
    vocab = positioned.select("word").distinct()
    encoded = vocab.mapInPandas(
        encode_batches, schema="word string, subwords array<string>"
    )
    grouped = (
        positioned.join(encoded, on="word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.array_sort(
                    F.collect_list(F.struct("__pos", "subwords"))
                ).getField("subwords")
            ).alias("tokens")
        )
    )
    # empty/whitespace-only documents have no words but must NOT drop:
    # a corpus operator that loses rows breaks every downstream join.
    # The re-join is NULL-SAFE: a NULL document id must match its own
    # grouped row (a plain equi-join would silently replace a NULL-id
    # doc's real tokens with []).  PRECONDITION: *id_col* is unique —
    # a duplicated id would interleave both rows' word positions into
    # one garbled token stream, so the guard below fails the job at
    # execution time (same keyed aggregate as the distinct; no extra
    # job) rather than silently merging documents.
    ids = df.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__id_multiplicity")
    ).alias("i")
    dup_guard = F.when(
        F.col("i.`__id_multiplicity`") > 1,
        F.raise_error(
            # concat_ws, not concat: a NULL duplicate id must not null
            # out the whole message (raise_error with a NULL message
            # still fails the job, but without this diagnostic)
            F.concat_ws(
                "",
                F.lit(
                    "apply_bpe requires unique document ids; "
                    f"duplicate {id_col}="
                ),
                F.coalesce(
                    F.col(f"i.`{id_col}`").cast("string"), F.lit("NULL")
                ),
            )
        ).cast("array<string>"),
    )
    g = grouped.alias("g")
    return (
        ids.join(
            g,
            F.col(f"i.`{id_col}`").eqNullSafe(F.col(f"g.`{id_col}`")),
            "left",
        )
        .select(
            F.col(f"i.`{id_col}`").alias(id_col),
            F.coalesce(
                dup_guard,
                F.col("g.tokens"),
                F.array().cast("array<string>"),
            ).alias("tokens"),
        )
        .withColumn("n_tokens", F.size("tokens").cast("bigint"))
    )
