"""Text-analysis operators over the ``documents`` table (north-star §2b):
token counting, quality scoring, language-ID heuristic, fingerprinting.

All native expressions — at 100 TB these run inside whole-stage codegen on
the scan projection; no Python in the loop. The BPE-ish token estimate uses
a regex segmentation (word pieces / digits / punctuation runs), the standard
cheap proxy for subword token counts.

Determinism note: ratio outputs are raw int/int double divisions (identical
bits in any IEEE engine) — deliberately NOT rounded, because round(double)
implementations differ across engines on knife-edge values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import collapse_whitespace

#: tiny per-language stopword marker sets for the n-gram/stopword heuristic.
#: Deterministic and explainable — a real pipeline would swap in fastText;
#: the Spark-side shape (score-per-language, argmax) is identical.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "in"],
    "de": ["der", "die", "und", "nicht", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "que", "de", "y"],
    "cs": ["je", "se", "na", "to", "v"],
}


def _rc(col: Column, pattern: str) -> Column:
    """regexp_count with a literal pattern (a bare str would be resolved as
    a column name)."""
    return F.regexp_count(col, F.lit(pattern))


def whitespace_token_count(text: Column | str) -> Column:
    from .dedup import _bind

    t = F.col(text) if isinstance(text, str) else text
    # normalized text bound once (round 14): the two references (length
    # guard + split) each re-ran the collapse regex per row
    return _bind(
        collapse_whitespace(t),
        lambda tt: F.when(F.length(tt) == 0, F.lit(0)).otherwise(
            F.size(F.split(tt, " "))
        ),
    )


def bpe_ish_token_count(text: Column | str) -> Column:
    """Subword-ish token estimate: count word/digit/punct segments, then
    charge one extra token per 7 chars of long words (BPE splits long
    words); cheap, deterministic, regex-only."""
    t = F.col(text) if isinstance(text, str) else text
    segs = _rc(t, r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
    long_extra = F.aggregate(
        F.split(F.lower(collapse_whitespace(t)), " "),
        F.lit(0),
        lambda acc, w: acc + F.floor(F.length(w) / 7).cast("int"),
    )
    return segs + long_extra


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality signals: length, token stats, punct/digit/upper
    ratios, mean word length."""
    t = F.col(text_col)
    n_chars = F.length(t)
    toks = whitespace_token_count(t)
    return df.withColumns(
        {
            "q_n_chars": n_chars,
            "q_n_tokens": toks,
            "q_mean_word_len": F.when(
                toks > 0, F.length(F.regexp_replace(t, r"\s+", "")) / toks
            ).otherwise(F.lit(0.0)),
            "q_punct_ratio": F.when(
                n_chars > 0, _rc(t, r"[^\w\s]") / n_chars
            ).otherwise(F.lit(0.0)),
            "q_digit_ratio": F.when(
                n_chars > 0, _rc(t, r"[0-9]") / n_chars
            ).otherwise(F.lit(0.0)),
            "q_upper_ratio": F.when(
                n_chars > 0, _rc(t, r"[A-Z]") / n_chars
            ).otherwise(F.lit(0.0)),
        }
    )


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    """Fraction of tokens that are language-marker stopwords."""
    t = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.lower(collapse_whitespace(t)), " ")
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    hits = F.size(F.filter(toks, lambda w: F.array_contains(markers, w)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 200,
    overlap: int = 50,
) -> DataFrame:
    """Split each document into fixed-size character chunks with overlap —
    the standard pre-embedding step of an LLM data pipeline.

    Chunk i covers [i*stride, i*stride + chunk_size); stride =
    chunk_size - overlap. Implemented as sequence -> transform -> posexplode,
    all JVM-side: at 100 TB this is a narrow per-row flatMap inside
    whole-stage codegen — no shuffle, no Python, and output rows stay
    co-partitioned with their source document (chunk->doc joins are local).

    Returns (id, chunk_id, chunk_text, chunk_len); empty documents yield no
    rows.
    """
    t = F.col(text_col)
    stride = chunk_size - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_size")
    n_chunks = F.when(
        F.length(t) > 0,
        F.ceil((F.greatest(F.length(t) - F.lit(overlap), F.lit(1)))
               / F.lit(stride)).cast("int"),
    ).otherwise(F.lit(0))
    # sequence(0, -1) counts DOWN ([0,-1]) — slice to n so n_chunks=0
    # yields an empty array, not two phantom chunks
    starts = F.slice(
        F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))), 1, n_chunks
    )
    chunks = F.transform(
        starts, lambda i: F.substring(t, i * stride + 1, chunk_size)
    )
    return (
        df.select(
            F.col(id_col),
            F.posexplode(chunks).alias("chunk_id", "chunk_text"),
        )
        .withColumn("chunk_len", F.length("chunk_text"))
    )


def langid_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-hit score per language + argmax prediction (deterministic
    tie-break: language name asc)."""
    t = F.lower(F.col(text_col))
    out = df
    for lang, markers in LANG_MARKERS.items():
        pat = r"\b(" + "|".join(markers) + r")\b"
        out = out.withColumn(f"score_{lang}", _rc(t, pat))
    scores = F.array(
        *[
            F.struct(F.col(f"score_{lang}").alias("s"), F.lit(lang).alias("l"))
            for lang in LANG_MARKERS
        ]
    )
    best = F.array_sort(
        scores,
        lambda a, b: F.when(a["s"] > b["s"], -1)
        .when(a["s"] < b["s"], 1)
        .when(a["l"] < b["l"], -1)
        .when(a["l"] > b["l"], 1)
        .otherwise(0),
    )[0]["l"]
    return out.withColumn("predicted_lang", best)


# --------------------------------------------------------------------------
# Training-data curation: scrubbing, markup stripping, repetition,
# benchmark decontamination
# --------------------------------------------------------------------------

_EMAIL_RX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_URL_RX = r"https?://[^\s]+"
_PHONE_RX = r"\+?[0-9][0-9 \-()]{7,}[0-9]"


def scrub_pii(text: Column | str) -> Column:
    """Replace emails / URLs / phone-shaped runs with typed placeholders —
    the standard pre-training scrub. Pure regexp_replace chain: stays in
    codegen, no Python, order fixed (URLs first so their paths can't be
    re-matched as phones)."""
    t = F.col(text) if isinstance(text, str) else text
    t = F.regexp_replace(t, _URL_RX, "<URL>")
    t = F.regexp_replace(t, _EMAIL_RX, "<EMAIL>")
    t = F.regexp_replace(t, _PHONE_RX, "<PHONE>")
    return t


def pseudonymize(
    text: Column | str,
    pattern: str = _EMAIL_RX,
    tag: str = "EMAIL",
    hash_chars: int = 6,
) -> Column:
    """Consistent-surrogate PII replacement: every match of ``pattern``
    becomes ``<TAG_xxxxxx>`` where ``xxxxxx`` is the first ``hash_chars``
    hex of md5(lowercased match) — unlike :func:`scrub_pii`'s flat
    placeholder, the SAME identity maps to the SAME surrogate everywhere
    in the corpus, so cross-document structure (who-talks-to-whom,
    account linkage, dedup keys over contact fields) survives the scrub
    while the raw identifier does not. This is the standard
    pseudonymization contract (GDPR art. 4(5)-style), and the surrogate
    is engine-reproducible (md5), so the whole rewrite is differentially
    checkable.

    Mechanics — ``regexp_replace`` cannot compute a replacement from the
    match, so the rewrite interleaves the split-around-matches pieces
    with per-match surrogates: ``split(text, rx)`` yields n+1 pieces for
    n matches, ``regexp_extract_all`` yields the n matches, and one
    ``aggregate`` stitches ``p0 + sur(m1) + p1 + ... + pn`` back
    together. Pure JVM expressions in the scan stage, no shuffle, no
    Python.
    """
    t = F.col(text) if isinstance(text, str) else text
    ps = F.split(t, pattern)
    ms = F.regexp_extract_all(t, F.lit(f"({pattern})"), F.lit(1))
    nm = F.size(ms)
    sur = lambda m: F.concat(  # noqa: E731
        F.lit(f"<{tag}_"),
        F.substring(F.md5(F.lower(m)), 1, hash_chars),
        F.lit(">"),
    )
    stitched = F.concat(
        F.element_at(ps, 1),
        F.aggregate(
            F.sequence(F.lit(1), nm),
            F.lit(""),
            lambda acc, i: F.concat(
                acc, sur(F.element_at(ms, i)), F.element_at(ps, i + 1)
            ),
        ),
    )
    # sequence(1, 0) would count DOWN — guard the no-match case
    return F.when(nm > 0, stitched).otherwise(t)


def strip_markup(text: Column | str) -> Column:
    """Drop HTML/XML tags and decode the common entities — the boilerplate
    half of web-scrape cleaning (the DOM-walking half is the scrape
    source's job, sources/scrape.py)."""
    t = F.col(text) if isinstance(text, str) else text
    t = F.regexp_replace(t, r"<[^>]+>", " ")
    for ent, ch in [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
                    ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " ")]:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def repetition_ratio(text: Column | str, n: int = 3) -> Column:
    """Gopher-style repetition signal: 1 - distinct/total word n-grams.
    High values flag boilerplate/spam for quality filtering. All
    higher-order array functions — no shuffle, no Python."""
    from .dedup import _bind, word_ngrams

    t = F.col(text) if isinstance(text, str) else text
    w = F.split(F.lower(collapse_whitespace(t)), " ")

    # bind the split ONCE (the unbound transform lambda re-evaluated the
    # normalize/split chain per gram — the word_shingles defect); when
    # total > 0 every window is full, so word_ngrams' gram list equals
    # the historical construction exactly
    def build(ww):
        total = F.greatest(F.size(ww) - (n - 1), F.lit(0))
        return F.struct(
            total.alias("total"),
            F.size(F.array_distinct(word_ngrams(ww, n))).alias("ndist"),
        )

    s = _bind(w, build)
    return F.when(
        s["total"] > 0,
        F.lit(1.0) - s["ndist"] / s["total"],
    ).otherwise(F.lit(0.0))


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 8,
) -> DataFrame:
    """Benchmark decontamination: drop corpus docs sharing any word
    ``ngram``-gram with a benchmark/eval set (the n-gram-collision rule
    used before LLM training runs).

    Scale shape: both sides explode to 8-byte xxhash64 n-gram keys — the
    benchmark side is small (eval sets), so the semi-join of corpus-gram
    keys against it broadcasts; contaminated ids come back as one distinct
    set and anti-join the corpus. Corpus text shuffles zero times.
    """
    from .dedup import word_shingles

    def gram_keys(df, out):
        return df.select(
            F.col(id_col).alias(out),
            F.explode(word_shingles(F.col(text_col), ngram)).alias("g"),
        ).select(out, F.xxhash64("g").alias("gk"))

    corpus_grams = gram_keys(corpus, "cid")
    bench_grams = gram_keys(benchmark, "bid").select("gk").distinct()
    contaminated = (
        corpus_grams.join(F.broadcast(bench_grams), "gk")
        .select(F.col("cid").alias(id_col))
        .distinct()
    )
    return corpus.join(contaminated, id_col, "left_anti")


#: minimal polarity lexicons (PAPERS.md: "Large Scale Sentiment Analysis on
#: Twitter with Spark", EDBT 2016 — lexicon-based scoring is its baseline;
#: the Spark shape (per-doc token-lexicon intersection counts, no shuffle)
#: is identical with a real lexicon like AFINN swapped in).
POSITIVE_WORDS = ["good", "great", "excellent", "love", "best", "happy"]
NEGATIVE_WORDS = ["bad", "terrible", "awful", "hate", "worst", "sad"]


def sentiment_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Lexicon polarity: counts of positive/negative tokens and the
    normalized polarity (pos-neg)/(pos+neg), NULL when no hits. Pure
    higher-order array expressions; int/int division is deterministic."""
    t = F.col(text_col)
    toks = F.split(F.lower(collapse_whitespace(t)), " ")
    pos_arr = F.array(*[F.lit(wd) for wd in POSITIVE_WORDS])
    neg_arr = F.array(*[F.lit(wd) for wd in NEGATIVE_WORDS])
    n_pos = F.size(F.filter(toks, lambda w: F.array_contains(pos_arr, w)))
    n_neg = F.size(F.filter(toks, lambda w: F.array_contains(neg_arr, w)))
    return df.withColumns(
        {
            "n_pos": n_pos,
            "n_neg": n_neg,
            "polarity": F.when(
                (n_pos + n_neg) > 0, (n_pos - n_neg) / (n_pos + n_neg)
            ),
        }
    )


def token_chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_per_chunk: int = 100,
) -> DataFrame:
    """Split each document into fixed-size TOKEN windows (whitespace
    tokens, no overlap) — the context-length-aware variant of
    ``chunk_documents``: chunk boundaries never split a token, and chunk
    size is denominated in the unit the downstream model consumes.

    Same scale shape as the char chunker: sequence -> transform ->
    posexplode entirely JVM-side, a narrow flatMap with no shuffle and no
    Python; chunks stay co-partitioned with their document.

    Returns (id, chunk_id, chunk, n_tokens); empty documents yield no rows.
    """
    from .dedup import _bind

    tpc = tokens_per_chunk

    # the token array is bound once per row (the unbound lambda
    # re-evaluated the split+filter chain twice per chunk — the
    # word_shingles defect); values unchanged
    def build(toks):
        n = F.size(toks)
        n_chunks = F.ceil(n / F.lit(tpc)).cast("int")
        # sequence(0, -1) counts DOWN — slice to n_chunks so empty docs
        # yield an empty array, not phantom chunks
        starts = F.slice(
            F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))),
            1,
            n_chunks,
        )
        return F.transform(
            starts,
            lambda i: F.struct(
                F.array_join(F.slice(toks, i * tpc + 1, tpc), " ").alias(
                    "chunk"
                ),
                F.size(F.slice(toks, i * tpc + 1, tpc)).alias("n_tokens"),
            ),
        )

    chunks = _bind(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit("")),
        build,
    )
    return df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_id", "_c")
    ).select(id_col, "chunk_id", F.col("_c.chunk").alias("chunk"),
             F.col("_c.n_tokens").alias("n_tokens"))


def unigram_logprob_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Language-model quality score: mean log-probability of each
    document's tokens under the corpus's own unigram distribution
    (add-one smoothed). Gibberish and vocabulary-outlier documents score
    low; the standard cheap stand-in for a perplexity filter when no
    external LM is available.

    Scale shape: one shuffle to build the vocabulary count table (small —
    vocabulary-sized), broadcast back onto the exploded token stream, one
    shuffle to re-aggregate per document. All arithmetic JVM-side
    (``F.ln``); float summation order makes it rows-only for the oracle,
    pinned instead by a numpy cross-check test.

    Returns (id, n_tokens, mean_logprob).
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")

    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    totals = vocab.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("v_size")
    )
    scored = (
        toks.join(F.broadcast(vocab), "term")
        .join(F.broadcast(totals))
        .withColumn(
            "lp",
            F.log((F.col("cnt") + 1) / (F.col("total") + F.col("v_size"))),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (F.sum("lp") / F.count(F.lit(1))).alias("mean_logprob"),
    )


def hashing_trick_features(tokens: Column, dim: int = 16) -> Column:
    """Feature-hashing ("hashing trick", Weinberger et al. 2009) bag-of-
    tokens embedding: a ``dim``-bucket token-count vector, as
    ``array<double>``.  The vocabulary-free featurizer for retrieval-index
    builds: no vocabulary shuffle, no model to fit or ship — each row's
    vector is a pure function of its tokens.

    Deterministic md5-based bucket hash (see dedup.shingle_hash_expr
    ``md5_60``), so the embedding is bit-reproducible in any engine —
    the retrieval pipeline built on it is differentially testable
    end-to-end.  All JVM higher-order functions; one pass over tokens
    (hash hoisted out of the per-bucket counts).
    """
    from .dedup import _bind, shingle_hash_expr

    # the hashed-token array is BOUND once per row (round 14): an
    # unbound reference inside the per-bucket lambda re-hashed every
    # token once per bucket (dim x) in the interpreted evaluator
    return _bind(
        F.transform(
            tokens,
            lambda t: F.pmod(shingle_hash_expr(t, "md5_60"), F.lit(dim)),
        ),
        lambda hashed: F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: F.size(F.filter(hashed, lambda x: x == j)).cast(
                "double"
            ),
        ),
    )


def bloom_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 8,
    n_words: int = 1 << 16,
    k: int = 4,
    hash_fn: str = "md5_60",
) -> DataFrame:
    """:func:`decontaminate` for benchmark sets too big to broadcast as an
    exact key list: the membership structure is a split-block Bloom filter
    (one 63-bit block per n-gram, ``k`` bits set inside it — the
    cache-local design parquet's column filters use), built with plain
    SQL expressions and a ``bit_or`` aggregate. The filter table is
    ``n_words`` rows of (word, bits) — fixed size regardless of benchmark
    size — so IT broadcasts even when the benchmark's n-gram set never
    could.

    Guarantees: ZERO false negatives (every truly contaminated doc is
    dropped — the safe direction for decontamination); false positives
    drop extra docs at a rate set by n_words * 63 bits vs benchmark
    n-gram count (~k*(n/(63*n_words))^k per probed gram).

    Scale shape: benchmark side is one bit_or aggregation to ``n_words``
    rows; corpus grams compute (word, mask) in the scan stage and
    broadcast-join the filter table; corpus text shuffles zero times.
    With ``hash_fn='md5_60'`` both hash lanes (h1 selects the block, h2's
    6-bit fields select bits) are engine-reproducible, so even this
    probabilistic operator admits an exact DuckDB oracle.
    """
    from .dedup import shingle_hash_expr, word_shingles

    def probes(df, out):
        g = F.explode(word_shingles(F.col(text_col), ngram)).alias("g")
        base = df.select(F.col(id_col).alias(out), g)
        if hash_fn == "md5_60":
            h1 = shingle_hash_expr(F.col("g"), "md5_60")
            h2 = shingle_hash_expr(F.concat(F.lit("2#"), F.col("g")), "md5_60")
        else:
            h1 = F.xxhash64(F.col("g"), F.lit(1))
            h2 = F.xxhash64(F.col("g"), F.lit(2))
        # shiftleft's bit-count arg must be a literal in the Python API, so
        # the per-row shift goes through an expr string over the h2 column
        mask_sql = " | ".join(
            "shiftleft(CAST(1 AS BIGINT),"
            f" CAST(pmod(shiftright(h2, {6 * i}), 63) AS INT))"
            for i in range(k)
        )
        return base.withColumn("h2", h2).select(
            out,
            F.pmod(h1, F.lit(n_words)).alias("word"),
            F.expr(mask_sql).alias("mask"),
        )

    bfilter = (
        probes(benchmark, "bid")
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    contaminated = (
        probes(corpus, "cid")
        .join(F.broadcast(bfilter), "word")
        .filter(F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask"))
        .select(F.col("cid").alias(id_col))
        .distinct()
    )
    return corpus.join(contaminated, id_col, "left_anti")


def contamination_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 8,
) -> DataFrame:
    """Fractional benchmark contamination: per corpus doc, the share of
    its distinct word ``ngram``-grams that appear in the benchmark set —
    the graded signal behind the binary :func:`decontaminate` drop rule
    (curation pipelines threshold on the fraction, e.g. >0.1, rather
    than any-hit, to tolerate idiom-level collisions).

    Returns ``(doc_id, n_grams, n_hit, overlap_frac)``; the fraction is
    one bigint/bigint division (cross-engine exact).

    Scale shape: same as decontaminate — gram keys are 8-byte hashes,
    the benchmark side broadcasts, corpus text shuffles zero times; the
    per-doc tally is one agg on the doc id.
    """
    from .dedup import word_shingles

    def gram_keys(df, out):
        return df.select(
            F.col(id_col).alias(out),
            F.explode(word_shingles(F.col(text_col), ngram)).alias("g"),
        ).select(out, F.xxhash64("g").alias("gk"))

    cg = gram_keys(corpus, id_col)
    bench = gram_keys(benchmark, "bid").select("gk").distinct().withColumn(
        "_hit", F.lit(1)
    )
    return (
        cg.join(F.broadcast(bench), "gk", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hit"),
        )
        .select(
            id_col,
            "n_grams",
            "n_hit",
            (F.col("n_hit") / F.col("n_grams")).alias("overlap_frac"),
        )
    )


def gopher_repetition(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple = (2, 3, 4),
    dup_ns: tuple = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """The full Gopher repetition-signal battery (Rae et al. 2021,
    arXiv:2112.11446 Table A1): per document,

    - ``top_{n}gram_char_frac`` for n in ``top_ns``: fraction of the
      document's characters contained in occurrences of its single most
      frequent word n-gram (count x char-length of the gram / doc chars;
      ties broken by longer gram then lexicographic — deterministic).
    - ``dup_{n}gram_char_frac`` for n in ``dup_ns``: fraction of
      characters covered by word n-grams that occur 2+ times, counting
      overlapping occurrences ONCE (the paper's "taking care not to
      count characters that occur in overlapping n-grams more than
      once") — a per-(doc, n) interval union over the occurrences' char
      spans, the same running-max merge as the ExactSubstr span
      detector but with variable-width [s, e] intervals.

    Completes :func:`repetition_ratio` (one scalar signal) into the
    filter set production pipelines actually run (Gopher / NeMo-Curator
    / Dolma all apply this battery before training).

    Scale shape: ONE explode produces all (n, gram, char-span) rows for
    every n at once (sum_n (W-n+1) rows per doc, built in-row with
    higher-order functions over pre-computed word-start offsets); gram
    counting is one window over (doc, n, gram) and the span union one
    window over (doc, n) — two exchanges total, both on keys that
    cannot skew beyond a single document's grams. Fractions are
    int/int divisions (cross-engine exact).

    Text is lowercased and whitespace-collapsed first; the denominator
    is the character length of that normalized text.

    Gram identity is a 64-bit hash key. Word hashes combine into each
    n-gram key via ``xxhash64(h_i, lead(h,1), .., lead(h,n-1))``, so the
    gram STRING is never materialized or shuffled on the hot path — a
    64-bit key collision within one (doc, n) group (probability
    ~ W^2 / 2^64 per document) would merge two distinct grams' counts;
    the same accepted trade as the ExactSubstr k-gram hash counter.
    Actual gram strings are cut (one codegen ``substring`` over the
    normalized text) ONLY for the top-gram tie-break candidates — a
    handful of rows per (doc, n), joined back to the text equi on the
    id.

    Scale shape (round-11 rewrite): one posexplode to W word rows, ONE
    doc-keyed window computing char offsets (running sum) plus the
    lead chains for every n, then a codegen ``stack`` generator to the
    sum_n (W-n+1) gram rows — longs only. The previous in-row
    ``aggregate`` fold built the offset array by array-append, O(W^2)
    copies per document: fine at 200-word docs, catastrophic on a
    100k-word document at 100 TB. The window running-sum form is
    O(W log W) and bounded by the longest single document. Measured at
    sf0.1: honest materialized cost 7.1 s -> see SCALE.md (the r9/r10
    bench numbers were count()-elimination artifacts).
    """
    from pyspark.sql import Window

    all_ns = sorted(set(top_ns) | set(dup_ns))
    base = df.select(
        F.col(id_col),
        F.lower(collapse_whitespace(F.col(text_col))).alias("t"),
    ).withColumn("n_chars", F.length("t").cast("long"))
    # one row per word: position, char length, word hash
    wrows = base.select(
        id_col,
        "n_chars",
        F.posexplode(F.split("t", " ")).alias("i", "w"),
    ).select(
        id_col,
        "n_chars",
        "i",
        F.length("w").cast("long").alias("wl"),
        F.xxhash64("w").alias("h"),
    )
    doc_w = Window.partitionBy(id_col).orderBy("i")
    # 1-based char start: 1 + sum(previous word lengths + separators)
    run = F.sum(F.col("wl") + F.lit(1)).over(
        doc_w.rowsBetween(Window.unboundedPreceding, -1)
    )
    wrows = wrows.withColumn(
        "s", F.coalesce(run, F.lit(0).cast("long")) + F.lit(1)
    ).withColumn("e", F.col("s") + F.col("wl") - 1)
    # lead chains + stack are built PER BRANCH over its own n-set
    # (round-12 metric audit): one shared `occ` for all n looked
    # optimal, but each branch's n.isin() filter PUSHES below the
    # repartition and the stack, forking the posexplode+window+stack
    # pipeline into two full-width copies — both branches stacked
    # sum_{all n}(W-n+1) rows and immediately dropped the other's (the
    # status store showed two 541k-row Generates per curation run).
    # Per-branch stacks emit only their own rows, the lead chains prune
    # to the branch's largest n, and the shared word-offset prefix
    # (posexplode + running-sum window) below the doc Exchange(id) is
    # stage-reused across the branches.
    cnt_w = Window.partitionBy(id_col, "n", "k")

    def _occ(ns):
        # lead semantics: e_n = end of word i+n-1; k_n = hash of the n
        # word hashes (NULL leads past the doc boundary mean "no such
        # gram" and are filtered after the stack — xxhash64 would
        # silently SKIP a NULL arg and alias a shorter gram otherwise)
        ns = sorted(set(ns))
        proj = [F.col(id_col), F.col("n_chars"), F.col("s")]
        for n in ns:
            hs = [F.col("h")] + [
                F.lead("h", j).over(doc_w) for j in range(1, n)
            ]
            e_n = F.col("e") if n == 1 else F.lead("e", n - 1).over(doc_w)
            proj.append(e_n.alias(f"e{n}"))
            proj.append(F.xxhash64(*hs).alias(f"k{n}"))
        led = wrows.select(*proj)
        stack_args = ", ".join(
            f"cast({n} as int), s, e{n}, k{n}" for n in ns
        )
        return (
            led.select(
                id_col,
                "n_chars",
                F.expr(
                    f"stack({len(ns)}, {stack_args}) as (n, s, e, k)"
                ),
            )
            .filter(F.col("e").isNotNull())
            # one exchange serves this branch's windows: hash on
            # (doc, n) satisfies the cnt window's (doc, n, k)
            # clustering AND the top/max / span-union windows' (doc, n)
            # — without it each window re-shuffles (measured 3.10 ->
            # 2.70 s interleaved at sf0.1). Group width is one
            # document's grams for one n — bounded by doc length.
            .repartition(id_col, "n")
            .withColumn("cnt", F.count(F.lit(1)).over(cnt_w))
        )

    # top-n-gram char fraction: one row per (doc, n in top_ns).
    # Tie-break (cnt desc, gram length desc, gram lexicographic) runs in
    # two hash-only phases (max cnt, then max len) before the string
    # phase: only the surviving candidates get their gram text cut.
    wmax = Window.partitionBy(id_col, "n")
    tocc = (
        _occ(top_ns)
        .withColumn("len", F.col("e") - F.col("s") + 1)
        .withColumn("mxc", F.max("cnt").over(wmax))
        .filter(F.col("cnt") == F.col("mxc"))
        .withColumn("mxl", F.max("len").over(wmax))
        .filter(F.col("len") == F.col("mxl"))
    )
    cand = tocc.groupBy(id_col, "n_chars", "n", "k", "cnt", "len").agg(
        F.min("s").alias("s")
    )
    top_rank = Window.partitionBy(id_col, "n").orderBy(F.col("g"))
    top = (
        cand.join(base.select(id_col, "t"), id_col)
        .withColumn("g", F.expr("substring(t, s, len)"))
        .withColumn("rk", F.row_number().over(top_rank))
        .filter(F.col("rk") == 1)
        .select(
            id_col,
            "n",
            (F.col("cnt") * F.col("len") / F.col("n_chars")).alias("frac"),
        )
    )

    # duplicate-n-gram char coverage: interval union of cnt>=2 spans
    span_w = Window.partitionBy(id_col, "n").orderBy("s", "e")
    dup = (
        _occ(dup_ns).filter(F.col("cnt") >= 2)
        .withColumn(
            "prev_e",
            F.max("e").over(span_w.rowsBetween(Window.unboundedPreceding, -1)),
        )
        .withColumn(
            "new_span",
            F.when(F.col("prev_e").isNull() | (F.col("s") > F.col("prev_e")), 1)
            .otherwise(0),
        )
        .withColumn(
            "span_id",
            F.sum("new_span").over(span_w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy(id_col, "n_chars", "n", "span_id")
        .agg((F.max("e") - F.min("s") + 1).alias("cov"))
        .groupBy(id_col, "n_chars", "n")
        .agg(F.sum("cov").alias("cov"))
        .select(id_col, "n", (F.col("cov") / F.col("n_chars")).alias("frac"))
    )

    # assemble: one union + one conditional-agg pivot + one left join
    # (NOT one join per signal — that would be 9 join stages)
    combined = top.withColumn("kind", F.lit("top")).unionAll(
        dup.withColumn("kind", F.lit("dup"))
    )
    aggs = [
        F.max(
            F.when((F.col("kind") == "top") & (F.col("n") == n), F.col("frac"))
        ).alias(f"top_{n}gram_char_frac")
        for n in top_ns
    ] + [
        F.max(
            F.when((F.col("kind") == "dup") & (F.col("n") == n), F.col("frac"))
        ).alias(f"dup_{n}gram_char_frac")
        for n in dup_ns
    ]
    sig = combined.groupBy(id_col).agg(*aggs)
    cols = [f"top_{n}gram_char_frac" for n in top_ns] + [
        f"dup_{n}gram_char_frac" for n in dup_ns
    ]
    return base.select(id_col).join(sig, id_col, "left").select(
        id_col, *[F.coalesce(F.col(c), F.lit(0.0)).alias(c) for c in cols]
    )


# --------------------------------------------------------------------------
# Payment-card PII: Luhn validation + scrub (north-star §2b PII family)
# --------------------------------------------------------------------------


def luhn_checksum(digits: Column, shift: int = 0) -> Column:
    """Luhn mod-10 checksum of a digits-only string as a pure expression
    tree (no UDF): reverse, double every second digit from the right,
    fold-sum.  ``shift=1`` computes the sum as if a check digit will be
    APPENDED (body digits move one position left) — used to mint valid
    numbers in tests/oracles.  Valid numbers have ``luhn_checksum(...) % 10
    == 0``."""
    rev = F.reverse(digits)

    def contrib(i: Column) -> Column:
        v = F.ascii(rev.substr(i, F.lit(1))) - 48
        v2 = v * 2
        doubled = F.when(v2 > 9, v2 - 9).otherwise(v2)
        return F.when((i + F.lit(shift)) % 2 == 0, doubled).otherwise(v)

    return F.aggregate(
        F.transform(F.sequence(F.lit(1), F.length(rev)), contrib),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def luhn_valid(digits: Column) -> Column:
    """True iff the digits-only string passes the Luhn check (the checksum
    every real payment-card number satisfies) — the standard false-positive
    filter on digit runs before scrubbing them as card numbers."""
    return luhn_checksum(digits) % 10 == 0


# tokenize text into alternating maximal digit / non-digit runs: candidates
# are then MAXIMAL digit runs only.  A bare [0-9]{13,19} extract had two
# false-positive modes (ADVICE round 2): a 20+-digit id yields its first 19
# digits as a candidate (Luhn-passing ~10% of the time -> '<CARD>' spliced
# mid-number), and a real card abutting other digits is absorbed into a
# longer run yet still "found" via its prefix.  RE2-safe (no lookarounds).
_TOKEN_RUN_RX = r"[0-9]+|[^0-9]+"
_CARD_EXACT_RX = r"^[0-9]{13,19}$"
# separator-tolerant form (ADVICE round 3 — mirrors the maximal-run fix):
# tokenize into maximal [0-9 -] runs, so a candidate can never sit inside
# a longer digit sequence (its neighbors are non-digit non-separator by
# construction) and the rewrite is token-wise, never a substring splice.
# A run is a candidate iff its separator-trimmed core has a plausible card
# grouping (1-6 groups of >=2 digits joined by SINGLE separators — rules
# out scattered number columns like '12 34 56 78 90 12 3') and its digits
# are 13-19 long and Luhn-valid.  RE2-safe; only the contiguous form is
# oracle-mirrored.
_SEP_RUN_RX = r"[0-9 -]+|[^0-9 -]+"
_CARD_GROUPED_RX = r"^[0-9]{2,}(?:[ -][0-9]{2,}){0,5}$"
# quarantine-only run class: digits grouped by ANY common separator
# (space/dash/dot/underscore) count as one run for the digit-mass flag —
# wider than the scrub classes on purpose; see has_suspicious_digit_run
_QUARANTINE_RUN_RX = r"[0-9 ._-]+"


def _card_tokens(t: Column) -> Column:
    return F.regexp_extract_all(t, F.lit(_TOKEN_RUN_RX), 0)


def _sep_tokens(t: Column) -> Column:
    return F.regexp_extract_all(t, F.lit(_SEP_RUN_RX), 0)


def _sep_core(tok: Column) -> Column:
    """A digit-ish run minus leading/trailing separators."""
    return F.regexp_replace(tok, r"^[ -]+|[ -]+$", "")


def _sep_is_card(tok: Column) -> Column:
    core = _sep_core(tok)
    digits = F.regexp_replace(core, r"[ -]", "")
    return (
        core.rlike(_CARD_GROUPED_RX)
        & F.length(digits).between(13, 19)
        & luhn_valid(digits)
    )


def find_payment_cards(text: Column | str, tolerate_separators: bool = False) -> Column:
    """Array of Luhn-valid card-number candidates found in free text.
    Candidates are *maximal* digit runs of card-plausible length (13-19);
    Luhn filters the overwhelming majority of incidental numbers (ids,
    timestamps) — doubling precision is exactly why scrubbers use it."""
    t = F.col(text) if isinstance(text, str) else text
    if tolerate_separators:
        return F.transform(
            F.filter(_sep_tokens(t), _sep_is_card), _sep_core
        )
    return F.filter(
        _card_tokens(t),
        lambda c: c.rlike(_CARD_EXACT_RX) & luhn_valid(c),
    )


def has_suspicious_digit_run(text: Column | str, min_digits: int = 13) -> Column:
    """True when the text carries a maximal digit-ish run of
    ``min_digits``+ digits — the QUARANTINE predicate for the scrubbers'
    deliberate fail-open direction.

    Both scrub paths trade recall for splice-safety: a Luhn-valid card
    that ABUTS other digits (``total 12 34 4111 1111 1111 1111``) merges
    into one >19-digit run, fails the card gates, and ships UNSCRUBBED.
    Run this predicate on the *scrubbed* output: any surviving run with
    card-scale digit mass marks a row for quarantine/manual review, so
    the precision-first scrub never silently leaks — rows it could not
    decide are flagged instead of passed.  Pure expression, zero shuffle.

    The quarantine's run class is WIDER than the scrubbers' (``[0-9 ._-]``
    vs ``[0-9 -]``): a card grouped by separators the scrubber does not
    recognize (``4111.1111.1111.1111``, ``4111_1111_1111_1111``) is not
    scrubbable, so it MUST at least be flagged — with the scrubber's own
    class each dot-separated group would be a short independent run and
    the card would leak silently (ADVICE round 4).  The widening is
    review-side only (flags a few more version-string-like rows for
    review); it never changes what gets scrubbed.
    """
    t = F.col(text) if isinstance(text, str) else text
    return F.exists(
        F.regexp_extract_all(t, F.lit(_QUARANTINE_RUN_RX), 0),
        lambda tok: F.length(F.regexp_replace(tok, r"[^0-9]", "")) >= min_digits,
    )


def scrub_payment_cards(text: Column | str, tolerate_separators: bool = False) -> Column:
    """Replace every Luhn-valid card number with ``<CARD>``.  The contiguous
    form rewrites token-wise — split into digit/non-digit runs, map card
    runs to the placeholder, rejoin — so a candidate's digit string is never
    rewritten where it occurs *inside* another number, and the same card
    appearing twice in a row is caught both times.  Stays entirely in
    codegen: extract + transform + join are all native higher-order
    functions.

    FAIL-OPEN BY DESIGN: a card that abuts other digits (or digit groups,
    in the separator-tolerant form) merges into a run that fails the card
    gates and passes through UNSCRUBBED — the price of never splicing
    ``<CARD>`` into a different number.  Pair with
    :func:`has_suspicious_digit_run` on the scrubbed output to quarantine
    exactly those undecidable rows instead of silently shipping them."""
    t = F.col(text) if isinstance(text, str) else text
    if tolerate_separators:
        # token-wise rewrite over maximal [0-9 -] runs (ADVICE round 3 —
        # the old aggregate/replace form could splice '<CARD>' into a
        # DIFFERENT longer number containing the same digit string);
        # leading/trailing separators of the run are preserved so spacing
        # around the scrubbed card survives
        return F.array_join(
            F.transform(
                _sep_tokens(t),
                lambda tok: F.when(
                    _sep_is_card(tok),
                    F.concat(
                        F.regexp_extract(tok, r"^[ -]*", 0),
                        F.lit("<CARD>"),
                        F.regexp_extract(tok, r"[ -]*$", 0),
                    ),
                ).otherwise(tok),
            ),
            "",
        )
    return F.array_join(
        F.transform(
            _card_tokens(t),
            lambda c: F.when(
                c.rlike(_CARD_EXACT_RX) & luhn_valid(c), F.lit("<CARD>")
            ).otherwise(c),
        ),
        "",
    )


def _validate_merges(merges: list[tuple[str, str]]) -> None:
    for l, r in merges:
        if " " in l or " " in r:
            raise ValueError("bpe_segment: merge sides cannot contain spaces")


def _bpe_word_tokens(w: Column, pats: Column) -> Column:
    """Apply the flank-encoded BPE merge fold (see :func:`bpe_segment`)
    to one word column, returning its subword token array."""
    return F.split(
        F.trim(
            F.aggregate(
                pats,
                F.concat(
                    F.lit(" "), F.array_join(F.split(w, ""), "  "), F.lit(" ")
                ),
                lambda acc, m: F.replace(
                    acc, m, F.replace(m, F.lit("  "), F.lit(""))
                ),
            )
        ),
        "  ",
    )


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Byte-pair-encoding subword segmentation as pure JVM expressions —
    ``(id_col, tokens)`` where ``tokens`` applies an ordered BPE merge
    table to every whitespace word.

    Encoder: each word is rendered with a TWO-space separator and
    one-space flanks — ``" " + join(chars, "  ") + " "`` — so every
    token owns exactly one flank space on each side and token
    boundaries are unambiguous in the flat string. Each merge
    ``(l, r)`` is one left-to-right non-overlapping
    ``replace(acc, ' l  r ', ' lr ')``, folded over the merge table IN
    RANK ORDER by ``aggregate`` (a higher-order expression — no UDF,
    no Python, no regex). The flanked pattern can only match WHOLE
    adjacent tokens (``l`` as a suffix of a longer token has a
    non-space char before it, so `` l  `` cannot match), and because a
    match consumes only the matched pair's own flank spaces, adjacent
    occurrences in a run (``a a a a`` under merge ``(a,a)``) each
    still see their neighbours' flanks intact — leftmost-greedy
    non-overlapping replacement over this encoding is exactly BPE's
    leftmost-pair behaviour. A single pass per rank is exact for
    TRAINED merge tables: a table built by BPE training is
    topologically ordered (each merge's sides are base characters or
    products of strictly-earlier merges, and the token a merge creates
    can only feed LATER-ranked merges), so processing ranks once, in
    order, reaches the same fixpoint as the rescan-after-every-merge
    loop.

    This upgrades the whitespace/regex token-count heuristics to the
    segmentation an actual tokenizer would produce (pass a real
    ``merges.txt`` as ``[(l, r), ...]``), while staying inside
    whole-stage codegen and bit-reproducible across engines — the merge
    fold is string-exact, no model file, no library.

    Scale shape: entirely scan-stage (split -> per-word fold -> split);
    zero shuffles, zero Python. Merge-table size only grows the folded
    expression per row (a ~50k-merge production table would instead be
    passed as an array column via a broadcast literal — same plan).
    """
    _validate_merges(merges)
    pats = F.array(*[F.lit(f" {l}  {r} ") for l, r in merges])
    words = F.split(F.lower(collapse_whitespace(F.col(text_col))), " ")
    seg = F.transform(words, lambda w: _bpe_word_tokens(w, pats))
    return docs.select(F.col(id_col), F.flatten(seg).alias("tokens"))


def bpe_segment_table(
    docs: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    left_col: str = "left",
    right_col: str = "right",
) -> DataFrame:
    """:func:`bpe_segment` with the merge table as a DATAFRAME — the
    production path for real tokenizer tables (a 50k-merge ``merges.txt``
    loaded as (rank, left, right) rows), where folding 50k string
    literals into the expression tree would blow past codegen limits.

    The table collapses to ONE row holding the rank-ordered pattern
    array (same ``' l  r '`` flank encoding as :func:`bpe_segment`) and
    ships as a broadcast; the per-word fold is the identical expression,
    so the plan is :func:`bpe_segment`'s plus one BroadcastNestedLoopJoin
    of a single row. Merge sides containing spaces are rejected IN-PLAN
    (``raise_error`` branch) since the table contents aren't visible at
    build time.
    """
    ms = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(rank_col).alias("r"),
                F.col(left_col).alias("l"),
                F.col(right_col).alias("rt"),
            )
        )
    )
    pats_row = merges.agg(
        F.transform(
            ms,
            lambda m: F.when(
                m["l"].contains(" ") | m["rt"].contains(" "),
                F.raise_error(
                    F.lit("bpe_segment_table: merge sides cannot contain spaces")
                ),
            ).otherwise(
                F.concat(
                    F.lit(" "), m["l"], F.lit("  "), m["rt"], F.lit(" ")
                )
            ),
        ).alias("_pats")
    )
    words = F.split(F.lower(collapse_whitespace(F.col(text_col))), " ")
    seg = F.transform(words, lambda w: _bpe_word_tokens(w, F.col("_pats")))
    return (
        docs.join(F.broadcast(pats_row))
        .select(F.col(id_col), F.flatten(seg).alias("tokens"))
    )


def bpe_token_frequencies(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    top_k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide BPE token frequency census: ``(token, n_occurrences,
    rank)`` for the ``top_k`` most frequent subword tokens under the
    given merge table — the vocabulary-coverage report run when fitting
    or auditing a tokenizer against a corpus.

    Scale shape: segmentation is deterministic per WORD, so the corpus
    word stream is Zipf-collapsed FIRST (one count agg to the distinct
    vocabulary) and the merge fold runs once per distinct word, not once
    per occurrence — on natural text that is orders of magnitude less
    fold work (heaps' law vocabulary vs corpus size), and it is the
    difference between the fold cost scaling with corpus bytes vs with
    vocabulary bytes at 100 TB. Token counts then weight each word's
    tokens by the word's frequency: one small second agg over
    (vocabulary x tokens-per-word) rows + TakeOrdered top-k."""
    _validate_merges(merges)
    pats = F.array(*[F.lit(f" {l}  {r} ") for l, r in merges])
    words = docs.select(
        F.explode(
            F.split(F.lower(collapse_whitespace(F.col(text_col))), " ")
        ).alias("w")
    )
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    toks = vocab.select(
        "n", F.explode(_bpe_word_tokens(F.col("w"), pats)).alias("token")
    )
    counts = toks.groupBy("token").agg(F.sum("n").alias("n_occurrences"))
    top = counts.orderBy(F.col("n_occurrences").desc(), "token").limit(top_k)
    w = Window.orderBy(F.col("n_occurrences").desc(), "token")
    return top.withColumn("rank", F.row_number().over(w)).select(
        "token", "n_occurrences", "rank"
    )


def bpe_train_merges(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_frequency: int = 2,
    checkpoint_every: int = 8,
    initial_merges: DataFrame | None = None,
    pair_score: str = "count",
) -> DataFrame:
    """TRAIN a BPE merge table on the corpus — the iterative
    pair-count -> top-pair -> merge loop of Sennrich et al.
    (arXiv:1508.07909), distributed so each iteration costs one
    VOCABULARY-sized job, never a corpus-sized one. This closes the
    engine's last tokenizer gap: :func:`bpe_segment` /
    :func:`bpe_segment_table` apply a given table; this produces one
    from the corpus it will segment.

    Algorithm (exactly the published one):

    1. Zipf-collapse the corpus word stream to ``(word, count)`` — ONE
       corpus-sized aggregation, paid once. Each word is held in the
       proven flank encoding of :func:`bpe_segment`
       (``" c1  c2  ... "``: two-space separator, one-space flanks), so
       the per-iteration merge IS the boundary-exact
       ``replace(' l  r ', ' lr ')`` that encoder uses.
    2. Per iteration: count adjacent symbol pairs weighted by word
       frequency (overlapping occurrences count, as in the reference
       trainer: ``aaaa`` contributes 3 to ``(a,a)``), pick the most
       frequent pair — ties broken by ``(left, right)`` ascending so
       training is DETERMINISTIC across engines and partitionings — and
       fuse it in every word with one leftmost-greedy non-overlapping
       replace (the flank encoding makes that exactly BPE's leftmost
       merge order).
    3. Stop early when no pair reaches ``min_frequency`` (the reference
       trainer's ``most_frequent < 2`` stop).

    ``pair_score`` selects the merge-choice objective:

    - ``"count"`` (default): the raw pair frequency — classic BPE;
    - ``"wordpiece"``: the WordPiece likelihood ratio ``count(lr) /
      (count(l) * count(r))`` (Schuster & Nakajima 2012 / the BERT
      tokenizer's objective), in scaled integers:
      ``score = c12 * 10^12 div (c_l * c_r)`` over decimal(38,0)
      products (symbol-count products at corpus scale overflow bigint),
      ties broken by ``(left, right)`` ascending. WordPiece prefers
      pairs that co-occur MORE than their parts' popularity predicts —
      rare-but-bound morphemes win over frequent-but-independent
      stopword collisions. The ``min_frequency`` stop still applies to
      the raw count (a high-ratio singleton is still noise).

    ``initial_merges``: RESUME training from an existing ``(rank, left,
    right)`` table (ours or a loaded ``merges.txt``): the prior merges
    are folded over the fresh vocabulary in rank order, and new merges
    continue at ``max(rank) + 1``. Because the vocabulary state after k
    merges is a pure function of the merge table, training 12 merges in
    one run and training 6 then resuming for 6 more produce the SAME
    table on the same corpus (pinned in tests) — and on a GROWN corpus
    this is exactly incremental tokenizer extension: keep the deployed
    prefix stable, learn new merges from the updated counts.

    Returns a driver-sized ``(rank, left, right, pair_count)`` DataFrame
    of the NEW merges only (``n_merges`` rows at most) — union with the
    initial table for the full vocabulary, or feed either to
    :func:`bpe_segment_table`. The trained table is topologically
    ordered by construction, which is precisely the property that makes
    the single-pass rank-order apply fold exact.

    Scale shape: pair extraction is in-row (``arrays_zip`` of two
    shifted slices — the codegen form, no interpreted HOF lambda); the
    pair-count aggregation and the merge replace touch only the DISTINCT
    vocabulary (Heaps' law: ~100M rows at 100 TB of text, not 10T), so
    per-iteration cost is independent of corpus size. The driver
    collects ONE row per iteration (the argmax pair — driver-sized by
    definition). Lineage is cut every ``checkpoint_every`` iterations
    with ``localCheckpoint`` (the :func:`~..graph.pagerank_fixed`
    discipline), so iteration ``k`` never replays ``k`` replaces over
    the base aggregation, and the corpus itself is scanned exactly once.
    """
    if n_merges < 1:
        raise ValueError(
            f"bpe_train_merges: n_merges must be >= 1, got {n_merges!r}"
        )
    if min_frequency < 1:
        raise ValueError(
            "bpe_train_merges: min_frequency must be >= 1, got "
            f"{min_frequency!r}"
        )
    if pair_score not in ("count", "wordpiece"):
        raise ValueError(
            "bpe_train_merges: pair_score must be 'count' or 'wordpiece', "
            f"got {pair_score!r}"
        )
    spark = docs.sparkSession
    words = docs.select(
        F.explode(
            F.split(F.lower(collapse_whitespace(F.col(text_col))), " ")
        ).alias("w")
    ).filter(F.col("w") != "")
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.concat(
                F.lit(" "), F.array_join(F.split(F.col("w"), ""), "  "),
                F.lit(" "),
            ).alias("enc"),
            "n",
        )
        # cut here so the corpus-sized word aggregation runs ONCE; every
        # later iteration starts from the materialized vocabulary
        .localCheckpoint(eager=True)
    )
    rank0 = 0
    if initial_merges is not None:
        # fold the prior table over the fresh vocabulary in rank order —
        # driver-sized by definition (one row per merge); after this the
        # vocabulary is in exactly the state the prior training left it
        prior = initial_merges.orderBy("rank").select(
            "rank", "left", "right"
        ).collect()
        # replay in chunks of 64 replaces with a checkpoint between, so
        # a production-sized prior table (50k merges) never builds one
        # codegen-breaking expression tree
        for i0 in range(0, len(prior), 64):
            enc_expr = F.col("enc")
            for row in prior[i0:i0 + 64]:
                l, r = row["left"], row["right"]
                if " " in l or " " in r:
                    raise ValueError(
                        "bpe_train_merges: initial_merges sides cannot "
                        "contain spaces"
                    )
                enc_expr = F.replace(
                    enc_expr, F.lit(f" {l}  {r} "), F.lit(f" {l}{r} ")
                )
            vocab = vocab.select(enc_expr.alias("enc"), "n").localCheckpoint(
                eager=True
            )
        if prior:
            rank0 = int(prior[-1]["rank"]) + 1
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(rank0, rank0 + n_merges):
        toks = F.split(F.trim(F.col("enc")), "  ")
        ln = F.greatest(F.size(toks) - 1, F.lit(0))
        pairs = vocab.select(
            "n",
            F.explode(
                F.arrays_zip(
                    F.slice(toks, 1, ln).alias("l"),
                    F.slice(toks, 2, ln).alias("r"),
                )
            ).alias("p"),
        )
        pc = pairs.groupBy(
            F.col("p.l").alias("l"), F.col("p.r").alias("r")
        ).agg(F.sum("n").alias("cnt"))
        if pair_score == "wordpiece":
            syms = vocab.select(
                F.explode(F.split(F.trim(F.col("enc")), "  ")).alias("tok"),
                "n",
            ).groupBy("tok").agg(F.sum("n").alias("cs"))
            best = (
                pc.filter(F.col("cnt") >= min_frequency)
                .join(
                    syms.select(
                        F.col("tok").alias("l"), F.col("cs").alias("_cl")
                    ),
                    "l",
                )
                .join(
                    syms.select(
                        F.col("tok").alias("r"), F.col("cs").alias("_cr")
                    ),
                    "r",
                )
                .withColumn(
                    "_score",
                    F.expr(
                        "cast(cnt as decimal(38,0)) * 1000000000000"
                        " div (cast(_cl as decimal(38,0)) * _cr)"
                    ),
                )
                .orderBy(F.col("_score").desc(), "l", "r")
                .limit(1)
                .collect()
            )
        else:
            best = (
                pc.orderBy(F.col("cnt").desc(), "l", "r")
                .limit(1)
                .collect()
            )
        if not best or best[0]["cnt"] < min_frequency:
            break
        l, r, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        merges.append((rank, l, r, cnt))
        vocab = vocab.select(
            F.replace(
                F.col("enc"), F.lit(f" {l}  {r} "), F.lit(f" {l}{r} ")
            ).alias("enc"),
            "n",
        )
        if (rank + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count bigint"
    )


def save_merges_txt(merges: DataFrame, path: str) -> None:
    """Export a trained merge table in the published ``merges.txt``
    format (one ``left right`` pair per line in rank order, ``#``
    header) — the artifact every BPE tokenizer library consumes, so a
    table trained here drops into an external tokenizer unchanged.
    Merge tables are driver-sized by definition (one row per merge), so
    the collect is bounded by the vocabulary budget, not the corpus.
    """
    rows = merges.orderBy("rank").select("left", "right").collect()
    with open(path, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for r in rows:
            f.write(f"{r['left']} {r['right']}\n")


def load_merges_txt(spark, path: str) -> DataFrame:
    """Load a ``merges.txt`` (ours or an external tokenizer's) into the
    ``(rank, left, right)`` table :func:`bpe_segment_table` consumes.
    ``#`` comment/header lines are skipped; rank is the file order, as
    the format specifies."""
    rows = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            l, _, r = line.partition(" ")
            rows.append((len(rows), l, r))
    return spark.createDataFrame(rows, "rank int, left string, right string")


def bpe_train_merges_batched(
    docs: DataFrame,
    n_merges: int,
    batch_size: int = 8,
    candidate_factor: int = 4,
    text_col: str = "text",
    min_frequency: int = 2,
    checkpoint_every: int = 4,
    accept_rule: str = "blocking",
) -> DataFrame:
    """Batched BPE training — the wall-clock scale path
    :func:`bpe_train_merges` documents: sequential BPE needs one driver
    round-trip PER merge (a 50k-merge vocabulary ≈ 50k scheduling
    floors), because each merge depends on the counts the previous one
    changed. Batching accepts up to ``batch_size`` NON-INTERACTING
    pairs per round (the published batched-BPE approximation), cutting
    rounds ~``batch_size``-fold at the cost of exact merge order.

    Acceptance (both rules rank the round's pairs by (count DESC, left,
    right) and keep the top ``candidate_factor * batch_size``
    candidates; two candidates CONFLICT iff they share a symbol, or
    either symbol of one equals the CONCATENATION of the other — the
    product rule closes the round-10 ADVICE hole where ``(a,b)`` and
    ``(ab,c)`` could co-land when ``ab`` already existed as a symbol
    and the first merge's product fed the second.  Accepted pairs are
    pairwise conflict-free either way, so applying them in any order
    yields the same vocabulary, a merge's product cannot feed another
    merge in the SAME round, and the output table stays topologically
    ordered — :func:`bpe_segment_table`'s single-pass fold stays
    exact):

    - ``"blocking"`` (default): accept a candidate iff NO higher-ranked
      candidate conflicts with it — a blocked candidate still blocks
      those below it. Slightly conservative, but the acceptance set is
      a pure function of the ranked list with NO sequential state, so
      the oracle is one NOT EXISTS.
    - ``"greedy"``: the classic sequential greedy independent set —
      accept iff no ACCEPTED earlier candidate conflicts. Strictly
      ≥ the blocking rule's fill rate (a rejected candidate no longer
      shadows those below it; measured ~2x the merges/round on a
      realistic vocabulary), at the price of sequential accept-state —
      which the oracle replays with a recursive CTE over the (bounded,
      driver-sized) candidate list.

    Returns ``(rank, round, left, right, pair_count)``; ``rank`` is the
    global apply order (round-major), truncated to ``n_merges``.

    Scale shape: per ROUND one vocabulary-sized pair-count aggregation +
    one driver-sized collect (``candidate_factor * batch_size`` rows);
    merge application is one fold of ≤ ``batch_size`` replaces. Same
    Zipf-collapse and lineage discipline as the sequential trainer.
    """
    if n_merges < 1 or batch_size < 1 or candidate_factor < 1:
        raise ValueError(
            "bpe_train_merges_batched: n_merges, batch_size and "
            "candidate_factor must be >= 1, got "
            f"{n_merges!r}/{batch_size!r}/{candidate_factor!r}"
        )
    if min_frequency < 1:
        raise ValueError(
            "bpe_train_merges_batched: min_frequency must be >= 1, got "
            f"{min_frequency!r}"
        )
    if accept_rule not in ("blocking", "greedy"):
        raise ValueError(
            "bpe_train_merges_batched: accept_rule must be 'blocking' or "
            f"'greedy', got {accept_rule!r}"
        )
    spark = docs.sparkSession
    words = docs.select(
        F.explode(
            F.split(F.lower(collapse_whitespace(F.col(text_col))), " ")
        ).alias("w")
    ).filter(F.col("w") != "")
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.concat(
                F.lit(" "), F.array_join(F.split(F.col("w"), ""), "  "),
                F.lit(" "),
            ).alias("enc"),
            "n",
        )
        .localCheckpoint(eager=True)
    )
    k_cand = int(candidate_factor) * int(batch_size)
    merges: list[tuple[int, int, str, str, int]] = []
    rnd = 0
    # n_merges rounds is a safe upper bound: a round that accepts
    # nothing ends training, and every other round accepts >= 1
    while len(merges) < n_merges and rnd < n_merges:
        toks = F.split(F.trim(F.col("enc")), "  ")
        ln = F.greatest(F.size(toks) - 1, F.lit(0))
        pairs = vocab.select(
            "n",
            F.explode(
                F.arrays_zip(
                    F.slice(toks, 1, ln).alias("l"),
                    F.slice(toks, 2, ln).alias("r"),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("n").alias("cnt"))
            .filter(F.col("cnt") >= min_frequency)
            .orderBy(F.col("cnt").desc(), "l", "r")
            .limit(k_cand)
            .collect()
        )
        seen: set = set()
        prods: set = set()
        accepted = []
        for row in top:
            l, r, cnt = row["l"], row["r"], int(row["cnt"])
            # conflict = shares a symbol, OR either symbol equals an
            # earlier candidate's CONCATENATION, OR this candidate's
            # concatenation equals an earlier candidate's symbol
            # (round-10 ADVICE: with symbol-sharing alone, (a,b) and
            # (ab,c) could land in one round when 'ab' already exists
            # as a symbol — the first merge's product then feeds the
            # second under the sequential replace fold, breaking both
            # documented invariants: same-round independence and
            # apply-order insensitivity)
            blocked = (
                l in seen
                or r in seen
                or l in prods
                or r in prods
                or (l + r) in seen
            )
            if accept_rule == "blocking":
                # every candidate blocks those below it
                if not blocked and len(accepted) < batch_size:
                    accepted.append((l, r, cnt))
                seen.add(l)
                seen.add(r)
                prods.add(l + r)
            else:  # greedy: only ACCEPTED candidates block
                if not blocked and len(accepted) < batch_size:
                    accepted.append((l, r, cnt))
                    seen.add(l)
                    seen.add(r)
                    prods.add(l + r)
        if not accepted:
            break
        enc_expr = F.col("enc")
        for l, r, cnt in accepted:
            merges.append((len(merges), rnd, l, r, cnt))
            enc_expr = F.replace(
                enc_expr, F.lit(f" {l}  {r} "), F.lit(f" {l}{r} ")
            )
        vocab = vocab.select(enc_expr.alias("enc"), "n")
        rnd += 1
        if rnd % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges[: int(n_merges)],
        "rank int, round int, left string, right string, pair_count bigint",
    )


def _wp_word_tokens(
    w: Column,
    vmap: Column,
    max_piece_len: int,
    max_word_len: int,
    unk_token: str,
    continuation_prefix: str | None,
) -> Column:
    """Greedy longest-match-first (max-munch) WordPiece encoding of one
    word column against a membership map, returning its token array —
    the WordPiece/BERT inference-time algorithm (Wu et al.,
    arXiv:1609.08144 §4.1; Devlin et al., arXiv:1810.04805).

    One :func:`~pyspark.sql.functions.aggregate` fold of a struct state
    ``(pos, toks, fail)`` over ``max_word_len`` steps (a word of W chars
    yields at most W pieces, so the unroll depth bounds the word length,
    BERT's ``max_input_chars_per_word`` behavior: longer words — and
    words the vocab can't cover — become ``unk_token``).  Each step
    probes every prefix length ``1..max_piece_len`` of the unconsumed
    suffix against the vocab map (``map_contains_key`` — never throws,
    ANSI session or not) and consumes the LONGEST member.  With
    ``continuation_prefix`` (BERT's ``"##"``), non-initial probes look
    up (and emit) the prefixed form.  Entirely JVM expressions — no
    UDF, no shuffle; the caller decides whether to Zipf-collapse to
    distinct words first.
    """
    L = F.length(w)
    init = F.struct(
        F.lit(1).cast("int").alias("pos"),
        F.array().cast("array<string>").alias("toks"),
        (L > max_word_len).alias("fail"),
    )

    def key_of(raw: Column, pos: Column) -> Column:
        if continuation_prefix is None:
            return raw
        return F.when(pos == 1, raw).otherwise(
            F.concat(F.lit(continuation_prefix), raw)
        )

    def step(acc: Column, _x: Column) -> Column:
        done = acc["fail"] | (acc["pos"] > L)
        lens = F.sequence(
            F.lit(1), F.least(F.lit(max_piece_len), L - acc["pos"] + 1)
        )
        matched = F.filter(
            lens,
            lambda i: F.map_contains_key(
                vmap, key_of(w.substr(acc["pos"], i), acc["pos"])
            ),
        )
        n_m = F.size(matched)
        best = F.when(n_m > 0, F.element_at(matched, n_m))
        advanced = F.struct(
            (acc["pos"] + best).cast("int").alias("pos"),
            F.concat(
                acc["toks"],
                F.array(key_of(w.substr(acc["pos"], best), acc["pos"])),
            ).alias("toks"),
            F.lit(False).alias("fail"),
        )
        failed = F.struct(
            acc["pos"].alias("pos"),
            acc["toks"].alias("toks"),
            F.lit(True).alias("fail"),
        )
        return F.when(done, acc).otherwise(
            F.when(n_m > 0, advanced).otherwise(failed)
        )

    return F.aggregate(
        F.sequence(F.lit(1), F.lit(int(max_word_len))),
        init,
        step,
        lambda acc: F.when(L == 0, F.array().cast("array<string>"))
        .when(
            acc["fail"] | (acc["pos"] <= L), F.array(F.lit(unk_token))
        )
        .otherwise(acc["toks"]),
    )


def _wp_vocab_map(vocab: list[str]) -> tuple[Column, int]:
    if not vocab:
        raise ValueError("wordpiece_segment: vocab must be non-empty")
    seen = set()
    for v in vocab:
        if not v:
            raise ValueError("wordpiece_segment: vocab pieces cannot be empty")
        if v in seen:
            raise ValueError(f"wordpiece_segment: duplicate vocab piece {v!r}")
        seen.add(v)
    vmap = F.map_from_arrays(
        F.array(*[F.lit(v) for v in vocab]),
        F.array(*[F.lit(True) for _ in vocab]),
    )
    return vmap, max(len(v) for v in vocab)


def wordpiece_segment(
    docs: DataFrame,
    vocab: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    unk_token: str = "[UNK]",
    max_word_len: int = 24,
    continuation_prefix: str | None = None,
) -> DataFrame:
    """WordPiece max-munch subword segmentation — ``(id_col, tokens)``
    encoding every whitespace word of ``text_col`` against ``vocab`` by
    greedy longest-prefix matching (see :func:`_wp_word_tokens`).

    Together with :func:`bpe_segment` (merge-fold BPE apply) this
    completes the tokenizer-application pair for both trained-vocab
    conventions: BPE tables replay merges; WordPiece vocabs are matched
    max-munch.  Pass ``continuation_prefix="##"`` with a BERT-style
    vocab (``##``-prefixed continuation pieces) for exact BERT
    semantics; the default position-agnostic mode treats ``vocab`` as a
    set of subwords valid anywhere in a word.

    Scale shape: scan-stage only — the vocab ships as a map literal
    inside the expression (a production 30k-piece vocab would move to a
    broadcast single-row map via the :func:`bpe_segment_table` pattern);
    zero shuffles, zero Python.
    """
    vmap, max_piece = _wp_vocab_map(vocab)
    words = F.split(F.lower(collapse_whitespace(F.col(text_col))), " ")
    seg = F.transform(
        words,
        lambda w: _wp_word_tokens(
            w, vmap, max_piece, max_word_len, unk_token, continuation_prefix
        ),
    )
    return docs.select(F.col(id_col), F.flatten(seg).alias("tokens"))


def wordpiece_token_frequencies(
    docs: DataFrame,
    vocab: list[str],
    top_k: int = 20,
    text_col: str = "text",
    unk_token: str = "[UNK]",
    max_word_len: int = 24,
    continuation_prefix: str | None = None,
) -> DataFrame:
    """Corpus-wide WordPiece token census: ``(token, n_occurrences,
    rank)`` for the ``top_k`` most frequent pieces (``unk_token`` rows
    count words the vocab cannot cover — the out-of-vocabulary audit a
    tokenizer rollout runs before committing to a vocab).

    Zipf-collapsed like :func:`bpe_token_frequencies`: the max-munch
    fold runs once per DISTINCT word, weighted back by word frequency —
    fold cost scales with vocabulary bytes, not corpus bytes.
    """
    vmap, max_piece = _wp_vocab_map(vocab)
    words = docs.select(
        F.explode(
            F.split(F.lower(collapse_whitespace(F.col(text_col))), " ")
        ).alias("w")
    )
    wc = words.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    toks = wc.select(
        "n",
        F.explode(
            _wp_word_tokens(
                F.col("w"),
                vmap,
                max_piece,
                max_word_len,
                unk_token,
                continuation_prefix,
            )
        ).alias("token"),
    )
    counts = toks.groupBy("token").agg(F.sum("n").alias("n_occurrences"))
    top = counts.orderBy(F.col("n_occurrences").desc(), "token").limit(top_k)
    w = Window.orderBy(F.col("n_occurrences").desc(), "token")
    return top.withColumn("rank", F.row_number().over(w)).select(
        "token", "n_occurrences", "rank"
    )


def wordpiece_segment_table(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    piece_col: str = "piece",
    unk_token: str = "[UNK]",
    max_word_len: int = 24,
    max_piece_len: int = 16,
    continuation_prefix: str | None = None,
) -> DataFrame:
    """:func:`wordpiece_segment` with the vocabulary as a DATAFRAME —
    the production path for real tokenizer vocabularies (a 30k-piece
    ``vocab.txt`` loaded as one-piece-per-row), where building a 30k-key
    map literal would blow past codegen limits.

    The vocab collapses to ONE row holding a membership map
    (``map_from_arrays`` over ``collect_list``) and ships as a
    broadcast; the per-word max-munch fold is the identical expression,
    so the plan is :func:`wordpiece_segment`'s plus one
    BroadcastNestedLoopJoin of a single row (the
    :func:`bpe_segment_table` pattern). ``max_piece_len`` bounds the
    per-cursor probe count and must be >= the longest UNPREFIXED piece
    the vocab contains — enforced IN-PLAN with a ``raise_error`` branch
    since the table contents aren't visible at build time (probing
    shorter than a real piece would silently under-segment).  Empty
    pieces are likewise rejected in-plan; duplicates fail in the map
    builder (Spark's default DUPLICATED_MAP_KEY policy is EXCEPTION).
    """
    prefix_len = len(continuation_prefix or "")
    eff_len = F.when(
        (F.lit(prefix_len) > 0)
        & F.col(piece_col).startswith(continuation_prefix or ""),
        F.length(piece_col) - prefix_len,
    ).otherwise(F.length(piece_col))
    checked = F.when(
        F.col(piece_col).isNull() | (F.length(piece_col) == 0),
        F.raise_error(
            F.lit("wordpiece_segment_table: vocab pieces cannot be empty")
        ),
    ).when(
        eff_len > max_piece_len,
        F.raise_error(
            F.concat(
                F.lit(
                    "wordpiece_segment_table: piece longer than "
                    f"max_piece_len={max_piece_len}: "
                ),
                F.col(piece_col),
            )
        ),
    ).otherwise(F.col(piece_col))
    vrow = vocab.agg(
        F.map_from_arrays(
            F.collect_list(checked),
            F.transform(F.collect_list(checked), lambda _: F.lit(True)),
        ).alias("_vmap")
    )
    words = F.split(F.lower(collapse_whitespace(F.col(text_col))), " ")
    seg = F.transform(
        words,
        lambda w: _wp_word_tokens(
            w,
            F.col("_vmap"),
            max_piece_len,
            max_word_len,
            unk_token,
            continuation_prefix,
        ),
    )
    return (
        docs.join(F.broadcast(vrow))
        .select(F.col(id_col), F.flatten(seg).alias("tokens"))
    )


def wordpiece_fertility_by_group(
    docs: DataFrame,
    vocab: list[str],
    group_col: str,
    text_col: str = "text",
    unk_token: str = "[UNK]",
    max_word_len: int = 24,
    continuation_prefix: str | None = None,
) -> DataFrame:
    """Tokenizer fertility per group — mean subword pieces emitted per
    word (ppm integers), the standard multilingual-vocab equity metric
    (a vocab undertrained on a language segments it into many more
    pieces, inflating its effective sequence length and training cost;
    cf. the fertility tables in mBERT/XLM-R tokenizer analyses, e.g.
    Rust et al., arXiv:2012.15613).

    Returns ``(group_col, n_words, n_pieces, fertility_ppm)`` with
    ``fertility_ppm = n_pieces * 1e6 div n_words`` — exact integers.
    Empty words (consecutive whitespace artifacts) count in neither;
    out-of-vocabulary words count as ONE piece (the [UNK] emission) —
    include them or pre-filter by OOV rate depending on the audit.

    Scale shape: the max-munch fold runs once per DISTINCT word
    corpus-wide (not per group — groups share spellings), then joins
    back to the (group, word) count table: fold cost scales with
    vocabulary bytes, the joins with the Zipf-collapsed count tables.
    """
    vmap, max_piece = _wp_vocab_map(vocab)
    words = docs.filter(F.col(group_col).isNotNull()).select(
        F.col(group_col),
        F.explode(
            F.split(F.lower(collapse_whitespace(F.col(text_col))), " ")
        ).alias("w"),
    )
    wc = words.groupBy(group_col, "w").agg(F.count(F.lit(1)).alias("n"))
    pieces = (
        wc.select("w")
        .distinct()
        .select(
            "w",
            F.size(
                _wp_word_tokens(
                    F.col("w"),
                    vmap,
                    max_piece,
                    max_word_len,
                    unk_token,
                    continuation_prefix,
                )
            ).cast("bigint").alias("np"),
            (F.length("w") > 0).cast("bigint").alias("is_word"),
        )
    )
    per = wc.join(pieces, "w")
    return per.groupBy(group_col).agg(
        F.sum(F.col("n") * F.col("is_word")).alias("n_words"),
        F.sum(F.col("n") * F.col("np")).alias("n_pieces"),
        F.expr(
            "cast(sum(n * np) * cast(1000000 as bigint)"
            " div nullif(sum(n * is_word), 0) as bigint)"
        ).alias("fertility_ppm"),
    )


def wordpiece_token_frequencies_table(
    docs: DataFrame,
    vocab: DataFrame,
    top_k: int = 20,
    text_col: str = "text",
    piece_col: str = "piece",
    unk_token: str = "[UNK]",
    max_word_len: int = 24,
    max_piece_len: int = 16,
    continuation_prefix: str | None = None,
) -> DataFrame:
    """:func:`wordpiece_token_frequencies` with the vocabulary as a
    DATAFRAME (the :func:`wordpiece_segment_table` broadcast-map-row
    path, same in-plan piece validation).

    Zipf-collapses to DISTINCT words BEFORE the max-munch fold, exactly
    like the literal-vocab census — measured at sf0.1 the collapse is
    the difference between 0.8 s and 68 s: the per-occurrence fold
    (every word of every document) is ~80x the distinct-word fold on
    natural text, and the gap widens with corpus size (Heaps' law).
    ``wordpiece_segment_table`` remains the right shape only when the
    PRODUCT is per-document token arrays."""
    prefix_len = len(continuation_prefix or "")
    eff_len = F.when(
        (F.lit(prefix_len) > 0)
        & F.col(piece_col).startswith(continuation_prefix or ""),
        F.length(piece_col) - prefix_len,
    ).otherwise(F.length(piece_col))
    checked = F.when(
        F.col(piece_col).isNull() | (F.length(piece_col) == 0),
        F.raise_error(
            F.lit(
                "wordpiece_token_frequencies_table: vocab pieces cannot"
                " be empty"
            )
        ),
    ).when(
        eff_len > max_piece_len,
        F.raise_error(
            F.concat(
                F.lit(
                    "wordpiece_token_frequencies_table: piece longer than"
                    f" max_piece_len={max_piece_len}: "
                ),
                F.col(piece_col),
            )
        ),
    ).otherwise(F.col(piece_col))
    vrow = vocab.agg(
        F.map_from_arrays(
            F.collect_list(checked),
            F.transform(F.collect_list(checked), lambda _: F.lit(True)),
        ).alias("_vmap")
    )
    words = docs.select(
        F.explode(
            F.split(F.lower(collapse_whitespace(F.col(text_col))), " ")
        ).alias("w")
    )
    wc = words.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    toks = wc.join(F.broadcast(vrow)).select(
        "n",
        F.explode(
            _wp_word_tokens(
                F.col("w"),
                F.col("_vmap"),
                max_piece_len,
                max_word_len,
                unk_token,
                continuation_prefix,
            )
        ).alias("token"),
    )
    counts = toks.groupBy("token").agg(F.sum("n").alias("n_occurrences"))
    top = counts.orderBy(F.col("n_occurrences").desc(), "token").limit(top_k)
    w = Window.orderBy(F.col("n_occurrences").desc(), "token")
    return top.withColumn("rank", F.row_number().over(w)).select(
        "token", "n_occurrences", "rank"
    )
