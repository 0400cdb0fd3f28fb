"""Text analysis operators: token stats, quality scoring, language ID,
fingerprinting. All native Catalyst expressions over the ``documents``
table shape (doc_id, text, lang, source, n_chars) — no Python in the
row path, so these run at scan speed on any corpus size.
"""

from __future__ import annotations

from typing import Sequence

from ..functions.scan import spread_small_scan
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from ..functions.text import (
    adjacent_pairs_expr,
    distinct_tokens_expr,
    fingerprint_expr,
    tokens_expr,
)

__all__ = [
    "STOPWORDS",
    "token_stats",
    "quality_features",
    "langid_expr",
    "langid_table",
    "fingerprint_table",
    "vocab_coverage",
    "repetition_features",
    "chunk_passages",
    "unigram_logprob",
    "bigram_logprob",
    "tfidf_keywords",
    "pmi_pairs",
    "train_bpe_merges",
    "apply_bpe_merges",
    "bm25_topk",
    "compression_ratio",
    "ngram_novelty",
    "vocab_growth",
]

#: small deterministic stopword lists per language for the n-gram
#: language-ID heuristic (distinct-token overlap ratio).
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "for", "on", "with"],
    "es": ["el", "la", "de", "los", "y", "en", "que", "un", "una", "por"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "im", "ein"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "dans", "est", "pour"],
}


def _ratio(tokens_distinct: Column, words: list[str]) -> Column:
    inter = F.size(
        F.array_intersect(tokens_distinct, F.array(*[F.lit(w) for w in words]))
    )
    n = F.size(tokens_distinct)
    return F.when(n > 0, inter.cast("double") / n).otherwise(F.lit(0.0))


def token_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc token statistics: counts, distinctness, mean token
    length — the base features for quality filtering."""
    toks = tokens_expr(text_col)
    return df.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(
            F.aggregate(
                F.transform(toks, lambda t: F.length(t).cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.size(toks),
            6,
        ).alias("avg_token_len"),
    )


def quality_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Quality scoring: type-token ratio, English-stopword ratio, a
    length factor, and a fixed composite ``quality_score`` in [0,1].
    The composite is a transparent deterministic formula (documented
    here, mirrored in the oracle SQL), not a learned model.

    ``keep_cols`` carries extra input columns through, so gates CHAIN
    as one narrow pass instead of being joined back by id — joining
    per-row feature branches lets Catalyst's constraint propagation
    clone the (large) feature expressions into every branch (measured
    20x+ on composed pipelines)."""
    toks = tokens_expr(text_col)
    dtoks = distinct_tokens_expr(text_col)
    n = F.size(toks)
    ttr = F.when(n > 0, F.size(dtoks).cast("double") / n).otherwise(F.lit(0.0))
    stop = _ratio(dtoks, STOPWORDS["en"])
    length_factor = F.least(n.cast("double") / 100.0, F.lit(1.0))
    score = F.lit(0.3) * length_factor + F.lit(0.4) * ttr + F.lit(0.3) * stop
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.size(toks).alias("n_tokens"),
        F.round(ttr, 6).alias("type_token_ratio"),
        F.round(stop, 6).alias("stopword_ratio"),
        F.round(length_factor, 6).alias("length_factor"),
        F.round(score, 6).alias("quality_score"),
    )


def langid_expr(text_col: str = "text") -> Column:
    """Language-ID heuristic: highest distinct-token overlap with the
    per-language stopword lists; ties resolved in en>es>de>fr order;
    zero overlap everywhere -> 'und' (undetermined)."""
    dtoks = distinct_tokens_expr(text_col)
    r = {lang: _ratio(dtoks, words) for lang, words in STOPWORDS.items()}
    return (
        F.when(
            (r["en"] > 0)
            & (r["en"] >= r["es"]) & (r["en"] >= r["de"]) & (r["en"] >= r["fr"]),
            F.lit("en"),
        )
        .when((r["es"] > 0) & (r["es"] >= r["de"]) & (r["es"] >= r["fr"]), F.lit("es"))
        .when((r["de"] > 0) & (r["de"] >= r["fr"]), F.lit("de"))
        .when(r["fr"] > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )


def langid_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    dtoks = distinct_tokens_expr(text_col)
    return df.select(
        F.col(id_col),
        langid_expr(text_col).alias("detected_lang"),
        F.round(_ratio(dtoks, STOPWORDS["en"]), 6).alias("en_ratio"),
        F.round(_ratio(dtoks, STOPWORDS["es"]), 6).alias("es_ratio"),
    )


def fingerprint_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc content fingerprint (md5 of sorted distinct tokens)."""
    return df.select(F.col(id_col), fingerprint_expr(text_col).alias("fingerprint"))


def repetition_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dup_token_max: float = 0.55,
    top_bigram_max: float = 0.06,
    dup_bigram_max: float = 0.05,
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1): per-doc
    duplicate-token fraction, most-common-bigram fraction, and
    duplicate-bigram fraction, plus a ``keep`` verdict under the given
    thresholds. The standard pre-training repetition gate.

    Scale shape: ZERO shuffles. The bigram mode (count of the most
    common bigram) is computed per row as the longest equal-run of the
    SORTED bigram array — an O(len·log len) whole-stage-codegen
    expression — instead of the explode + groupBy(doc, bigram) +
    groupBy(doc) formulation (two corpus-wide shuffles). Per-doc work
    is bounded by document length, the stage is embarrassingly
    parallel, and output partitioning = input partitioning, so at
    100 TB this runs at scan speed alongside the other per-doc filters
    (measured 3-4x over the exploded form at sf0.1 even before shuffle
    pressure).
    """
    toks = tokens_expr(text_col)
    t = F.col("__t")
    n = F.size(t)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat(
                F.element_at(t, i), F.lit(" "), F.element_at(t, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = F.col("__bg")
    # longest equal-run over the sorted array = max bigram multiplicity
    run_state = F.aggregate(
        F.array_sort(bg),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc.best,
                F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc.best,
    )
    carried = [F.col(c) for c in keep_cols]
    agg = (
        df.select(F.col(id_col), *carried, toks.alias("__t"))
        .select(
            F.col(id_col),
            *carried,
            F.size(t).alias("n_tokens"),
            F.size(F.array_distinct(t)).alias("n_distinct"),
            bigrams.alias("__bg"),
        )
        .select(
            F.col(id_col),
            *carried,
            "n_tokens",
            "n_distinct",
            run_state.alias("mx"),
            F.size(bg).alias("tot"),
            F.size(F.array_distinct(bg)).alias("ndb"),
        )
    )
    nt = F.col("n_tokens")
    dup_tok = F.when(nt > 0, (nt - F.col("n_distinct")).cast("double") / nt).otherwise(
        F.lit(0.0)
    )
    tot = F.col("tot")
    top_bg = F.when(tot > 0, F.col("mx").cast("double") / tot).otherwise(F.lit(0.0))
    dup_bg = F.when(tot > 0, (tot - F.col("ndb")).cast("double") / tot).otherwise(
        F.lit(0.0)
    )
    return agg.select(
        F.col(id_col),
        *carried,
        nt,
        F.round(dup_tok, 6).alias("dup_token_frac"),
        F.round(top_bg, 6).alias("top_bigram_frac"),
        F.round(dup_bg, 6).alias("dup_bigram_frac"),
        (
            (dup_tok <= dup_token_max)
            & (top_bg <= top_bigram_max)
            & (dup_bg <= dup_bigram_max)
        ).alias("keep"),
    )


def unigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc cross-entropy under the corpus unigram distribution —
    the simplest member of the CCNet/Gopher "LM perplexity" quality
    family: outlier docs (wrong language, boilerplate, gibberish
    relative to the corpus) score high.

    Scale shape: explode -> (doc, token, tf) postings (one shuffle,
    map-side combined); the unigram table is a token-keyed aggregate of
    the SAME postings (vocabulary-sized, broadcast when small); one
    join back by token and one groupBy doc. All counts integer until
    the final log — deterministic enough to oracle at 6 dp."""
    tok = df.select(
        F.col(id_col), F.explode(tokens_expr(text_col)).alias("__t")
    )
    tf = tok.groupBy(id_col, "__t").agg(F.count(F.lit(1)).alias("__c"))
    uni = tf.groupBy("__t").agg(F.sum("__c").alias("__ct"))
    # corpus total as a one-row aggregate broadcast back over the
    # vocabulary — web-scale vocabularies run to billions of distinct
    # tokens, so an unpartitioned window here would funnel the whole
    # unigram table through one task; the aggregate side gets fresh
    # attribute ids from the Aggregate node, so the crossJoin of a
    # subtree with its own rollup is unambiguous
    tot = uni.agg(F.sum("__ct").alias("__tot"))
    freq = uni.crossJoin(F.broadcast(tot))
    scored = tf.join(freq, "__t").groupBy(id_col).agg(
        F.sum("__c").cast("int").alias("n_tokens"),
        F.round(
            -F.sum(
                F.col("__c")
                * F.log(F.col("__ct").cast("double") / F.col("__tot"))
            )
            / F.sum("__c"),
            6,
        ).alias("avg_neg_logprob"),
    )
    return scored


def tfidf_keywords(
    df: DataFrame,
    top_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``top_n`` TF-IDF keywords per document — the lightweight
    document-labeling / topic-feature step of a curation pipeline
    (cluster naming, faceted corpus browsing, weak topic labels).

    Scale shape: the same postings skeleton as :func:`unigram_logprob`
    — explode -> (doc, term, tf) with map-side combine, document
    frequency as a term-keyed aggregate OF those postings, and the
    corpus doc count as a one-row broadcast aggregate (never an
    unpartitioned window). The final rank window partitions by doc
    over that doc's distinct terms — bounded by document length, never
    corpus-wide. Smoothed idf = ln((N+1)/(df+1)) keeps terms appearing
    in every doc finite."""
    tok = df.select(F.col(id_col), F.explode(tokens_expr(text_col)).alias("__t"))
    tf = tok.groupBy(id_col, "__t").agg(F.count(F.lit(1)).alias("__tf"))
    dfreq = tf.groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
    n = df.agg(F.count(F.lit(1)).alias("__n"))
    scored = tf.join(dfreq, "__t").crossJoin(F.broadcast(n)).select(
        F.col(id_col),
        F.col("__t").alias("term"),
        (
            F.col("__tf").cast("double")
            * F.log((F.col("__n") + 1.0) / (F.col("__df") + 1.0))
        ).alias("__score"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("__score").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(id_col, "rank", "term", F.round("__score", 6).alias("score"))
    )


def bigram_logprob(
    df: DataFrame,
    k: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_df: DataFrame | None = None,
) -> DataFrame:
    """Per-doc cross-entropy under a corpus-trained bigram model with
    add-k smoothing — the next member of the LM-perplexity quality
    family after :func:`unigram_logprob` (CCNet filters on KenLM
    n-gram perplexity; a corpus-trained bigram model is the
    self-contained analog): P(cur|prev) = (c(prev,cur) + k) /
    (c(prev) + k·V). Sequence structure matters here — shuffled or
    repetitive word salad that fools unigram stats scores high.

    Scale shape mirrors :func:`unigram_logprob`: one Generate off a
    materialized token array (bigram pairs via zip_with of two
    slices — no self-join on position), per-(doc, bigram) counts with
    map-side combine, the corpus bigram and context tables as
    aggregates OF THOSE COUNTS (never a second corpus scan), V as a
    one-row broadcast. All counts stay integer until the final log,
    so 6-dp rounding oracles cleanly.

    The per-(doc, bigram) counts table has three consumers (the
    per-doc join branch, the bigram rollup, the context rollup), and
    Spark re-expands a shared subtree per consumer — a lazy
    localCheckpoint pins it to ONE computation shared across all
    three (measured 2.5x at sf0.1; same device as
    ``dedup.connected_components``). Deliberately NOT a window
    reformulation: sum-over-partitionBy(context) funnels every bigram
    of a hot context word through one task, while groupBy keeps the
    rollups map-side combinable.

    ``train_df`` separates the model corpus from the scored corpus —
    the CCNet shape proper (train on the reference domain, score
    candidates; low cross-entropy = in-domain). Bigrams/contexts the
    training corpus never saw back off to the smoothing floor
    (cbg=0, cp=0 -> P = 1/V) via LEFT joins; the default
    ``train_df=None`` keeps the original self-trained behavior and
    plan."""

    def _pair_counts(src: DataFrame, *keys):
        base = src.select(*keys, tokens_expr(text_col).alias("__w"))
        pairs = adjacent_pairs_expr(F.col("__w"), "p", "c")
        return (
            base.select(*keys, F.explode(pairs).alias("__pc"))
            .select(
                *keys,
                F.col("__pc.p").alias("__p"),
                F.col("__pc.c").alias("__c2"),
            )
            .groupBy(*keys, "__p", "__c2")
            .agg(F.count(F.lit(1)).alias("__n"))
        )

    tf = _pair_counts(df, id_col).localCheckpoint(eager=False)
    model_src = df if train_df is None else train_df
    if train_df is None:
        bgc = tf.groupBy("__p", "__c2").agg(F.sum("__n").alias("__cbg"))
    else:
        bgc = (
            _pair_counts(train_df)
            .withColumnRenamed("__n", "__cbg")
            .localCheckpoint(eager=False)  # context rollup + score join
        )
    ctx = bgc.groupBy("__p").agg(F.sum("__cbg").alias("__cp"))
    vocab = (
        model_src.select(
            F.explode(distinct_tokens_expr(text_col)).alias("__t")
        )
        .agg(F.count_distinct("__t").alias("__v"))
    )
    join_type = "inner" if train_df is None else "left"
    return (
        tf.join(bgc, ["__p", "__c2"], join_type)
        .join(ctx, "__p", join_type)
        .withColumn("__cbg", F.coalesce("__cbg", F.lit(0)))
        .withColumn("__cp", F.coalesce("__cp", F.lit(0)))
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.sum("__n").cast("int").alias("n_bigrams"),
            F.round(
                -F.sum(
                    F.col("__n")
                    * F.log(
                        (F.col("__cbg") + F.lit(k))
                        / (F.col("__cp") + F.lit(k) * F.col("__v"))
                    )
                )
                / F.sum("__n"),
                6,
            ).alias("avg_neg_logprob"),
        )
    )


def pmi_pairs(
    df: DataFrame,
    window: int = 2,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Windowed token co-occurrence PMI — collocation/phrase mining
    (the shifted-PMI matrix of Levy & Goldberg 2014 that word2vec
    implicitly factorizes; also the association score behind Mikolov
    2013 phrase detection).

    ``pmi(a,b) = ln((n_ab/N_pair) / ((n_a/N_tok)·(n_b/N_tok)))`` where
    ``n_ab`` counts unordered co-occurrences within ``window`` token
    positions, ``n_x`` counts token occurrences, and the N's are the
    corpus totals. Pairs rarer than ``min_count`` are dropped (PMI's
    low-count bias makes them noise).

    Scale shape: pair generation is per-doc array math — for each
    offset j in 1..window, zip the token array against itself shifted
    by j (a positions SELF-JOIN would be the naive alternative: it
    shuffles every token and its cost concentrates on the longest
    docs). One explode → (a,b) counts with map-side combine (stopword
    pairs are heavy hitters; partial aggregation absorbs them);
    unigram counts aggregate the same token scan; corpus totals are
    one-row aggregates OF THE COUNT TABLES broadcast back (never an
    unpartitioned window, never a second corpus scan). The unigram
    table has three consumers (two join sides + its rollup) and the
    pair table two — each pinned to one computation with a lazy
    localCheckpoint (Catalyst re-expands shared subtrees per
    consumer; same device as :func:`bigram_logprob`)."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    base = df.select(tokens_expr(text_col).alias("__t"))
    n = F.size(F.col("__t"))
    per_offset = []
    for j in range(1, window + 1):
        zipped = F.zip_with(
            F.slice(F.col("__t"), 1, n - j),
            F.slice(F.col("__t"), j + 1, n - j),
            lambda a, b: F.struct(
                F.least(a, b).alias("a"), F.greatest(a, b).alias("b")
            ),
        )
        per_offset.append(
            F.when(n > j, zipped).otherwise(
                F.array().cast("array<struct<a:string,b:string>>")
            )
        )
    pairs = base.select(F.explode(F.flatten(F.array(*per_offset))).alias("__p"))
    pc = (
        pairs.groupBy(F.col("__p.a").alias("a"), F.col("__p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .localCheckpoint(eager=False)
    )
    tc = (
        base.select(F.explode("__t").alias("__tok"))
        .groupBy("__tok")
        .agg(F.count(F.lit(1)).alias("__n"))
        .localCheckpoint(eager=False)
    )
    totals = (
        tc.agg(F.sum("__n").alias("__n_tok"))
        .crossJoin(F.broadcast(pc.agg(F.sum("n_ab").alias("__n_pair"))))
    )
    ta = tc.select(F.col("__tok").alias("a"), F.col("__n").alias("__na"))
    tb = tc.select(F.col("__tok").alias("b"), F.col("__n").alias("__nb"))
    return (
        pc.filter(F.col("n_ab") >= min_count)
        .join(ta, "a")
        .join(tb, "b")
        .crossJoin(F.broadcast(totals))
        .select(
            "a",
            "b",
            "n_ab",
            F.log(
                (F.col("n_ab").cast("double") / F.col("__n_pair"))
                / (
                    (F.col("__na").cast("double") / F.col("__n_tok"))
                    * (F.col("__nb").cast("double") / F.col("__n_tok"))
                )
            ).alias("pmi"),
        )
    )


def chunk_passages(
    df: DataFrame,
    chunk_tokens: int = 50,
    overlap: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window passage chunking — the doc→passage fan-out that
    feeds embedding/RAG indexing and fixed-context training. Chunks
    start every ``chunk_tokens - overlap`` tokens; a trailing start is
    kept only while it contributes more than ``overlap`` new tokens, so
    no content is lost and no chunk is pure overlap.

    Scale shape: one Generate (explode of computed slices) — a narrow
    map stage, output partitioning = input partitioning, no shuffle.
    The token array is materialized once; the explode is of the
    expression directly (see tfidf_cosine_pairs for the
    Generate-filter trap this avoids)."""
    if overlap >= chunk_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be < chunk_tokens ({chunk_tokens})"
        )
    stride = chunk_tokens - overlap
    w = F.col("__w")
    n = F.size(w)
    starts = F.filter(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride)),
        lambda s: (s == 1) | (s <= n - overlap),
    )
    chunks = F.transform(
        starts,
        lambda s, i: F.struct(
            i.alias("chunk_id"),
            F.array_join(F.slice(w, s, chunk_tokens), " ").alias("passage"),
            F.least(n - s + 1, F.lit(chunk_tokens)).alias("n_chunk_tokens"),
        ),
    )
    return (
        df.withColumn("__w", F.split(F.col(text_col), " "))
        .select(F.col(id_col), F.explode(chunks).alias("__c"))
        .select(
            id_col,
            F.col("__c.chunk_id").alias("chunk_id"),
            F.col("__c.passage").alias("passage"),
            F.col("__c.n_chunk_tokens").alias("n_chunk_tokens"),
        )
    )


def vocab_coverage(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_col: str = "token",
) -> DataFrame:
    """Per-document vocabulary coverage / OOV rate against a vocabulary
    table — the tokenizer-fit diagnostic a training pipeline runs before
    committing to a vocab. The vocabulary is collapsed to ONE array and
    broadcast (vocabularies are small relative to corpora; a 1M-token
    vocab is a few MB), so coverage is a single narrow pass over the
    corpus: no shuffle, no join on the corpus side.

    Returns (id, n_tokens, n_oov, oov_rate) where oov_rate counts
    DISTINCT tokens of the doc missing from the vocabulary."""
    vocab_arr = vocab.agg(F.collect_set(vocab_col).alias("v"))
    with_v = df.crossJoin(F.broadcast(vocab_arr))
    dtoks = distinct_tokens_expr(text_col)
    n = F.size(dtoks)
    oov = F.size(F.array_except(dtoks, F.col("v")))
    return with_v.select(
        F.col(id_col),
        n.alias("n_tokens"),
        oov.alias("n_oov"),
        F.round(
            F.when(n > 0, oov.cast("double") / n).otherwise(F.lit(0.0)), 6
        ).alias("oov_rate"),
    )


def bm25_topk(
    df: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int | None = None,
) -> DataFrame:
    """BM25 retrieval (Robertson/Spärck Jones): top-k documents for a
    bag of query terms — the sparse lexical-search primitive a corpus
    pipeline uses for targeted inspection and eval-set mining.

    Scale shape: ONE explode + hash aggregation computes, per doc, the
    total token count and a COLUMN of term frequencies per query term
    (queries are a handful of terms, so tf-per-term-as-columns turns
    the postings join into conditional sums with map-side combine).
    Corpus stats (N, avgdl, per-term document frequencies) reduce to a
    single broadcast row, scoring is a narrow projection, and the only
    ordered exchange is the final top-k (TakeOrderedAndProject).
    Documents matching no term are excluded (score 0).

    score(d) = Σ_t ln(1 + (N-df+0.5)/(df+0.5)) ·
               tf·(k1+1) / (tf + k1·(1 - b + b·|d|/avgdl))

    The per-term-column layout suits interactive queries (up to tens
    of terms — each term adds one conditional-sum aggregate). Bulk
    scoring of a large query SET should instead join an exploded
    query-term table against the postings (the tfidf_cosine_pairs
    shape), which this function deliberately is not.

    ``round_to`` rounds the score BEFORE the (score desc, id) top-k so
    ties break identically across engines whose float summation order
    differs — two docs equal to 6 dp then rank by id on both sides
    instead of by sub-1e-6 noise. Leave None for exact ranking.
    """
    terms = list(dict.fromkeys(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    ex = df.select(
        F.col(id_col), F.explode(tokens_expr(text_col)).alias("__t")
    )
    per_doc = ex.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__dl"),
        *[
            F.sum(F.when(F.col("__t") == t, 1).otherwise(0)).alias(f"__tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("__N"),
        F.avg("__dl").alias("__avgdl"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("long")).alias(f"__df{i}")
            for i in range(len(terms))
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(terms)):
        tf = F.col(f"__tf{i}").cast("double")
        idf = F.log(
            1.0
            + (F.col("__N") - F.col(f"__df{i}") + 0.5) / (F.col(f"__df{i}") + 0.5)
        )
        norm = tf + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl"))
        part = idf * tf * (k1 + 1.0) / norm
        score = part if score is None else score + part
    if round_to is not None:
        score = F.round(score, round_to)
    return (
        scored.select(F.col(id_col), score.alias("score"))
        .filter(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def train_bpe_merges(
    df: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_partitions: int | None = None,
    checkpoint_every: int = 4,
) -> list[tuple[int, str, str, int]]:
    """Train BPE merge rules over the corpus: iteratively merge the
    most frequent adjacent symbol pair (ties broken lexicographically
    so the rule list is deterministic), starting from characters.
    Returns [(rank, left, right, pair_count), ...] — the merge table a
    tokenizer build step persists. Completes the tokenizer lane next
    to :func:`vocab_coverage` (vocabulary stats) and the BPE-regex
    pre-tokenizer (suite ``text_bpe_tokens``).

    Scale shape — the classic BPE-training decomposition: ONE corpus
    pass builds the (word, count) vocabulary table; every iteration
    after that runs over the vocabulary only (pair counts as a
    map-side-combinable weighted groupBy, argmax via
    TakeOrderedAndProject), never re-touching the corpus. One
    driver-side scalar per iteration (the chosen pair — the same
    one-job-per-round convergence pattern as
    ``dedup.connected_components``). The vocabulary table is
    checkpointed once up front (so no round replays the corpus pass)
    and every ``checkpoint_every`` rounds after that — per-round
    checkpoints pay materialization for nothing when the uncommitted
    lineage is a few narrow merge transforms (measured 2x at sf0.1),
    while never checkpointing replays all prior merges each round.
    ``vocab_partitions`` right-sizes the per-round jobs: word
    vocabularies are millions of rows, so a handful of partitions
    beats inheriting the corpus partitioning (task-wave overhead
    dominates the tiny per-round scans). Greedy left-to-right
    within-word application is an aggregate accumulator over the
    symbol array — O(len²) array copies per word, bounded by the
    longest WORD, never the document."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    words = (
        df.select(F.explode(tokens_expr(text_col)).alias("__word"))
        .filter(F.length("__word") > 0)
        .groupBy("__word")
        .agg(F.count(F.lit(1)).alias("__wc"))
    )
    syms = words.select(
        # (?s): match ANY character including line terminators —
        # a bare "." drops \n/\r, fabricating false adjacencies in
        # training that the apply side (list(word)) would never see
        F.regexp_extract_all(F.col("__word"), F.lit("(?s)."), 0).alias("__s"),
        "__wc",
    )
    if vocab_partitions:
        syms = syms.repartition(vocab_partitions)
    syms = syms.localCheckpoint(eager=False)

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs = adjacent_pairs_expr(F.col("__s"), "l", "r")
        best = (
            syms.select(F.explode(pairs).alias("__p"), "__wc")
            .groupBy("__p.l", "__p.r")
            .agg(F.sum("__wc").alias("__pc"))
            .orderBy(F.col("__pc").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not best:
            break  # every word is a single symbol — nothing left to merge
        left, right, pc = best[0]["l"], best[0]["r"], int(best[0]["__pc"])
        merges.append((rank, left, right, pc))
        la, lb = F.lit(left), F.lit(right)
        merged = F.aggregate(
            F.col("__s"),
            F.array().cast("array<string>"),
            # try_element_at: NULL (condition false) on the empty
            # accumulator, where ANSI element_at would throw
            lambda acc, x: F.when(
                (F.try_element_at(acc, F.lit(-1)) == la) & (x == lb),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.concat(la, lb)),
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        syms = syms.select(merged.alias("__s"), "__wc")
        if checkpoint_every and (rank + 1) % checkpoint_every == 0:
            syms = syms.localCheckpoint(eager=False)
    return merges


def apply_bpe_merges(
    df: DataFrame,
    merges: Sequence[tuple],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize the corpus with a trained merge table (the inference
    side of :func:`train_bpe_merges`): each word starts as characters,
    then merges apply in rank order, each greedy left-to-right —
    exactly the trainer's application semantics, so
    train-then-apply round-trips.

    This is the engine's canonical Arrow slow-path shape: a real merge
    table is tens of thousands of rules, far past what a chained
    Column expression can encode (codegen depth grows per rule), so
    the kernel is an Arrow-batched ``mapInPandas`` with the rank-dict
    closure shipped once per task — never row-at-a-time Python. The
    stage is narrow (no shuffle; output partitioning = input
    partitioning) and per-row cost is O(word_len · matches), the
    standard tokenizer cost model."""
    # accept exactly the trainer's 4-tuples (rank, left, right, count)
    # or bare (left, right) pairs — a 3-tuple is ambiguous ((rank,l,r)?
    # (l,r,count)?) and silently misparsing one would degrade
    # tokenization to characters with no error
    rules = []
    for m in merges:
        if len(m) == 4:
            rules.append((m[1], m[2]))
        elif len(m) == 2:
            rules.append((m[0], m[1]))
        else:
            raise ValueError(
                f"merge rule must be (rank, left, right, count) or (left, right), got {m!r}"
            )
    ranks = {pair: i for i, pair in enumerate(rules)}
    id_type = dict(df.dtypes)[id_col]
    out_schema = f"{id_col} {id_type}, {out_col} array<string>"

    def _encode_word(word: str) -> list:
        syms = list(word)
        while len(syms) > 1:
            best_rank = None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
            if best_rank is None:
                break
            a, b = rules[best_rank]
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            toks = [
                None
                if t is None
                else [s for w in t.split(" ") if w for s in _encode_word(w)]
                for t in pdf[text_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], out_col: toks})

    return df.select(id_col, text_col).mapInPandas(kernel, out_schema)


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio — the classic cheap quality
    signal (used by Gopher/Dolma-style curation): boilerplate and
    machine-generated repetition compress far below natural prose, and
    near-random strings barely compress at all, so gating on
    ``ratio < lo`` and ``ratio > hi`` removes both tails with one
    number per document.

    No SQL engine exposes DEFLATE, so this is the sanctioned Arrow
    slow path: a narrow ``mapInPandas`` stage (no shuffle; output
    partitioning = input partitioning), the zlib call C-speed per
    batch. Determinism: zlib's output length at a fixed ``level`` is
    fully determined by the input bytes (UTF-8 encoded) — re-runs and
    both sides of a differential test produce identical lengths.
    Returns ``(id, raw_len, comp_len, ratio)`` with byte lengths and
    ``ratio = comp_len / raw_len`` (NULL text → NULL row values;
    empty text → raw_len 0, comp_len 8 — the empty DEFLATE stream
    still costs header bytes — and ratio NULL)."""
    if not 0 <= level <= 9:
        raise ValueError(f"zlib level must be in [0, 9], got {level}")
    id_type = dict(df.dtypes)[id_col]
    out_schema = (
        f"{id_col} {id_type}, raw_len long, comp_len long, ratio double"
    )

    def kernel(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            raw, comp, ratio = [], [], []
            for t in pdf[text_col]:
                if t is None:
                    raw.append(None), comp.append(None), ratio.append(None)
                    continue
                b = t.encode("utf-8")
                c = len(zlib.compress(b, level))
                raw.append(len(b))
                comp.append(c)
                ratio.append(c / len(b) if b else None)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "raw_len": raw, "comp_len": comp,
                 "ratio": ratio}
            )

    return df.select(id_col, text_col).mapInPandas(kernel, out_schema)


def ngram_novelty(
    df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document n-gram novelty: of the document's DISTINCT word
    n-grams, what fraction appears in no other document. The
    memorization/templating signal of corpus curation — wholesale
    boilerplate and near-copies score near 0 (all their n-grams recur
    elsewhere), original prose scores near 1 — and the per-doc
    complement of the corpus-level views (``frequent_segments`` finds
    the shared segments themselves; ``dedup_span_removal`` rewrites
    them away; this scores each document by how much of it is its own).

    Returns ``(id, n_ngrams, n_novel, novelty)`` for every doc with at
    least ``n`` tokens, where ``novelty = n_novel / n_ngrams`` over the
    doc's distinct n-grams (counts exact int64, division once per
    output row, 6 dp).

    Scale shape: the (doc, distinct-n-gram-hash) stream is built twice
    — once for the document-frequency aggregation (count-only,
    map-side combined, keyed by hash) and once for the probe joined
    against it (hash-keyed shuffle join) — deliberately re-scanning
    the text instead of pinning the exploded stream: the scan is
    cheaper than materializing a tokens×1 blow-up of the corpus
    (:func:`bigram_logprob` pins only its VOCABULARY-sized counts
    table; this join's build side is n-gram-distinct-sized, so it
    stays a shuffle join). Hot boilerplate n-grams land in the partial
    aggregate, never one task. Hashes are the 60-bit md5 convention —
    collisions (P ≈ pairs/2^60) can only mark a novel n-gram as seen,
    never invent novelty."""
    # round 11: the 8-gram concat construction is per-row-heavy;
    # widen a narrow scan first (guide §2.5; measured 2.3 -> 0.8 s
    # at sf0.1 on one-row-group input; no-op at scale)
    df = spread_small_scan(df)  # round 11: widen narrow scans before tokenize
    from ..functions.text import md5_long_expr, word_ngrams_expr

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")

    def gram_stream() -> DataFrame:
        # materialize the token array before the n-gram transform
        # (word_ngrams_expr contract: an inline tokenizer re-evaluates
        # the split once per element)
        toks = df.select(F.col(id_col), tokens_expr(text_col).alias("__t"))
        grams = toks.select(
            F.col(id_col),
            F.explode(
                F.array_distinct(word_ngrams_expr(F.col("__t"), n))
            ).alias("__g"),
        )
        # hash in its own select below the explode (Generate-placement
        # discipline: computed beside the explode it would re-evaluate
        # per output row of the SOURCE projection)
        return grams.select(F.col(id_col), md5_long_expr(F.col("__g")).alias("__h"))

    docfreq = gram_stream().groupBy("__h").agg(
        F.count(F.lit(1)).alias("__df")
    )
    probed = gram_stream().join(docfreq, "__h")
    return (
        probed.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(F.when(F.col("__df") == 1, 1).otherwise(0)).alias("n_novel"),
        )
        .select(
            id_col,
            "n_ngrams",
            "n_novel",
            F.round(
                F.col("n_novel").cast("double") / F.col("n_ngrams"), 6
            ).alias("novelty"),
        )
    )

def vocab_growth(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 16,
) -> DataFrame:
    """Heaps'-law vocabulary-growth curve: cumulative distinct tokens
    vs cumulative token count as the corpus grows in ``id_col`` order
    — the statistic that predicts tokenizer-vocab coverage and
    dedup-index sizing as a crawl scales (V ≈ K·N^beta; regress
    ln V on ln N over these points to read beta off the curve).

    Scale shape: docs bucket into ``n_buckets`` id-range slices with
    EXACT integer arithmetic (``(id - min) * n DIV (span)`` — never a
    float floor, whose boundary rounding can differ cross-engine);
    per-bucket token totals are one aggregate; each token contributes
    its NEW-vocabulary unit at the bucket of its FIRST document (a
    min-aggregate per token — the events_cumulative_users
    first-appearance device); the cumulative sums run over the
    ≤n_buckets bucket rows, the sanctioned bounded window. Every
    output is an exact long.

    Returns one row per non-empty bucket: ``bucket, n_tokens,
    new_vocab, cum_tokens, cum_vocab``."""
    from pyspark.sql.window import Window

    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    toks = (
        df.select(
            F.col(id_col).alias("__id"),
            F.explode(F.split(F.col(text_col), " ")).alias("__t"),
        )
        .filter(F.col("__t") != "")
        # feeds the per-bucket totals AND the first-appearance pass
        .localCheckpoint(eager=False)
    )
    bounds = df.agg(
        F.min(id_col).alias("__mn"), F.max(id_col).alias("__mx")
    )
    bucket = F.expr(
        f"(__id - __mn) * {int(n_buckets)} DIV (__mx - __mn + 1)"
    ).cast("long")
    with_b = toks.crossJoin(F.broadcast(bounds)).withColumn("__b", bucket)
    per_bucket = with_b.groupBy("__b").agg(
        F.count(F.lit(1)).alias("n_tokens")
    )
    firsts = (
        with_b.groupBy("__t")
        .agg(F.min("__b").alias("__fb"))
        .groupBy(F.col("__fb").alias("__b"))
        .agg(F.count(F.lit(1)).alias("new_vocab"))
    )
    j = per_bucket.join(firsts, "__b", "left").select(
        F.col("__b").alias("bucket"),
        "n_tokens",
        F.coalesce("new_vocab", F.lit(0)).alias("new_vocab"),
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        j.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .withColumn("cum_vocab", F.sum("new_vocab").over(w))
        .orderBy("bucket")
    )
