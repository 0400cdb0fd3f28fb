"""Deduplication operators for large-scale training-data pipelines.

Five families, each designed around Spark's shuffle model:

* **exact** — hash-groupBy on a content key. One shuffle on the hash;
  at 100 TB the key is a 128-bit md5 so the shuffle carries ~50 B/row
  instead of the document text.
* **n-gram Jaccard** — exact set similarity, *blocked* so the join is
  O(sum of block²) not O(n²). Callers pick block columns (language,
  source, length bucket, ...).
* **MinHash** — signature per doc (JVM-side, one pass, no shuffle),
  then either blocked pairwise estimation or LSH banding: band hashes
  explode k rows/doc, groupBy band bucket, pair within buckets. The
  banding path is the 100 TB route: candidate pairs scale with bucket
  occupancy, not n².
* **SimHash** — 32-bit per-doc fingerprint; near-dup = small Hamming
  distance (``bit_count(xor)``), blocked or banded by hash prefix.
* **embedding cosine** — exact blocked pairwise over normalized
  vectors; the LSH variant in ``operators.similarity`` covers scale.

All hashing uses the md5-derived 60-bit convention from
``functions.text`` so every deterministic output is DuckDB-checkable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..functions.scan import spread_small_scan
from ..functions.text import (
    distinct_tokens_expr,
    est_jaccard_from_sigs_expr,
    jaccard_expr,
    md5_long_expr,
    md5_long64_expr,
    minhash_signature_expr,
    simhash_expr,
    token_hashes_expr,
    tokens_expr,
    word_ngrams_expr,
)
from ..functions.vector import cosine_expr, inv_norm_expr

__all__ = [
    "exact_dedup_keep_first",
    "duplicate_groups",
    "fingerprint_groups",
    "jaccard_pairs",
    "prefix_filter_pairs",
    "tfidf_cosine_pairs",
    "minhash_signatures",
    "minhash_pairs",
    "minhash_lsh_candidates",
    "banding_threshold",
    "simhash_table",
    "simhash_pairs",
    "simhash_banded_pairs",
    "fingerprint_banded_pairs",
    "edit_distance_pairs",
    "frequent_segments",
    "incremental_components",
    "incremental_dedup",
    "prepare_ingest_corpus",
    "PreparedCorpus",
    "incremental_dedup_matches",
    "remove_duplicated_spans",
    "remove_frequent_segments",
    "remove_repeated_windows",
    "embedding_neardup_pairs",
    "semdedup",
    "connected_components",
    "keep_representatives",
]


def _content_key(text_col, normalize: bool) -> F.Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    if normalize:
        c = F.lower(F.trim(c))
    return F.md5(c)


# --- exact ---------------------------------------------------------------


def exact_dedup_keep_first(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", normalize: bool = True
) -> DataFrame:
    """Keep the lowest-id row per exact content key. Implemented as
    min-id-per-key + semi-join back (two narrow shuffles on the md5
    key) rather than a window over the full rows — the shuffle payload
    stays (key, id), not the document."""
    key = _content_key(text_col, normalize).alias("__key")
    keyed = df.withColumn("__key", key)
    keep = keyed.groupBy("__key").agg(F.min(id_col).alias(id_col))
    return keyed.join(keep, ["__key", id_col], "left_semi").drop("__key")


def duplicate_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", normalize: bool = True
) -> DataFrame:
    """Per content-key group stats: size + representative (min) id."""
    return (
        df.withColumn("__key", _content_key(text_col, normalize))
        .groupBy(F.col("__key").alias("content_key"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_id"))
    )


def fingerprint_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Group by token-set fingerprint (order/multiplicity-insensitive
    near-exact dedup)."""
    from ..functions.text import fingerprint_expr

    return (
        df.withColumn("__fp", fingerprint_expr(text_col))
        .groupBy(F.col("__fp").alias("fingerprint"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_id"))
    )


# --- n-gram / word Jaccard ----------------------------------------------


def jaccard_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: Sequence[str] = (),
    tokens_col: F.Column | None = None,
) -> DataFrame:
    """Exact Jaccard-similar pairs (id_a < id_b) within blocks.

    Blocking bounds the pairwise join; an unblocked call is an O(n²)
    cross join and only sane on small tables. Returns
    (id_a, id_b, jaccard).

    Tokens stay STRINGS here, unlike the keyed formulations: in the
    array form the tokens are not a join key — the block join ships
    whole arrays either way and the intersect runs post-join — so
    per-element xxhash64 (an uncodegen'd HOF lambda, evaluated in both
    join branches) costs more than it saves (measured 2× slower at
    sf0.1 when tried)."""
    toks = tokens_col if tokens_col is not None else distinct_tokens_expr(text_col)
    t = df.select(
        F.col(id_col).alias("__id"), toks.alias("__w"), *[F.col(c) for c in block_cols]
    )
    # alias-style self-join: both branches are the SAME canonical
    # subtree, making shuffle-stage reuse possible and keeping the
    # projection list in one place (AQE canonicalizes away simple
    # renames too, so this is correctness-of-intent, not a local-mode
    # speedup)
    a, b = t.alias("a"), t.alias("b")
    cond = F.col("a.__id") < F.col("b.__id")
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    return (
        a.join(b, cond)
        .withColumn("jaccard", jaccard_expr(F.col("a.__w"), F.col("b.__w")))
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"), "jaccard"
        )
    )


def jaccard_pairs_exploded(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: Sequence[str] = (),
    tokens_col: F.Column | None = None,
) -> DataFrame:
    """Exact Jaccard pairs via the shuffle-parallel formulation: explode
    distinct tokens, self-join on (token, blocks) to count
    co-occurrences, then jaccard = c / (|A| + |B| - c).

    Same results as :func:`jaccard_pairs` (pairs with zero intersection
    can't reach any threshold > 0), but the work is Σ_token df(token)²
    spread across a hash shuffle instead of per-pair array intersects in
    a single join — the shape that scales out and that skew-splitting
    (AQE) can handle when one token is hot. Prefer this for large
    corpora; the array form for small blocked tables."""
    toks = tokens_col if tokens_col is not None else distinct_tokens_expr(text_col)
    # explode(expr) directly — see tfidf_cosine_pairs for why naming
    # the array in an intermediate projection is a Generate-filter trap
    sizes = df.select(F.col(id_col).alias("__id"), F.size(toks).alias("__n"))
    # join on the token's xxhash64, not the string: the self-join
    # shuffles one long per (doc, token) instead of the token bytes
    tok = df.select(
        F.col(id_col).alias("__id"), F.explode(toks).alias("__ts"),
        *[F.col(c) for c in block_cols],
    ).select(
        "__id",
        F.xxhash64("__ts").alias("__t"),
        *[F.col(c) for c in block_cols],
    )
    a = tok.select(
        F.col("__id").alias("id_a"), F.col("__t"),
        *[F.col(c).alias(f"__b_{c}") for c in block_cols],
    )
    b = tok.select(
        F.col("__id").alias("id_b"), F.col("__t").alias("__t2"),
        *[F.col(c).alias(f"__b2_{c}") for c in block_cols],
    )
    cond = (F.col("__t") == F.col("__t2")) & (F.col("id_a") < F.col("id_b"))
    for c in block_cols:
        cond = cond & (F.col(f"__b_{c}") == F.col(f"__b2_{c}"))
    inter = (
        a.join(b, cond)
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    na = sizes.select(F.col("__id").alias("id_a"), F.col("__n").alias("__na"))
    nb = sizes.select(F.col("__id").alias("id_b"), F.col("__n").alias("__nb"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard",
            F.col("__c").cast("double")
            / (F.col("__na") + F.col("__nb") - F.col("__c")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def prefix_filter_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: F.Column | None = None,
) -> DataFrame:
    """Exact Jaccard pairs via PREFIX FILTERING (Chaudhuri et al.
    SSJoin '06 / Bayardo AllPairs WWW'07) — the third set-similarity
    candidate generator beside the exploded postings join
    (:func:`jaccard_pairs_exploded`) and MinHash banding
    (:func:`minhash_lsh_candidates`), and the only one that is BOTH
    exact (zero recall loss, unlike banding) and sub-postings-cost
    (unlike the full token self-join).

    The pruning lemma: order every token set by one GLOBAL rarity
    order (ascending document frequency, token tie-break). If
    ``J(x, y) >= t`` then ``|x ∩ y| >= ceil(t·|x|)``, so the first
    ``|x| - ceil(t·|x|) + 1`` tokens of x — its *prefix* — must hit y
    (pigeonhole: missing the whole prefix leaves fewer than ``t·|x|``
    tokens to intersect). Hence joining PREFIX postings only is
    complete, and because prefixes hold each doc's RAREST tokens, the
    candidate cost is Σ df(token)² over rare tokens — orders of
    magnitude below the full postings join whose cost is dominated by
    the most common tokens. A size filter (``t·|x| <= |y| <=
    |x|/t``) prunes further before verification.

    Plan shape (all bucketed, never n²): token-df aggregate →
    per-doc rank window (bounded by the doc's token count) → prefix
    postings self-join on the token hash → pair dedup BEFORE the
    verify (a pair sharing m prefix tokens is claimed once) → exact
    verify by re-joining the two full token arrays. At 100 TB each
    stage is one hash shuffle; the verify join ships arrays for
    candidate pairs only.

    Returns (id_a, id_b, jaccard), identical to
    :func:`jaccard_pairs`; oracle-checked against the naive
    formulation."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    toks = tokens_col if tokens_col is not None else distinct_tokens_expr(text_col)
    base = df.select(F.col(id_col).alias("__id"), toks.alias("__w"))
    sized = base.select("__id", "__w", F.size("__w").alias("__n")).filter(
        F.col("__n") > 0
    )
    posting = sized.select(
        "__id", "__n", F.explode("__w").alias("__tok")
    ).select("__id", "__n", F.xxhash64("__tok").alias("__t"), "__tok")
    # global rarity order: ascending df, token-hash tie-break
    dfreq = posting.groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
    ranked = posting.join(dfreq, "__t").withColumn(
        "__rk",
        F.row_number().over(
            Window.partitionBy("__id").orderBy("__df", "__t")
        ),
    )
    prefix_len = F.col("__n") - F.ceil(F.lit(threshold) * F.col("__n")) + 1
    prefix = ranked.filter(F.col("__rk") <= prefix_len).select(
        "__id", "__n", "__t"
    )
    pa = prefix.select(
        F.col("__id").alias("id_a"), F.col("__n").alias("__na"), "__t"
    )
    pb = prefix.select(
        F.col("__id").alias("id_b"), F.col("__n").alias("__nb"),
        F.col("__t").alias("__t2"),
    )
    cands = (
        pa.join(
            pb,
            (F.col("__t") == F.col("__t2"))
            & (F.col("id_a") < F.col("id_b"))
            # size filter: t·|x| <= |y| <= |x|/t, both directions
            & (F.col("__nb") * F.lit(threshold) <= F.col("__na"))
            & (F.col("__na") * F.lit(threshold) <= F.col("__nb")),
        )
        # dedup BEFORE the verify: a pair sharing m prefix tokens
        # would be verified m times otherwise
        .groupBy("id_a", "id_b")
        .agg(F.first(F.lit(1)))
        .select("id_a", "id_b")
        # pin the BOUNDED pair list so the verify joins plan against a
        # materialized relation instead of re-expanding the whole
        # rank/postings subtree per branch (measured 11.7s -> 6.2s at
        # sf0.1); the corpus-sized token table is deliberately NOT
        # pinned — at 100 TB that's storage pressure, re-scanning is
        # cheaper
        .localCheckpoint(eager=False)
    )
    wa = sized.select(F.col("__id").alias("id_a"), F.col("__w").alias("__wa"))
    wb = sized.select(F.col("__id").alias("id_b"), F.col("__w").alias("__wb"))
    return (
        cands.join(wa, "id_a")
        .join(wb, "id_b")
        .withColumn("jaccard", jaccard_expr(F.col("__wa"), F.col("__wb")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    terms_col: F.Column | None = None,
    max_df_frac: float = 0.5,
    block_cols: Sequence[str] = (),
) -> DataFrame:
    """TF-IDF-weighted cosine-similar pairs (id_a < id_b) — the sparse
    lexical near-dup measure (vs the set measures above): weighted by
    term rarity, so boilerplate overlap scores low and rare-phrase
    overlap scores high.

    Semantics: terms with document frequency above ``max_df_frac`` are
    removed from the vocabulary entirely (stopword-style), then cosine
    is EXACT over the pruned vocabulary — deterministic and
    SQL-reproducible, unlike candidate-only prefix filtering.

    Scale shape (the classic sparse-similarity-join plan):
    1. explode terms -> per-(doc, term) tf: one shuffle keyed
       (doc, term), map-side combined.
    2. global df + corpus size: tiny aggregates; idf joins back to the
       postings by term — vocabulary-sized build side, which the
       planner broadcasts when small (word/bigram vocabularies); for
       unbounded term spaces (shingles) it degrades to a hash join,
       still keyed by term.
    3. postings self-join on (term, blocks): work is
       Σ_term df(term)² *after* the max_df pruning — the pruning knob
       is exactly what bounds the hot posting lists; AQE skew-split
       handles the residue. Never O(n²) in docs.
    4. per-pair dot via groupBy(id_a, id_b) partial sums; norms join.
    ``block_cols`` additionally restricts pairs to same-block (e.g.
    language), multiplying df-pruning rather than replacing it.
    """
    terms = terms_col if terms_col is not None else tokens_expr(text_col)
    blocks = [F.col(c) for c in block_cols]
    # explode(expr) DIRECTLY — naming the term array in an intermediate
    # projection and exploding the column lets InferFiltersFromGenerate
    # clone the whole generator expression into a pushed-down Filter
    # with any referenced projections re-inlined (measured 10-20x on
    # n-gram terms, where the inlined tokenization re-evaluates per
    # element). Callers materialize heavy sub-exprs (e.g. split) as
    # real columns of ``df`` instead.
    # terms become xxhash64 longs right after the Generate: the tf
    # shuffle, the idf join and the postings self-join all key on one
    # long instead of term bytes (identity is all they consume; the
    # 2^-64 collision caveat from the matmul kernel applies)
    tf = (
        df.select(F.col(id_col).alias("__id"), F.explode(terms).alias("__ts"), *blocks)
        .select("__id", F.xxhash64("__ts").alias("__t"), *block_cols)
        .groupBy("__id", "__t", *block_cols)
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    # pin (round 11): tf feeds BOTH the idf aggregate and the postings
    # join — Catalyst re-expands the explode+agg subtree per consumer,
    # and the plan audit showed the document scan 6x. The per-(doc,
    # term-hash) tf table is the classic inverted-index artifact —
    # id + long + count per posting — materialized by every sparse
    # similarity-join implementation at scale.
    tf = tf.localCheckpoint(eager=False)
    n_docs = df.agg(F.count(F.lit(1)).alias("__N"))
    idf = (
        tf.groupBy("__t")
        .agg(F.count(F.lit(1)).alias("__df"))
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("__df").cast("double") / F.col("__N") <= max_df_frac)
        .select("__t", F.log(F.col("__N").cast("double") / F.col("__df")).alias("__idf"))
    )
    # One postings tree carrying the doc norm via a window (one shuffle
    # keyed __id) instead of a separate groupBy + two post-hoc joins;
    # the a/b branches below are then the SAME canonical subtree, so the
    # join-side hash exchange on (__t, blocks) is computed once and
    # ReusedExchange feeds the other side.
    win = Window.partitionBy("__id")
    post = (
        tf.join(idf, "__t")
        .select("__id", "__t", (F.col("__tf") * F.col("__idf")).alias("__w"),
                *block_cols)
        .withColumn("__norm", F.sqrt(F.sum(F.col("__w") * F.col("__w")).over(win)))
    )
    # pin the weighted postings too: the self-join references post
    # twice, and the idf broadcast side otherwise recomputes the window
    # pass per side (interleaved A/B: none 2.99 / tf 2.69 / post 2.45 /
    # both 2.09 s at sf0.1)
    post = post.localCheckpoint(eager=False)
    a, b = post.alias("a"), post.alias("b")
    cond = (F.col("a.__t") == F.col("b.__t")) & (F.col("a.__id") < F.col("b.__id"))
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    dots = (
        a.join(b, cond)
        .groupBy(
            F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b")
        )
        .agg(
            F.sum(F.col("a.__w") * F.col("b.__w")).alias("__dot"),
            F.first(F.col("a.__norm")).alias("__na"),
            F.first(F.col("b.__norm")).alias("__nb"),
        )
    )
    # zero-norm guard (every surviving term can have idf 0 when its df
    # hits the corpus size at max_df_frac=1.0): cosine defined as 0,
    # matching the reference's zero-vector convention (src/vec.rs:131-133)
    denom = F.col("__na") * F.col("__nb")
    return (
        dots.withColumn(
            "cosine",
            F.when(denom > 0, F.col("__dot") / denom).otherwise(F.lit(0.0)),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def jaccard_pairs_blocked_matmul(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: Sequence[str] = (),
    tokens_col: F.Column | None = None,
    measure: str = "jaccard",
    rows_per_block: int = 2048,
) -> DataFrame:
    """Exact set-similarity pairs via incidence-matrix matmuls over
    bounded sub-blocks. ``measure``: 'jaccard' (|A∩B| / |A∪B|) or
    'containment' (|A∩B| / min(|A|,|B|)) — same kernel, different
    denominator.

    Every (block_cols) group is salted into sub-blocks of ~``rows_per_
    block`` docs (hash striping on the id, so no per-block sort and no
    single-task window); each sub-block PAIR (a <= b) joins into one
    kernel row. The kernel factorizes the pair's union vocabulary,
    builds docs×vocab 0/1 matrices, and ``Ma @ Mb.T`` yields all
    cross-pair intersection counts in one BLAS call — the pair-dense
    analog of the GEMM near-dup path (2.8× faster than the exploded
    self-join on dense blocks; counts ≤ 2^24 stay exact in float32).
    Same results as :func:`jaccard_pairs`.

    Scale design: per-task memory is capped at ~``rows_per_block`` ×
    vocab × 4 B regardless of how skewed the block key distribution is
    — a billion-doc (lang, source) shard becomes ⌈n/cap⌉ sub-blocks and
    ⌈n/cap⌉² kernel tasks instead of one OOM-ing task, and parallelism
    grows with data volume instead of being pinned at #blocks. Docs are
    packed as collect_list(struct(side, id, tokens)) so a NULL token
    array can never misalign ids against token sets (the kernel drops
    it, matching SQL semantics where a NULL set yields NULL similarity).

    Tokens cross the shuffle as xxhash64 values, not strings: token
    IDENTITY is all the kernel needs, int64 halves the shuffled bytes
    vs short strings, and the Arrow batches land as native int64
    ndarrays instead of Python-object string arrays (np.unique on ints,
    no per-token object churn — ~10-15%% end-to-end at sf0.1). Two
    distinct tokens colliding would merge one vocab column; at 2^-64
    per pair that is beyond negligible (a corpus of 10^9 distinct
    tokens has ~3%% chance of ONE collision existing anywhere).

    The sub-block salt stays on even when every block fits
    ``rows_per_block`` (nsub==1, where the counts join + pair explode
    cost ~0.1 s of constants at sf0.1): skipping it would take either a
    second scan of the text column (two disjoint broadcast-filtered
    lanes) or a driver-side max-block count at plan time — both worse
    at scale than the constants they save."""
    import numpy as np
    from pyspark.sql import types as T

    if measure not in ("jaccard", "containment"):
        raise ValueError(f"unknown measure {measure!r}")
    out_name = "jaccard" if measure == "jaccard" else "containment"

    toks_str = tokens_col if tokens_col is not None else distinct_tokens_expr(text_col)
    toks = F.transform(toks_str, lambda t: F.xxhash64(t))
    # NO .filter(__w.isNotNull()) here: the pushed-down predicate would
    # re-evaluate the (expensive) token expression a second time —
    # Catalyst has no CSE across the filter/project boundary (measured
    # +1.7 s at sf0.1, a full extra tokenize pass). NULL token sets are
    # dropped inside the kernel instead, where it costs nothing.
    # round 11: widen a narrow scan before the (expensive) tokenize —
    # the counts branch below stays on the raw df (it only counts rows)
    base = spread_small_scan(df).select(
        F.col(id_col).alias("__id"), toks.alias("__w"), *[F.col(c) for c in block_cols]
    )
    # per-block doc counts are tiny (one row per distinct block key) —
    # broadcast back to size the salt: n_sub = ceil(block_n / cap).
    # Counted on the RAW df, not the tokenized projection: the count
    # only sizes the salt, so including null-token rows merely rounds
    # nsub up — and the (expensive) token expression is evaluated once,
    # not once more for the count branch.
    grp = [F.col(c) for c in block_cols] if block_cols else [F.lit(1).alias("__all")]
    counts = df.groupBy(*grp).agg(F.count(F.lit(1)).alias("__bn"))
    key_cols = block_cols if block_cols else ["__all"]
    if not block_cols:
        base = base.withColumn("__all", F.lit(1))
    salted = base.join(F.broadcast(counts), list(key_cols)).withColumn(
        "__nsub", F.ceil(F.col("__bn") / F.lit(rows_per_block)).cast("int")
    )
    # hash striping: deterministic, one narrow projection, balanced in
    # expectation (row_number striping would be exact but needs a
    # per-block sort through a single task — the OOM we are avoiding)
    salted = salted.withColumn(
        "__sub", F.pmod(F.xxhash64(F.col("__id")), F.col("__nsub")).cast("int")
    )
    # single-tree pair generation (no pack-then-self-join, which would
    # re-evaluate the whole tokenize+pack subtree once per join branch):
    # each doc in sub-block s explodes into every pair (min(s,t),
    # max(s,t)), tagged with which side of the pair it sits on; one
    # groupBy packs ONE side-tagged list (cheaper than two NULL-padded
    # lists — one aggregation buffer, no CaseWhen per doc). A doc ships
    # nsub times — the same volume the join formulation shuffles, in
    # one shuffle, one pass.
    exploded = salted.select(
        *key_cols,
        F.col("__sub"),
        F.col("__id"),
        F.col("__w"),
        F.explode(F.sequence(F.lit(0), F.col("__nsub") - 1)).alias("__t"),
    )
    with_pair = exploded.select(
        *key_cols,
        F.least(F.col("__sub"), F.col("__t")).alias("pa"),
        F.greatest(F.col("__sub"), F.col("__t")).alias("pb"),
        F.struct(
            (F.col("__sub") <= F.col("__t")).alias("s"),
            F.col("__id").alias("i"),
            F.col("__w").alias("w"),
        ).alias("__doc"),
    )
    joined = with_pair.groupBy(*key_cols, "pa", "pb").agg(
        F.collect_list("__doc").alias("docs"),
    )
    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField(out_name, T.DoubleType()),
        ]
    )

    def _unpack(docs):
        # a NULL token set (null text) contributes no pairs — SQL
        # semantics where NULL similarity fails every threshold
        docs = [d for d in docs if d["w"] is not None]
        ids = np.array([d["i"] for d in docs], dtype=np.int64)
        ws = [np.asarray(d["w"]) for d in docs]
        lens = np.array([len(w) for w in ws], dtype=np.int64)
        return ids, ws, lens

    def _incidence(ws, lens, codes, n_vocab):
        M = np.zeros((len(ws), n_vocab), dtype=np.float32)
        if lens.sum():
            M[np.repeat(np.arange(len(ws)), lens), codes] = 1.0
        return M

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                same = row.pa == row.pb
                ids_a, ws_a, lens_a = _unpack(
                    row.docs if same else [d for d in row.docs if d["s"]]
                )
                ids_b, ws_b, lens_b = (
                    (ids_a, ws_a, lens_a)
                    if same
                    else _unpack([d for d in row.docs if not d["s"]])
                )
                if len(ids_a) == 0 or len(ids_b) == 0 or (same and len(ids_a) < 2):
                    continue
                all_ws = ws_a if same else [*ws_a, *ws_b]
                nonempty = [w for w in all_ws if len(w)]
                if not nonempty:
                    continue
                flat = np.concatenate(nonempty)
                _, codes = np.unique(flat, return_inverse=True)
                n_vocab = int(codes.max()) + 1 if len(codes) else 0
                split = int(lens_a.sum())
                Ma = _incidence(ws_a, lens_a, codes[:split], n_vocab)
                Mb = (
                    Ma
                    if same
                    else _incidence(ws_b, lens_b, codes[split:], n_vocab)
                )
                inter = Ma @ Mb.T
                sa = lens_a.astype(np.float64)
                sb = lens_b.astype(np.float64)
                if measure == "jaccard":
                    denom = sa[:, None] + sb[None, :] - inter
                else:
                    denom = np.minimum(sa[:, None], sb[None, :])
                sim = np.where(denom > 0, inter / denom, 0.0)
                if same:
                    iu, ju = np.triu_indices(len(ids_a), k=1)
                else:
                    iu, ju = map(
                        np.ravel, np.indices((len(ids_a), len(ids_b)))
                    )
                keep = sim[iu, ju] >= threshold
                pa, pb = ids_a[iu[keep]], ids_b[ju[keep]]
                lo, hi = np.minimum(pa, pb), np.maximum(pa, pb)
                yield pd.DataFrame(
                    {"id_a": lo, "id_b": hi, out_name: sim[iu, ju][keep]}
                )

    return joined.mapInPandas(kernel, out_schema)


# --- MinHash -------------------------------------------------------------


def _exploded_token_hashes(
    df: DataFrame,
    text_col: str,
    id_col: str,
    keep_cols: Sequence[str],
    wide: bool = False,
) -> DataFrame:
    """(id, keep..., __h) — one row per distinct token, md5-hashed
    (60-bit by default; ``wide=True`` fills all 64 bits for consumers
    that index bits 60-63, e.g. 64-bit SimHash).

    Why rows, not a packed array: signature builders that fan a packed
    token-hash array into 16 permutation mins / 32 bit votes hit a
    Catalyst blind spot — CollapseProject merges the array projection
    into every consumer (it even merges through
    RepartitionByExpression), and runtime subexpression elimination
    skips lambda-bearing higher-order functions, so the md5 transform
    ends up evaluated 16-68× per row (measured: a >5× slowdown).
    Per-row scalar md5 has neither problem (plain scalars ARE CSE'd),
    and the downstream hash aggregation gets map-side partial combine,
    which a higher-order fold over arrays never does."""
    tok = df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.explode(distinct_tokens_expr(text_col)).alias("__tok"),
    )
    hash_expr = md5_long64_expr if wide else md5_long_expr
    return tok.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        hash_expr(F.col("__tok")).alias("__h"),
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-doc MinHash signature (array<long>, length n_hashes), as a
    hash aggregation over exploded token hashes: ``min(mix(h, c_i))``
    per permutation with map-side partial combine — the scale shape
    (the shuffle carries n_hashes longs per doc per map task, never
    token arrays). Docs whose text is NULL produce no rows (they have
    no token set)."""
    from ..functions.text import MINHASH_PERM_CONSTANTS, _perm_mix

    if n_hashes > len(MINHASH_PERM_CONSTANTS):
        raise ValueError(f"n_hashes max {len(MINHASH_PERM_CONSTANTS)}")
    hashed = _exploded_token_hashes(df, text_col, id_col, keep_cols)
    aggs = [
        F.min(_perm_mix(F.col("__h"), MINHASH_PERM_CONSTANTS[i])).alias(f"__m{i}")
        for i in range(n_hashes)
    ]
    return (
        hashed.groupBy(F.col(id_col), *[F.col(c) for c in keep_cols])
        .agg(*aggs)
        .select(
            F.col(id_col),
            *[F.col(c) for c in keep_cols],
            F.array(*[F.col(f"__m{i}") for i in range(n_hashes)]).alias("signature"),
        )
    )


def minhash_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    block_cols: Sequence[str] = (),
) -> DataFrame:
    """Pairs whose estimated Jaccard (fraction of equal signature
    slots) >= threshold, within blocks. Returns (id_a, id_b, est_jaccard).

    For threshold > 0 this is the SPARSE formulation: explode each
    signature to (slot, value) rows and equi-join on (block, slot,
    value), so work scales with the number of MATCHING slots, not with
    block² dense signature compares — any pair with est >= threshold
    shares >= 1 slot, so recall is exact (this is LSH banding with
    1-row bands plus an exact match count). threshold <= 0 must emit
    zero-match pairs too and falls back to the dense blocked compare."""
    # pin the signature table (id + n_hashes ints per doc — the
    # compressed representation): both the dense and the sparse path
    # self-join it, and a broadcast side would recompute the whole
    # corpus-scan signature aggregate (round-11 finding)
    sigs = minhash_signatures(
        df, text_col, id_col, n_hashes, keep_cols=block_cols
    ).localCheckpoint(eager=False)
    if threshold <= 0:
        # dense all-pairs compare
        a, b = sigs.alias("a"), sigs.alias("b")
        cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
        for c in block_cols:
            cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
        return (
            a.join(b, cond)
            .withColumn(
                "est_jaccard",
                est_jaccard_from_sigs_expr(F.col("a.signature"), F.col("b.signature")),
            )
            .filter(F.col("est_jaccard") >= threshold)
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                "est_jaccard",
            )
        )
    slots = sigs.select(
        F.col(id_col),
        *[F.col(c) for c in block_cols],
        F.posexplode("signature").alias("__slot", "__mh"),
    )
    a, b = slots.alias("a"), slots.alias("b")
    cond = (
        (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        & (F.col("a.__slot") == F.col("b.__slot"))
        & (F.col("a.__mh") == F.col("b.__mh"))
    )
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    return (
        a.join(b, cond)
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg((F.count(F.lit(1)) / F.lit(float(n_hashes))).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


def _banded_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int,
    bands: int,
    block_cols: Sequence[str],
    signatures: DataFrame | None = None,
) -> DataFrame:
    """(id, blocks..., band_id, band_hash): each signature split into
    ``bands`` bands of ``n_hashes/bands`` rows, each band md5-hashed —
    deterministic, so a DuckDB oracle rebuilds identical buckets.
    ``signatures`` (as produced by :func:`minhash_signatures` with
    ``keep_cols=block_cols``) skips recomputing the corpus-scan
    signature aggregate when the caller already has it."""
    rows = n_hashes // bands
    sigs = (
        signatures
        if signatures is not None
        else minhash_signatures(df, text_col, id_col, n_hashes, keep_cols=block_cols)
    )
    out = sigs.select(
        F.col(id_col),
        *[F.col(c) for c in block_cols],
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bnd: F.md5(
                    F.array_join(F.slice(F.col("signature"), bnd * rows + 1, rows), ",")
                ),
            )
        ).alias("band_id", "band_hash"),
    )
    return out


def banding_threshold(bands: int, rows_per_band: int) -> float:
    """The Jaccard similarity at which a pair's probability of sharing
    at least one band bucket crosses ~50%: ``(1/b)^(1/r)`` (Leskovec
    et al., Mining of Massive Datasets ch. 3). The S-curve is steep
    around this value — pairs well above it are almost surely caught,
    pairs below almost surely missed — so pick (b, r) with threshold
    AT OR BELOW the verify gate, and measure the result with the
    suite's ``eval_banding_recall``. E.g. 2 bands x 8 rows -> 0.917
    (misses 0.8-threshold boundary pairs, recall ~0.59 at sf0.1);
    8 bands x 2 rows -> 0.354 (high recall, more candidates to
    verify)."""
    if bands < 1 or rows_per_band < 1:
        raise ValueError("bands and rows_per_band must be >= 1")
    return (1.0 / bands) ** (1.0 / rows_per_band)


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    block_cols: Sequence[str] = (),
    signatures: DataFrame | None = None,
) -> DataFrame:
    """LSH banding: split each signature into ``bands`` bands of
    ``n_hashes/bands`` rows, hash each band, and emit candidate pairs
    that share any band bucket. This is the at-scale candidate
    generator: shuffle is on (band_id, band_hash) buckets, candidate
    count tracks bucket occupancy rather than n². Follow with an exact
    or signature-estimate re-score. Pass precomputed ``signatures``
    (minhash_signatures with ``keep_cols=block_cols``) to skip the
    corpus signature scan when the caller reuses it elsewhere."""
    # pin: the candidate self-join references the banded-signature
    # subtree twice, and a broadcast side would recompute the whole
    # corpus-scan signature aggregate (round-11 finding). Banded
    # signatures are the compressed representation — bands rows of
    # (id, 32-char hash) per doc. Single-reference consumers
    # (incremental_dedup_matches' batch side) deliberately do NOT pin.
    banded = _banded_signatures(
        df, text_col, id_col, n_hashes, bands, block_cols, signatures
    ).localCheckpoint(eager=False)
    keys = ["band_id", "band_hash", *block_cols]
    a, b = banded.alias("a"), banded.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    for c in keys:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


# --- SimHash -------------------------------------------------------------


def simhash_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-doc SimHash fingerprint (long, ``bits`` low bits used), as a
    hash aggregation over exploded token hashes with SWAR bit-slicing:
    each of ⌈bits/4⌉ sum() accumulators packs four 16-bit per-bit vote
    counters (so ≤ 32767 distinct tokens per doc before the top lane
    could overflow a signed sum — far above any real document), with
    map-side partial combine; the fingerprint is assembled from the
    unpacked lanes in one post-agg projection. No md5 in the per-bit
    loop, no per-doc array materialization, and the shuffle carries ~9
    longs per doc per map task (17 at bits=64). Docs whose text is NULL
    produce no rows.

    ``bits`` up to 64: fingerprints above 60 bits switch to the
    full-64-bit token hash (the default 60-bit draw leaves bits 60-63
    permanently zero), and bit 63 lands in the long's sign bit — a bit
    pattern, not a number."""
    if not 0 < bits <= 64:
        raise ValueError(f"bits must be in 1..64, got {bits}")
    nlongs = (bits + 3) // 4
    hashed = _exploded_token_hashes(
        df, text_col, id_col, keep_cols, wide=bits > 60
    )

    def spread(j: int):
        # four bits' worth of this token's hash, spread into 16-bit lanes
        out = None
        for k in range(4):
            b = 4 * j + k
            if b >= bits:
                break
            term = F.shiftleft(F.shiftright(F.col("__h"), b).bitwiseAND(F.lit(1)), 16 * k)
            out = term if out is None else out + term
        return out

    g = hashed.groupBy(F.col(id_col), *[F.col(c) for c in keep_cols]).agg(
        *[F.sum(spread(j)).alias(f"__c{j}") for j in range(nlongs)],
        F.count(F.lit(1)).alias("__n"),
    )
    fp = F.lit(0).cast("long")
    for b in range(bits):
        j, k = divmod(b, 4)
        cnt = F.shiftright(F.col(f"__c{j}"), 16 * k).bitwiseAND(F.lit(0xFFFF))
        # shiftleft, not a literal: 1 << 63 wraps into the sign bit,
        # which Python's unbounded int literal cannot express as a long
        bitval = F.shiftleft(F.lit(1).cast("long"), b)
        fp = fp + F.when(cnt * 2 > F.col("__n"), bitval).otherwise(F.lit(0))
    return g.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        fp.alias("simhash"),
    )


def simhash_pairs(
    df: DataFrame,
    max_hamming: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    block_cols: Sequence[str] = (),
) -> DataFrame:
    """Pairs with Hamming distance <= max_hamming between SimHashes,
    within blocks. Returns (id_a, id_b, hamming).

    This is the blocked ALL-PAIRS form — kept deliberately alongside
    :func:`simhash_banded_pairs` because pigeonhole banding only pays
    when the chunks stay selective: with 32-bit fingerprints and
    d = 6, the 7 chunks are ~4.5 bits each, so a random pair collides
    in some chunk with probability ≈ 7/2^4.5 ≈ 30% and banding
    degenerates toward all-pairs WITH extra join overhead. Rule of
    thumb: band when bits/(d+1) >= 8 (d <= 3 at 32 bits; loose
    thresholds want 64-bit fingerprints), go all-pairs within small
    blocks otherwise."""
    # pin: the alias self-join consumes the fingerprint subtree twice,
    # and a broadcast side would recompute the whole SWAR aggregate
    # (see fingerprint_banded_pairs); fingerprints are the compressed
    # per-doc representation, so the pin is 8 bytes + id per doc
    t = simhash_table(df, text_col, id_col, bits, keep_cols=block_cols).localCheckpoint(
        eager=False
    )
    a, b = t.alias("a"), t.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    return (
        a.join(b, cond)
        .withColumn(
            "hamming",
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            "hamming",
        )
    )


def simhash_banded_pairs(
    df: DataFrame,
    max_hamming: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    block_cols: Sequence[str] = (),
) -> DataFrame:
    """SimHash near-dup pairs via pigeonhole banding — the SAME result
    set as :func:`simhash_pairs`, without the O(block²) join. This is
    the 100 TB SimHash path (Manku et al., WWW'07 §3, and the banding
    SCALE.md promises).

    The ``bits``-bit fingerprint is split into ``max_hamming + 1``
    contiguous chunks. A pair within Hamming distance d differs in at
    most d bit positions, so at least one of the d+1 chunks matches
    EXACTLY (pigeonhole) — banding has perfect recall, not approximate
    recall. Candidates are generated by a shuffle on
    (chunk_id, chunk_value, blocks) buckets — candidate volume tracks
    bucket occupancy, never n² — then verified with ``bit_count(xor)``.
    Equality with the all-pairs formulation is exactly what the DuckDB
    oracle checks (reference near-dup semantics:
    /root/reference/src/meta.rs discusses only exact match; SimHash is
    extension surface)."""
    t = simhash_table(df, text_col, id_col, bits, keep_cols=block_cols)
    return fingerprint_banded_pairs(
        t, max_hamming, id_col=id_col, fp_col="simhash", bits=bits,
        block_cols=block_cols,
    )


def fingerprint_banded_pairs(
    t: DataFrame,
    max_hamming: int,
    id_col: str = "doc_id",
    fp_col: str = "simhash",
    bits: int = 32,
    block_cols: Sequence[str] = (),
) -> DataFrame:
    """Pigeonhole-banded Hamming pairs over ANY integer fingerprint
    table (id, fingerprint): the generator behind
    :func:`simhash_banded_pairs`, reused by the multimodal
    perceptual-hash lane (operators/multimodal.py) — the banding math
    only sees bit patterns, not where they came from. Returns
    (id_a, id_b, hamming) with id_a < id_b; recall is perfect (see
    simhash_banded_pairs). NULL fingerprints produce no pairs."""
    n_chunks = max_hamming + 1
    if not 0 < n_chunks <= bits:
        raise ValueError(f"need 0 <= max_hamming < bits, got {max_hamming}/{bits}")
    bounds = [(c * bits) // n_chunks for c in range(n_chunks + 1)]
    t = t.filter(F.col(fp_col).isNotNull())
    if fp_col != "simhash":
        t = t.withColumnRenamed(fp_col, "simhash")
    # pin the fingerprint table: the banded self-join below references
    # it twice, and when the planner broadcasts one side the broadcast
    # subtree shares nothing with the probe side — the whole upstream
    # fingerprint computation (the SWAR simhash aggregate / the pHash
    # decode kernel) runs TWICE (round-11 plan audit; 2.9 -> 2.4 s on
    # dedup_simhash64_banded). Unlike raw text/token tables, the
    # fingerprint table is the COMPRESSED representation — 8 bytes + id
    # per doc — so materializing it is exactly what Manku et al.'s
    # fingerprint store does at scale, not storage pressure.
    t = t.localCheckpoint(eager=False)

    def _mask(width: int):
        # a full-width chunk (max_hamming=0, bits=64) needs all-ones,
        # which only exists as -1 in signed-long space
        return F.lit(-1 if width >= 64 else (1 << width) - 1).cast("long")

    chunks = F.array(
        *[
            F.shiftright(F.col("simhash"), bounds[c]).bitwiseAND(
                _mask(bounds[c + 1] - bounds[c])
            )
            for c in range(n_chunks)
        ]
    )
    banded = t.select(
        F.col(id_col),
        F.col("simhash"),
        *[F.col(c) for c in block_cols],
        F.posexplode(chunks).alias("__chunk_id", "__chunk_val"),
    )
    keys = ["__chunk_id", "__chunk_val", *block_cols]
    # alias self-join: one canonical banded-fingerprint subtree
    a, b = banded.alias("a"), banded.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    for c in keys:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    # a pair sharing m chunks surfaces m times — dedup the CANDIDATES
    # (fingerprints ride along, functionally dependent on the ids)
    # before the bit_count verify, so each pair is verified once and a
    # dup-heavy corpus doesn't ship every near-dup pair m times through
    # the final shuffle
    cand = (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("__sa"),
            F.col("b.simhash").alias("__sb"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def edit_distance_pairs(
    df: DataFrame,
    candidates: DataFrame,
    max_edits: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Character-level near-duplicate verification: bounded Levenshtein
    over a candidate pair set — the second stage of the standard
    two-stage char-level dedup (generator proposes, edit distance
    decides). Returns (id_a, id_b, edits) for pairs within
    ``max_edits``.

    ``candidates`` is any (id_a, id_b) generator output —
    :func:`minhash_lsh_candidates` for token-level blocking,
    :func:`jaccard_pairs_blocked_matmul` over char shingles when the
    target is char-level similarity (shingle threshold a notch below
    the edit threshold, so the generator over-proposes slightly and
    this stage trims).

    Scale shape: texts join the candidate PAIRS by id (two hash joins
    — text volume is candidates × doc length, which the generator's
    selectivity already bounded), a ``|len_a − len_b| > max_edits``
    prefilter eliminates pairs before any DP, and the verify is
    Spark's THRESHOLDED ``levenshtein(l, r, k)`` — a banded
    O(len · k) diagonal DP with early exit, not the full O(len²)
    matrix (it returns -1 above k, which the filter drops together
    with NULL texts). Never O(n²) in docs: pair volume is the
    generator's, and each verify is linear in text length for fixed
    ``max_edits``."""
    if max_edits < 0:
        raise ValueError(f"max_edits must be >= 0, got {max_edits}")
    t = df.select(
        F.col(id_col), F.col(text_col), F.length(text_col).alias("__l")
    )
    a = t.select(
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias("__ta"),
        F.col("__l").alias("__la"),
    )
    b = t.select(
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias("__tb"),
        F.col("__l").alias("__lb"),
    )
    return (
        candidates.select("id_a", "id_b")
        .join(a, "id_a")
        .join(b, "id_b")
        .filter(F.abs(F.col("__la") - F.col("__lb")) <= max_edits)
        .withColumn("edits", F.levenshtein(F.col("__ta"), F.col("__tb"), max_edits))
        .filter((F.col("edits") >= 0) & (F.col("edits") <= max_edits))
        .select("id_a", "id_b", "edits")
    )


# --- embedding near-dup --------------------------------------------------


def embedding_neardup_pairs_matmul(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_blocks: int | None = None,
    rows_per_block: int = 2000,
) -> DataFrame:
    """All-pairs cosine near-dup via blocked GEMM — the scale path for
    the unblocked O(n²) case.

    Rows are bucketed into blocks; each block is packed into one row
    (ids + normalized matrix); block pairs (a <= b) are joined and each
    pair scored with ONE NumPy matmul inside mapInPandas. Work is
    O(n²/2) multiply-adds done in BLAS instead of per-pair array
    expressions — orders of magnitude faster, and block size bounds
    executor memory (``rows_per_block`` × dim × 8 bytes per matrix; the
    default 2000×64 ≈ 1 MB). Block count defaults to n/rows_per_block —
    more blocks than needed just multiplies shuffle and Arrow overhead
    (block-pair count grows quadratically in n_blocks). Returns
    (id_a, id_b, cosine) with id_a < id_b.
    """
    import numpy as np
    from pyspark.sql import types as T

    with_inv = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__raw"),
        inv_norm_expr(vec_col).alias("__inv"),
    )
    if n_blocks is None:
        # size blocks from a broadcast count ROW, not a driver count()
        # action: the sizing joins into the same plan (no extra job,
        # no action barrier), and the operator stays lazy
        cnt = df.agg(F.count(F.lit(1)).alias("__n"))
        with_inv = with_inv.crossJoin(F.broadcast(cnt))
        nb = F.greatest(
            F.lit(1), F.ceil(F.col("__n") / F.lit(float(rows_per_block)))
        ).cast("long")
    else:
        nb = F.lit(n_blocks)
    norm = with_inv.select(
        F.col("__id"),
        F.transform(F.col("__raw"), lambda x: x.cast("double") * F.col("__inv")).alias("__v"),
        F.pmod(F.col("__id"), nb).alias("__blk"),
    )
    # one struct per doc: ids and vectors travel together, so a NULL
    # vector can never shift the lists out of alignment (collect_list
    # silently skips NULL elements — packing two parallel lists would
    # mis-attribute every score after a skipped row)
    packed = norm.groupBy("__blk").agg(
        F.collect_list(
            F.struct(F.col("__id").alias("i"), F.col("__v").alias("v"))
        ).alias("docs")
    )
    a = packed.select(F.col("__blk").alias("blk_a"), F.col("docs").alias("docs_a"))
    b = packed.select(F.col("__blk").alias("blk_b"), F.col("docs").alias("docs_b"))
    joined = a.join(b, F.col("blk_a") <= F.col("blk_b"))
    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def score_blocks(batches):
        import pandas as pd

        for pdf in batches:
            for _, row in pdf.iterrows():
                ids_a = np.array([d["i"] for d in row["docs_a"]], dtype=np.int64)
                ids_b = np.array([d["i"] for d in row["docs_b"]], dtype=np.int64)
                if len(ids_a) == 0 or len(ids_b) == 0:
                    continue
                A = np.asarray([np.asarray(d["v"]) for d in row["docs_a"]], dtype=np.float64)
                B = np.asarray([np.asarray(d["v"]) for d in row["docs_b"]], dtype=np.float64)
                S = A @ B.T
                ia, ib = np.nonzero(S >= threshold)
                if len(ia) == 0:
                    continue
                pa, pb = ids_a[ia], ids_b[ib]
                lo, hi = np.minimum(pa, pb), np.maximum(pa, pb)
                keep = lo < hi  # drop self-pairs (same-block diagonal)
                yield pd.DataFrame(
                    {"id_a": lo[keep], "id_b": hi[keep], "cosine": S[ia, ib][keep]}
                ).drop_duplicates(["id_a", "id_b"])

    return joined.mapInPandas(score_blocks, out_schema)


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_cols: Sequence[str] = (),
) -> DataFrame:
    """Exact cosine near-duplicate pairs (id_a < id_b, cosine >=
    threshold), within blocks. Inverse norms are computed once per side
    before the join so the join itself is dot-product only. For n too
    large to block-join, use operators.similarity's LSH bucketing as
    the candidate generator."""
    t = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        inv_norm_expr(vec_col).alias("__inv"),
        *[F.col(c) for c in block_cols],
    )
    # alias self-join: the norm-precompute subtree is computed once
    a, b = t.alias("a"), t.alias("b")
    cond = F.col("a.__id") < F.col("b.__id")
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    return (
        a.join(b, cond)
        .withColumn(
            "cosine",
            cosine_expr(
                F.col("a.__v"), F.col("b.__v"), F.col("a.__inv"), F.col("b.__inv")
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"), "cosine"
        )
    )


def embedding_neardup_pairs_lsh(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate embedding near-dup at corpus scale: random-hyperplane
    LSH buckets are the blocking key, exact cosine verifies inside each
    bucket. Candidate volume tracks bucket occupancy (n²/2^planes on
    uniform data) instead of n²; recall falls with angular distance —
    near-identical vectors (the dedup target) collide in almost every
    bucket. Returns a SUBSET of :func:`embedding_neardup_pairs`."""
    from .similarity import hyperplanes, lsh_bucket_expr

    if dim is None:
        first = df.select(F.size(vec_col).alias("d")).first()
        dim = int(first["d"]) if first else 0
    planes = hyperplanes(dim, n_planes=n_planes, seed=seed)
    bucketed = df.withColumn("__lsh", lsh_bucket_expr(vec_col, planes))
    return embedding_neardup_pairs(
        bucketed, threshold, vec_col=vec_col, id_col=id_col, block_cols=["__lsh"]
    )


# --- duplicate clustering (pairs -> components -> representatives) --------


def semdedup(
    df: DataFrame,
    threshold: float = 0.95,
    n_cells: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    max_iter: int = 4,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication over an embedding column — cluster with KMeans, find
    near-identical cosine pairs WITHIN each cluster, keep one
    representative per duplicate component.

    Scale shape: the expensive pairwise stage is confined to clusters
    (blocks), exactly the paper's trick — pair work is Σ_cell |cell|²
    instead of n², and cells are tuned via ``n_cells`` so a cell's
    pair block fits a task. The MLlib KMeans fit samples/aggregates
    distributed-ly; assignment is one broadcast of k centroids. Not
    SQL-reproducible (KMeans centroids), so correctness is asserted in
    tests (planted duplicates) rather than the DuckDB oracle."""
    from .similarity import ivf_build

    # few KMeans rounds + random init suffice: cells only need rough
    # locality (a dup pair has near-identical vectors, so it lands in
    # one cell under any reasonable partition of the space)
    assigned, _ = ivf_build(
        df, n_cells=n_cells, vec_col=vec_col, seed=seed, max_iter=max_iter,
        init_mode="random",
    )
    pairs = embedding_neardup_pairs(
        assigned, threshold, vec_col=vec_col, id_col=id_col,
        block_cols=("ivf_cell",),
    )
    return keep_representatives(
        df, pairs.select("id_a", "id_b"), id_col=id_col
    )


def semdedup_srp(
    df: DataFrame,
    threshold: float = 0.95,
    n_bits: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup with a DETERMINISTIC cell assignment: sign-random-
    projection cells using axis-aligned hyperplanes (the sign bits of
    the first ``n_bits`` dimensions) in place of KMeans clusters.
    Same paper trick as :func:`semdedup` — pair work confined to
    cells, Σ_cell |cell|² instead of n² — but the cell function is a
    pure scan-speed expression: no iterative fit, no seed, no
    broadcast of centroids, and (the round-7 point) SQL-expressible,
    so the suite query built on it is oracle-paired end-to-end.
    Recall caveat is the same class as KMeans cells: a near-dup pair
    is only found if it shares a cell; positive scaling (and any
    perturbation that flips no leading sign) preserves the cell by
    construction. Keep policy is min-id per connected component, as
    in :func:`semdedup`."""
    from .similarity import srp_cell_expr

    assigned = df.withColumn("__srp_cell", srp_cell_expr(vec_col, n_bits))
    pairs = embedding_neardup_pairs(
        assigned, threshold, vec_col=vec_col, id_col=id_col,
        block_cols=("__srp_cell",),
    )
    return keep_representatives(
        df, pairs.select("id_a", "id_b"), id_col=id_col
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Cluster near-duplicate PAIRS into components: returns
    (id, component) where component is the smallest id reachable
    through any chain of pairs — the step between pair generation
    (MinHash banding / SimHash / embedding near-dup) and actually
    DROPPING duplicates.

    Min-label propagation with path halving: every node starts
    labeled with itself; each round joins labels across edges (both
    directions) PLUS each node's pseudo-edge to its own current label,
    and keeps the minimum; stops when no label changed. The pseudo-edge
    resolves label(label(v)) each round, so label chains contract
    geometrically — O(log diameter) rounds (dup clusters are
    near-cliques, so 2-3 in practice); each round is one hash-shuffle
    join, and ``localCheckpoint`` cuts the lineage so the plan does
    not grow with iterations — the standard Spark shape for
    convergent iteration. Raises after ``max_iter`` rounds without
    convergence (pathological chain longer than max_iter)."""
    # the two-sided union references `pairs` twice, but both branches
    # are the same canonical subtree, so ReusedExchange serves the
    # second from the first's shuffle files (an explode-both-
    # orientations single-scan variant measured the same at sf0.1 and
    # reads worse)
    # lazy pin: the eager labels checkpoint below materializes the
    # edge partitions in the SAME job (round 11 — one scheduled job
    # replaces the former edges-job + labels-job pair); every later
    # round reads the persisted edges, never the upstream pair-gen
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    # fused first round: labels₁(v) = min(v, min neighbor) directly from
    # the edge list — one shuffle agg replaces the identity-label init
    # plus the first join round (dup clusters are near-cliques, so this
    # start is usually one round from the fixpoint already)
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("__nmin"))
        .select(
            F.col("src").alias("id"),
            F.least(F.col("src"), F.col("__nmin")).alias("component"),
        )
        .localCheckpoint()
    )
    # a clean corpus is the common case: no pairs → no components, and
    # the propagation machinery (per-round convergence job) would still
    # cost ~2 s of empty-job scheduling. Checking the just-materialized
    # labels (empty iff edges is empty) costs one first-partition read.
    if labels.isEmpty():
        return labels
    def _propagate(lbl: DataFrame) -> DataFrame:
        # smallest label among each node's neighbors (and itself), PLUS
        # the label of its own label ("path halving", round 11): each
        # node contributes a pseudo-edge (id -> component), so the dst
        # lookup also resolves label(label(v)). Candidates stay ids
        # reachable within the component (label(v) is reachable by
        # induction), so the fixpoint — min id per component — is
        # unchanged and the changed==0 convergence test stays exact,
        # but label chains contract by halving: O(log diameter) rounds
        # instead of O(diameter). At 100 TB each round is a full
        # corpus shuffle, so round count is the dominant term; the
        # union adds |V| rows to a |E|-row join input (no explosion —
        # the aggregate still returns one row per node).
        cand = edges.unionByName(
            lbl.select(F.col("id").alias("src"), F.col("component").alias("dst"))
        )
        neighbor_min = (
            cand.join(lbl, cand["dst"] == lbl["id"])
            .groupBy("src")
            .agg(F.min("component").alias("__nmin"))
        )
        return (
            lbl.join(neighbor_min, lbl["id"] == neighbor_min["src"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("__nmin"), F.col("component"))
                ).alias("component"),
                (F.coalesce(F.col("__nmin"), F.col("component")) < F.col("component"))
                .alias("__changed"),
            )
        )

    for _ in range(max_iter):
        # one propagation round per scheduled job; the lazy checkpoint
        # makes the convergence count the materializing action, so each
        # round runs ONE job. (Fusing TWO rounds per job was measured
        # and rejected in round 11: the deeper unmaterialized lineage
        # cost more than the saved driver sync on 4 of 5 CC queries.)
        updated = _propagate(labels).localCheckpoint(eager=False)
        changed = updated.filter(F.col("__changed")).limit(1).count()
        labels = updated.drop("__changed")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(duplicate chain longer than max_iter?)"
    )


def keep_representatives(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    quality_col: str | None = None,
) -> DataFrame:
    """Drop near-duplicates: cluster ``pairs`` into components and keep
    one representative per component; rows never appearing in any pair
    pass through untouched. The composition a corpus pipeline runs
    after any pair generator.

    Default representative is the min id (cheap: it IS the component
    label, no extra pass). With ``quality_col`` the HIGHEST-quality
    member survives instead — the production policy when a quality
    score exists (keep the cleanest copy, not the earliest-crawled) —
    chosen per component via one bounded min_by aggregation (ties on
    quality break to the smaller id for determinism; NULL quality
    sorts last). Either way the work added on top of the pair
    generator is the connected-components shuffle plus one
    component-keyed agg — nothing scales with pair count squared."""
    comps = connected_components(pairs, id_a, id_b)
    if quality_col is None:
        losers = comps.filter(F.col("id") != F.col("component")).select(
            F.col("id").alias(id_col)
        )
        return df.join(losers, id_col, "left_anti")
    q = df.select(F.col(id_col).alias("id"), F.col(quality_col).alias("__q"))
    ranked = comps.join(q, "id").select(
        "id",
        "component",
        # min_by over (-quality, id): max quality, then min id; NULL
        # quality maps to +inf so it never wins over a scored member
        F.struct(
            F.coalesce(-F.col("__q").cast("double"), F.lit(float("inf"))).alias(
                "__negq"
            ),
            F.col("id").alias("__tid"),
        ).alias("__ord"),
    )
    winners = ranked.groupBy("component").agg(
        F.min_by("id", "__ord").alias("__keep")
    )
    losers = (
        ranked.join(winners, "component")
        .filter(F.col("id") != F.col("__keep"))
        .select(F.col("id").alias(id_col))
    )
    return df.join(losers, id_col, "left_anti")


# --- segment-level (line) dedup ------------------------------------------


def _segments_expr(toks: F.Column, width: int) -> F.Column:
    """Non-overlapping ``width``-token segments as an array of strings
    (the trailing segment may be shorter). The line/paragraph analog
    for corpora whose documents carry no newlines: CCNet-style line
    dedup generalizes to any deterministic segmentation, and fixed
    token windows are the deterministic choice here.

    Takes a REAL token-array column, not a text column: the transform
    lambda references the array ``width+1`` times per element, so an
    inlined ``split`` would re-tokenize per segment after projection
    collapse (the Generate-filter trap, see ``tfidf_cosine_pairs``)."""
    n = F.size(toks)
    nseg = F.ceil(n / F.lit(width)).cast("int")
    segs = F.transform(
        # sequence() counts DOWN when start > stop, so guard n == 0
        F.sequence(F.lit(0), nseg - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * width + 1, width)),
    )
    return F.when(n > 0, segs).otherwise(F.array().cast("array<string>"))


def _exploded_segments(
    df: DataFrame, width: int, text_col: str, id_col: str, with_pos: bool
) -> DataFrame:
    base = df.select(
        F.col(id_col).alias("__id"), tokens_expr(text_col).alias("__w")
    )
    gen = (
        F.posexplode(_segments_expr(F.col("__w"), width)).alias("__pos", "__seg")
        if with_pos
        else F.explode(_segments_expr(F.col("__w"), width)).alias("__seg")
    )
    return base.select("__id", gen)


def frequent_segments(
    df: DataFrame,
    width: int = 3,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-frequency table of document segments: (segment, n_docs)
    for every non-overlapping ``width``-token segment appearing in at
    least ``min_docs`` DISTINCT documents.

    Distinct-doc counting (not raw occurrence counting) is the robust
    form: a segment repeated many times inside ONE document is
    repetition (a quality gate's business, see
    ``text_analysis.repetition_features``), while a segment shared
    ACROSS documents is boilerplate. Work is one explode + a
    (segment, doc) distinct + a map-side-combinable count — all hash
    shuffles on the segment, no joins, no n² anywhere."""
    segs = _exploded_segments(df, width, text_col, id_col, with_pos=False)
    return (
        segs.distinct()
        .groupBy("__seg")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= F.lit(min_docs))
        .select(F.col("__seg").alias("segment"), "n_docs")
    )


def remove_frequent_segments(
    df: DataFrame,
    width: int = 3,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Boilerplate removal by corpus-level segment dedup (the CCNet
    line-dedup shape: drop every line whose hash recurs across the
    corpus, here over fixed ``width``-token segments because the test
    corpus has no newlines — pass a different segmentation upstream
    for real line-structured text).

    Returns one row per input document that has at least one token:
    (id, n_segments, n_dropped, cleaned) where ``cleaned`` is the
    document text with every segment that occurs in >= ``min_docs``
    distinct documents removed and the survivors re-joined in original
    order. Docs whose text is NULL or empty produce no segments and
    hence no row (same convention as ``minhash_signatures``).

    Scale shape: segment stats from :func:`frequent_segments` (hash
    shuffles only); the mark step joins exploded segments to the
    frequent set on the segment string — the frequent set is the
    heavy-hitter tail so it is NOT broadcast; AQE picks the strategy.
    Reassembly is one groupBy(doc) with a bounded per-doc payload
    (the document's own segments), so per-task memory is bounded by
    the largest single document, never the corpus."""
    freq = frequent_segments(df, width, min_docs, text_col, id_col)
    segs = _exploded_segments(df, width, text_col, id_col, with_pos=True)
    marked = segs.join(
        freq.select(F.col("segment").alias("__seg"), F.lit(True).alias("__hot")),
        "__seg",
        "left",
    ).select(
        "__id",
        "__pos",
        "__seg",
        F.coalesce(F.col("__hot"), F.lit(False)).alias("__drop"),
    )
    return (
        marked.groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(F.col("__drop").cast("long")).alias("n_dropped"),
            F.array_join(
                F.transform(
                    F.filter(
                        F.array_sort(
                            F.collect_list(F.struct("__pos", "__drop", "__seg"))
                        ),
                        lambda s: ~s["__drop"],
                    ),
                    lambda s: s["__seg"],
                ),
                " ",
            ).alias("cleaned"),
        )
        .select(F.col("__id").alias(id_col), "n_segments", "n_dropped", "cleaned")
    )


# --- incremental (batch-vs-corpus) dedup ---------------------------------


class PreparedCorpus:
    """Persisted corpus-side artifacts for the incremental ingest gate:
    distinct content keys, banded signatures and token-hash arrays.
    Build once with :func:`prepare_ingest_corpus` when gating MANY
    batches against the same corpus (the streaming case) — passing a
    raw DataFrame instead recomputes all three derivations per call,
    which means re-scanning and re-hashing the whole corpus every
    micro-batch. Call :meth:`unpersist` when the gate retires."""

    def __init__(
        self,
        keys: DataFrame,
        banded: DataFrame,
        toks: DataFrame,
        n_hashes: int,
        bands: int,
        block_cols: tuple,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        self.keys = keys
        self.banded = banded
        self.toks = toks
        self.n_hashes = n_hashes
        self.bands = bands
        self.block_cols = block_cols
        self.text_col = text_col
        self.id_col = id_col

    def persist(self) -> "PreparedCorpus":
        for df in (self.keys, self.banded, self.toks):
            df.persist()
        return self

    def unpersist(self) -> None:
        for df in (self.keys, self.banded, self.toks):
            df.unpersist()

    def check(
        self,
        n_hashes: int,
        bands: int,
        block_cols: Sequence[str],
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> None:
        got = (self.n_hashes, self.bands, tuple(self.block_cols),
               self.text_col, self.id_col)
        want = (n_hashes, bands, tuple(block_cols), text_col, id_col)
        if got != want:
            raise ValueError(
                "PreparedCorpus built with (n_hashes, bands, block_cols, "
                f"text_col, id_col)={got}, gate called with {want} — "
                "rebuild the artifacts"
            )


def prepare_ingest_corpus(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    block_cols: Sequence[str] = (),
    persist: bool = True,
) -> PreparedCorpus:
    """Derive (and by default persist) the three corpus-side tables the
    ingest gate needs, so repeated gating amortizes ONE corpus pass per
    artifact instead of recomputing signatures every batch."""
    key = _content_key(text_col, normalize=False)
    pc = PreparedCorpus(
        keys=corpus.select(key.alias("__k")).distinct(),
        banded=_banded_signatures(
            corpus, text_col, id_col, n_hashes, bands, block_cols
        ).withColumnRenamed(id_col, "corpus_id"),
        toks=corpus.select(
            F.col(id_col).alias("corpus_id"),
            F.transform(
                distinct_tokens_expr(text_col), lambda t: F.xxhash64(t)
            ).alias("__w_corpus_id"),
        ),
        n_hashes=n_hashes,
        bands=bands,
        block_cols=tuple(block_cols),
        text_col=text_col,
        id_col=id_col,
    )
    return pc.persist() if persist else pc


def incremental_dedup_matches(
    new: DataFrame,
    corpus: "DataFrame | PreparedCorpus",
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    block_cols: Sequence[str] = (),
) -> DataFrame:
    """Verified near-dup matches of an ingest batch against an existing
    corpus: (new_id, corpus_id, jaccard) for every new doc whose exact
    word Jaccard with a corpus doc reaches ``threshold``, candidates
    generated by BIPARTITE MinHash-LSH banding (same deterministic
    banding as :func:`minhash_lsh_candidates`, joined new-vs-corpus
    instead of self).

    This is the production ingest-gate shape for a continuously
    growing corpus: the join shuffles on (band_id, band_hash) buckets
    so candidate count tracks bucket occupancy, never
    |new| x |corpus|, and only candidates pay the exact-verify token
    join. ``corpus`` may be a :class:`PreparedCorpus` (persisted
    signature/token tables — build once per corpus snapshot when
    gating many batches) or a raw DataFrame (derivations built
    inline, recomputed per call)."""
    if not isinstance(corpus, PreparedCorpus):
        # unpersisted artifacts are plain lazy DataFrames — same single
        # source of truth for the derivations, zero extra cost
        corpus = prepare_ingest_corpus(
            corpus, text_col, id_col, n_hashes, bands, block_cols, persist=False
        )
    corpus.check(n_hashes, bands, block_cols, text_col, id_col)
    bc, ctoks = corpus.banded, corpus.toks
    bn = _banded_signatures(new, text_col, id_col, n_hashes, bands, block_cols)
    keys = ["band_id", "band_hash", *block_cols]
    cand = (
        bn.withColumnRenamed(id_col, "new_id")
        .join(bc, keys)
        .select("new_id", "corpus_id")
        .distinct()
    )
    # token IDENTITY is all the verify intersect needs (the keyed
    # convention of dedup_minhash_banded_verified)
    ntoks = new.select(
        F.col(id_col).alias("new_id"),
        F.transform(
            distinct_tokens_expr(text_col), lambda t: F.xxhash64(t)
        ).alias("__w_new_id"),
    )
    return (
        cand.join(ntoks, "new_id")
        .join(ctoks, "corpus_id")
        .withColumn("jaccard", jaccard_expr("__w_new_id", "__w_corpus_id"))
        .filter(F.col("jaccard") >= threshold)
        .select("new_id", "corpus_id", "jaccard")
    )


def incremental_dedup(
    new: DataFrame,
    corpus: "DataFrame | PreparedCorpus",
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    block_cols: Sequence[str] = (),
) -> DataFrame:
    """Admit only the rows of ``new`` that are neither exact nor
    near-duplicates (word Jaccard >= ``threshold``) of any ``corpus``
    row. Returns surviving ``new`` rows with all their columns.
    ``corpus`` may be a :class:`PreparedCorpus` to amortize the
    corpus-side derivations across many batches.

    Two reject sets, unioned, then ONE anti-join: an md5 content-key
    semi-join finds verbatim copies (a ~50 B/row shuffle at 100 TB),
    and the banded near-dup gate of :func:`incremental_dedup_matches`
    finds the rest. The exact gate is deliberately UNBLOCKED: with
    ``block_cols`` set, the near gate only sees same-block candidates,
    so the content-key pass is what still catches a verbatim copy
    whose block metadata differs (same text relabeled to another
    language/source). Both gates read ``new`` directly — chaining them
    (near gate over the exact gate's survivors) replays the exact
    gate's subtree into every consumer, tripling its shuffles, for no
    change in the survivor set (rejects union either way). NULL-text
    rows carry a NULL content key and no signature, so they always
    survive — gate them with a quality filter upstream, not here."""
    key = _content_key(text_col, normalize=False)
    if not isinstance(corpus, PreparedCorpus):
        corpus = prepare_ingest_corpus(
            corpus, text_col, id_col, n_hashes, bands, block_cols, persist=False
        )
    corpus.check(n_hashes, bands, block_cols, text_col, id_col)
    ckeys = corpus.keys
    exact_ids = (
        new.select(F.col(id_col), key.alias("__k"))
        .join(ckeys, "__k", "left_semi")
        .select(id_col)
    )
    near_ids = incremental_dedup_matches(
        new, corpus, threshold, text_col, id_col, n_hashes, bands, block_cols
    ).select(F.col("new_id").alias(id_col))
    rejected = exact_ids.union(near_ids).distinct()
    return new.join(rejected, id_col, "left_anti")


def incremental_components(
    components: DataFrame,
    new_pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Maintain a near-dup component table INCREMENTALLY: merge a
    batch of new pairs into an existing ``(id, component)`` table
    (the output of :func:`connected_components`) without re-clustering
    the corpus. Returns the updated ``(id, component)`` covering every
    existing id plus every id in ``new_pairs`` — EXACTLY equal to
    ``connected_components(old_pairs UNION new_pairs)`` (property
    tests pin the equivalence on random graphs).

    The trick is CONTRACTION: each new-pair endpoint maps through its
    existing label (unknown ids label themselves), so the propagation
    runs on the COMPONENT GRAPH — nodes are component labels + batch
    ids, edges are the new pairs relabeled — which is batch-sized,
    not corpus-sized. Correctness of the min-label convention
    survives contraction because an existing label IS the minimum id
    of its cluster: the minimum over merged clusters equals the
    minimum over their labels and any smaller new id wins in the
    contracted propagation too.

    100 TB shape: the corpus-sized ``components`` table is touched by
    exactly ONE keyed join against the relabel map (tiny — only
    labels the batch actually merged; broadcastable), the two
    label-lookup joins are keyed on batch ids, and the iterative part
    (:func:`connected_components`) runs on the contracted graph. This
    is what makes continuous dedup maintenance affordable: per-batch
    cost tracks the batch, the full recluster never reruns."""
    comp = components.select(
        F.col("id").alias("__cid"), F.col("component").alias("__clab")
    ).localCheckpoint(eager=False)  # consumed by both lookups + anti-join
    pairs = new_pairs.select(F.col(id_a).alias("__a"), F.col(id_b).alias("__b"))
    mapped = (
        pairs.join(
            comp.select(F.col("__cid").alias("__a"), F.col("__clab").alias("__la")),
            "__a",
            "left",
        )
        .join(
            comp.select(F.col("__cid").alias("__b"), F.col("__clab").alias("__lb")),
            "__b",
            "left",
        )
        .select(
            F.coalesce("__la", F.col("__a")).alias("id_a"),
            F.coalesce("__lb", F.col("__b")).alias("id_b"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
    )
    # CC over the contracted graph: (old label | new id) -> merged label
    relabel = connected_components(mapped, max_iter=max_iter).select(
        F.col("id").alias("__old"), F.col("component").alias("__new")
    ).localCheckpoint(eager=False)  # consumed by the update join + new-row join
    updated = (
        components.join(
            F.broadcast(relabel), components["component"] == F.col("__old"), "left"
        )
        .select(
            "id", F.coalesce("__new", F.col("component")).alias("component")
        )
    )
    batch_ids = (
        pairs.select(F.col("__a").alias("id"))
        .unionByName(pairs.select(F.col("__b").alias("id")))
        .distinct()
        .join(comp.select(F.col("__cid").alias("id")), "id", "left_anti")
    )
    new_rows = (
        batch_ids.join(
            F.broadcast(relabel), batch_ids["id"] == F.col("__old"), "left"
        )
        .select("id", F.coalesce("__new", F.col("id")).alias("component"))
    )
    return updated.unionByName(new_rows)


def remove_duplicated_spans(
    df: DataFrame,
    span_tokens: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-substring dedup, the Lee et al. 2022 ("Deduplicating
    Training Data Makes Language Models Better") shape adapted to
    relational execution: any token whose position is covered by a
    ``span_tokens``-token window appearing verbatim in at least
    ``min_docs`` DISTINCT documents is removed from EVERY occurrence
    (the paper's ExactSubstr policy — symmetric and deterministic; a
    keep-one-copy policy is a pair-generator-plus-representatives
    composition, not this operator). Any duplicated run of >=
    ``span_tokens`` tokens necessarily contains a duplicated window,
    so whole duplicated passages are scrubbed end-to-end; unlike
    :func:`remove_frequent_segments` (fixed non-overlapping windows,
    the line-dedup analog), the windows here OVERLAP (stride 1), so
    detection is alignment-free.

    Fully relational — no per-row quadratic scan and no suffix array:
    overlapping window hashes (one Generate, len rows per doc), hot
    windows by distinct-doc count (hash shuffles, map-combinable),
    covered POSITIONS as hits x span offsets (bounded fan-out,
    distinct), one (id, pos) join against the exploded tokens, and a
    per-doc reassembly groupBy whose payload is the document's own
    tokens. Returns (id, n_tokens, n_removed, cleaned); docs with no
    tokens produce no row (the ``minhash_signatures`` convention)."""
    if span_tokens < 2:
        raise ValueError(f"span_tokens must be >= 2, got {span_tokens}")
    base = df.select(F.col(id_col).alias("__id"), tokens_expr(text_col).alias("__w"))
    eg = base.select(
        "__id", F.posexplode(word_ngrams_expr(F.col("__w"), span_tokens)).alias(
            "__s0", "__g"
        )
    ).select("__id", (F.col("__s0") + 1).alias("__s"), F.xxhash64("__g").alias("__h"))
    # round-11: hot / cov / hit_ids are each consumed by two branches
    # below, and Catalyst re-expands shared subtrees per consumer —
    # unpinned, this operator ran the window-hash explode and the hot
    # aggregation up to 4x (8 parquet scans in the round-11 plan
    # audit). Lazy localCheckpoints pin each at its natural size (hot:
    # duplicated-window hashes; cov: hit positions ~ duplicated text
    # volume; hit_ids: hit docs) — all far below the token-position
    # blow-up this operator already refuses to materialize, and all
    # disk-backed. The corpus-sized eg/base streams stay re-scanned.
    hot = (
        eg.select("__h", "__id")
        .distinct()
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__nd"))
        .filter(F.col("__nd") >= F.lit(min_docs))
        .select("__h")
        .localCheckpoint(eager=False)
    )
    cov = (
        eg.join(hot, "__h")
        .select(
            "__id",
            F.explode(
                F.sequence(F.col("__s"), F.col("__s") + F.lit(span_tokens - 1))
            ).alias("__p"),
        )
        .distinct()
        .withColumn("__hit", F.lit(True))
        .localCheckpoint(eager=False)
    )
    # reassemble ONLY hit docs (the tokpos explode + struct collect is
    # the expensive stage, and a mostly-clean corpus hits a few % of
    # docs); untouched docs pass through as one narrow projection —
    # concat_ws(' ', split(text, ' ')) round-trips exactly, including
    # empty tokens from repeated spaces
    hit_ids = cov.select("__id").distinct().localCheckpoint(eager=False)
    touched_base = base.join(hit_ids, "__id", "left_semi")
    tokpos = touched_base.select(
        "__id", F.posexplode("__w").alias("__p0", "__tok")
    ).select("__id", (F.col("__p0") + 1).alias("__p"), "__tok")
    marked = tokpos.join(cov, ["__id", "__p"], "left").select(
        "__id", "__p", "__tok", F.coalesce(F.col("__hit"), F.lit(False)).alias("__rm")
    )
    touched = (
        marked.groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("__rm").cast("long")).alias("n_removed"),
            F.array_join(
                F.transform(
                    F.filter(
                        F.array_sort(F.collect_list(F.struct("__p", "__rm", "__tok"))),
                        lambda s: ~s["__rm"],
                    ),
                    lambda s: s["__tok"],
                ),
                " ",
            ).alias("cleaned"),
        )
    )
    untouched = (
        base.join(hit_ids, "__id", "left_anti")
        .filter(F.col("__w").isNotNull())
        .select(
            "__id",
            F.size("__w").cast("long").alias("n_tokens"),
            F.lit(0).cast("long").alias("n_removed"),
            F.concat_ws(" ", F.col("__w")).alias("cleaned"),
        )
    )
    return touched.unionByName(untouched).select(
        F.col("__id").alias(id_col), "n_tokens", "n_removed", "cleaned"
    )


def remove_repeated_windows(
    df: DataFrame,
    width: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """INTRA-document repetition removal (the RefinedWeb/MassiveText
    "remove duplicated lines within a page" stage, generalized to
    fixed token windows because this corpus has no newlines — same
    segmentation as :func:`remove_frequent_segments`, which handles
    the CROSS-document boilerplate case): keep the first occurrence
    of each distinct ``width``-token segment within a document, drop
    later repeats, reassemble the survivors in order.

    Returns (id_col, n_windows, n_kept, cleaned); docs with NULL or
    empty text have no segments and thus no row (the
    ``minhash_signatures`` convention).

    Scale shape: both exchanges are keyed by document (the
    first-occurrence rank on (doc, segment), the reassembly on doc),
    so per-task state is bounded by a document's own length — no
    corpus-wide structure anywhere. Cross-doc state is zero: this
    composes with any other dedup stage without ordering concerns."""
    segs = _exploded_segments(df, width, text_col, id_col, with_pos=True)
    w = Window.partitionBy("__id", "__seg").orderBy("__pos")
    marked = segs.withColumn("__rn", F.row_number().over(w))
    return (
        marked.groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum((F.col("__rn") == 1).cast("long")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.filter(
                        F.array_sort(F.collect_list(F.struct("__pos", "__rn", "__seg"))),
                        lambda s: s["__rn"] == 1,
                    ),
                    lambda s: s["__seg"],
                ),
                " ",
            ).alias("cleaned"),
        )
        .select(F.col("__id").alias(id_col), "n_windows", "n_kept", "cleaned")
    )
