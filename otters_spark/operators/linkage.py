"""Record linkage: fuzzy joins between two tables on text similarity.

The shape a curation pipeline needs when matching noisy references
against a canonical table (entity resolution, probe-vs-corpus lookup):
for every left row, the single best right-side match above a
similarity threshold.

Differs from the dedup pair generators (``operators.dedup``) in two
ways: the join is BIPARTITE (left table vs right table, no ``id_a <
id_b`` canonicalization), and the terminal is best-match-per-left-row
(an argmax window), not an unordered pair set.

Scale design: candidates come from a shared word-n-gram inverted
index — a pair is a candidate iff it shares at least one n-gram, which
is *exact* for any Jaccard threshold > 0 (a pair sharing no n-gram has
similarity 0). Work is Σ_g df_left(g)·df_right(g) spread over a hash
shuffle on the n-gram; n-grams are far more selective blocking keys
than single tokens (vocabulary^n key space), and AQE skew-splitting
handles residual hot grams. The final argmax is a per-left-id window
whose partition size is that row's candidate count — bounded, never
corpus-wide.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..functions.scan import spread_small_scan
from ..functions.text import tokens_expr, word_ngrams_expr

__all__ = ["fuzzy_join_candidates", "fuzzy_best_match",
    "entity_clusters",
    "golden_records",
]


def _shingle_side(
    df: DataFrame, text_col: str, id_col: str, ngram: int, out_id: str
) -> DataFrame:
    """Exploded distinct n-gram hashes per doc, each row carrying the
    doc's distinct-shingle set size: (id, set_size, gram_hash).

    One scan, one Generate. The set size rides through the explode as
    a per-DOC column, which kills the separate sizes branch a naive
    plan needs (second scan + join + a pushed ``isnotnull`` filter
    with the tokenizer re-inlined per element — the Generate-filter
    trap, see ``dedup.tfidf_cosine_pairs``). Projection placement is
    load-bearing: the size must be computed in its own select BELOW
    the explode-select — computing it beside the explode lands it in
    the post-Generate projection, where the whole n-gram construction
    re-evaluates per EXPLODED row (measured 6x on this query). The
    gram crosses the shuffle as one xxhash64 long instead of the gram
    bytes (the keyed convention of ``dedup.jaccard_pairs_exploded``)."""
    base = spread_small_scan(df).select(
        F.col(id_col).alias(out_id), tokens_expr(text_col).alias("__w")
    )  # round 11: widen before tokenize (guide §2.5)
    grams = F.array_distinct(word_ngrams_expr(F.col("__w"), ngram))
    sized = base.select(
        out_id, F.size(grams).alias(f"__n_{out_id}"), F.col("__w")
    )
    return sized.select(
        out_id, f"__n_{out_id}", F.explode(grams).alias("__gs")
    ).select(out_id, f"__n_{out_id}", F.xxhash64("__gs").alias("__gh"))


def fuzzy_join_candidates(
    left: DataFrame,
    right: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
) -> DataFrame:
    """All (left_id, right_id, score) pairs with word-``ngram`` shingle
    Jaccard >= threshold. Exact for threshold > 0: candidate
    generation via the shared-shingle inverted index misses only
    zero-similarity pairs."""
    if threshold <= 0:
        raise ValueError("threshold must be > 0 (0 would imply a cross join)")
    le = _shingle_side(left, text_col, id_col, ngram, "left_id")
    re_ = _shingle_side(right, text_col, id_col, ngram, "right_id")
    # set sizes are constant per id, so first() recovers them after the
    # co-occurrence count — no sizes join anywhere in the plan
    return (
        le.join(re_, "__gh")
        .groupBy("left_id", "right_id")
        .agg(
            F.count(F.lit(1)).alias("__c"),
            F.first("__n_left_id").alias("__nl"),
            F.first("__n_right_id").alias("__nr"),
        )
        .withColumn(
            "score",
            F.col("__c").cast("double")
            / (F.col("__nl") + F.col("__nr") - F.col("__c")),
        )
        .filter(F.col("score") >= threshold)
        .select("left_id", "right_id", "score")
    )


def fuzzy_best_match(
    left: DataFrame,
    right: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
) -> DataFrame:
    """Best-match fuzzy join: for each left row, the single right row
    with the highest word-``ngram`` Jaccard similarity, provided it
    reaches ``threshold``. Ties break on the smaller right id so the
    result is deterministic cross-engine. Left rows with no match
    above threshold are absent (inner-join semantics; outer behavior
    is a caller-side join-back)."""
    cands = fuzzy_join_candidates(left, right, threshold, text_col, id_col, ngram)
    w = Window.partitionBy("left_id").orderBy(F.desc("score"), F.asc("right_id"))
    return (
        cands.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select("left_id", "right_id", "score")
    )


def entity_clusters(
    records: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    method: str = "exact",
    n_hashes: int = 16,
    bands: int = 8,
    block_cols: Sequence[str] = (),
    est_margin: float | None = None,
) -> DataFrame:
    """End-to-end entity resolution: fuzzy self-candidates →
    transitive closure → entity table. Every record gets an
    ``entity_id`` (the smallest record id reachable through chains of
    Jaccard-above-threshold matches; unmatched records are their own
    entity) — the master-data step after :func:`fuzzy_best_match`'s
    pairwise links, where A~B and B~C must land A, B, C in ONE entity
    even when A~C alone misses the threshold.

    Two candidate generators (``method``):

    * ``"exact"`` — shingle inverted-index candidates (exact for
      threshold > 0, never all-pairs). Cost is sum over shingles of
      df² — fine on de-duplicated corpora, QUADRATIC in duplicate
      density (measured 22.6x wall on the 10x near-dup-clique scale
      probe: every shingle's df grows 10x, so df² grows 100x).
    * ``"banded"`` — MinHash LSH banding
      (dedup.minhash_lsh_candidates: shuffle on band buckets, pair
      count tracks bucket occupancy) followed by EXACT n-gram-Jaccard
      verification of the candidates, so false positives are
      impossible; recall is the banding S-curve (1-(1-j^r)^b). This is
      the dup-dense / 100 TB path — WITH ``block_cols``: the default
      8x2 banding keeps recall high at >= 0.7 thresholds but its est
      threshold is ~0.35, so on vocabulary-saturated corpora the
      unblocked candidate set approaches all-pairs (measured: 11M
      candidates from 5k sf0.1 docs, 110 s end-to-end; blocked on
      (lang, source) like production dedup: 7 s). ``est_margin``
      optionally pre-filters candidates by signature-estimated Jaccard
      >= threshold - margin (a 16-long intersect instead of the full
      shingle intersect per pair) — useful when collisions are mostly
      far-below-threshold noise; useless when the corpus genuinely has
      similarity mass within ~2 estimator sigmas (sqrt(j(1-j)/16)
      ~= 0.1) of the threshold, which is why it defaults off.

    Both feed dedup.connected_components min-label propagation (one
    hash-join per round, rounds = cluster diameter)."""
    from ..functions.text import jaccard_expr, tokens_expr, word_ngrams_expr
    from .dedup import connected_components

    if est_margin is not None and not (0.0 <= est_margin <= 1.0):
        # a negative margin makes the estimate cutoff unsatisfiable
        # (est is bounded by 1.0) — every record would silently come
        # back a singleton entity
        raise ValueError(f"est_margin must be in [0, 1], got {est_margin!r}")
    if method == "exact" and (block_cols or est_margin is not None):
        # these knobs only exist on the banded path; silently dropping
        # them would run the unblocked quadratic shingle generator the
        # caller was specifically steering away from
        raise ValueError(
            "block_cols/est_margin require method='banded' — the exact "
            "shingle inverted-index path has no banding to block or "
            "signatures to pre-filter"
        )
    if method == "exact":
        pairs = fuzzy_join_candidates(
            records, records, threshold, text_col, id_col, ngram
        ).filter(F.col("left_id") < F.col("right_id")).select(
            F.col("left_id").alias("id_a"), F.col("right_id").alias("id_b")
        )
    elif method == "banded":
        from ..functions.text import est_jaccard_from_sigs_expr
        from .dedup import minhash_lsh_candidates, minhash_signatures

        sigs = None
        if est_margin is not None:
            # the pre-filter reuses these signatures; pin them once so
            # the corpus signature scan doesn't run twice (banding +
            # estimate join)
            sigs = minhash_signatures(
                records, text_col, id_col, n_hashes, keep_cols=list(block_cols)
            ).localCheckpoint(eager=False)
        cand = minhash_lsh_candidates(
            records,
            text_col,
            id_col,
            n_hashes=n_hashes,
            bands=bands,
            block_cols=list(block_cols),
            signatures=sigs,
        )
        if est_margin is not None:
            # optional signature-estimate PRE-FILTER before the exact
            # shingle verify (see docstring for when it pays)
            sa = sigs.select(
                F.col(id_col).alias("id_a"), F.col("signature").alias("__sa")
            )
            sb = sigs.select(
                F.col(id_col).alias("id_b"), F.col("signature").alias("__sb")
            )
            cand = (
                cand.join(sa, "id_a")
                .join(sb, "id_b")
                .filter(
                    est_jaccard_from_sigs_expr("__sa", "__sb")
                    >= F.lit(max(threshold - est_margin, 0.0))
                )
                .select("id_a", "id_b")
            )
        shing = spread_small_scan(records).select(
            F.col(id_col).alias("__id"),
            F.transform(
                F.array_distinct(
                    word_ngrams_expr(tokens_expr(text_col), ngram)
                ),
                lambda g: F.xxhash64(g),
            ).alias("__g"),
        )
        a = shing.select(F.col("__id").alias("id_a"), F.col("__g").alias("__ga"))
        b = shing.select(F.col("__id").alias("id_b"), F.col("__g").alias("__gb"))
        pairs = (
            cand.join(a, "id_a")
            .join(b, "id_b")
            .filter(jaccard_expr("__ga", "__gb") >= threshold)
            .select("id_a", "id_b")
        )
    else:
        raise ValueError(f"method must be 'exact' or 'banded', got {method!r}")
    cc = connected_components(pairs)
    ids = records.select(F.col(id_col).alias("id"))
    return ids.join(cc, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("entity_id")
    )


def golden_records(
    records: DataFrame,
    entities: DataFrame,
    rules: dict[str, str],
    id_col: str = "doc_id",
    entity_col: str = "entity_id",
    ts_col: str | None = None,
) -> DataFrame:
    """Survivorship: collapse each resolved entity to ONE golden
    record — the master-data step after :func:`entity_clusters`.
    ``rules`` maps column → survivorship rule:

    * ``"most_frequent"`` — the modal value (consensus fields:
      language, country, category);
    * ``"longest"`` — the longest string (richest free-text variant);
    * ``"latest"`` / ``"earliest"`` — by ``ts_col`` (freshest
      contact info / first-seen provenance);
    * ``"max"`` / ``"min"`` — numeric extremes;
    * ``"first_non_null"`` — the value from the smallest record id
      that has one (stable source-priority stand-in).

    Every rule carries a DETERMINISTIC total tie-break (documented per
    expression below) so golden records are replay-stable and
    cross-engine checkable — survivorship that flaps between runs
    poisons every downstream diff.

    Plan shape: one key join records→entities, then ONE
    entity-keyed aggregate for all order-based rules (max_by/min_by
    over tie-broken structs — partial-aggregable, constant state per
    group). Each ``most_frequent`` column needs its own
    (entity, value) count first — mode is not algebraic — joined back
    by entity; those joins are entity-table-sized, not corpus-sized.
    ``n_members`` is always included.

    The reference engine has no multi-record consolidation surface
    (``/root/reference/src/meta.rs``); extension lane for the linkage
    family, oracle-checked against the same arg_min/arg_max algebra
    in DuckDB."""
    allowed = {
        "most_frequent",
        "longest",
        "latest",
        "earliest",
        "max",
        "min",
        "first_non_null",
    }
    for c, r in rules.items():
        if r not in allowed:
            raise ValueError(f"unknown rule {r!r} for column {c!r}")
        if c not in records.columns:
            raise ValueError(f"rule column {c!r} not in records")
        if r in ("latest", "earliest") and ts_col is None:
            raise ValueError(f"rule {r!r} for {c!r} needs ts_col")
    # dedupe: if the id column itself carries a survivorship rule, a
    # duplicate entry here would make the select() emit the column
    # twice and the downstream join/agg fail with ambiguous-reference
    needed = list(dict.fromkeys([id_col, *rules]))
    if ts_col is not None and ts_col not in needed:
        needed.append(ts_col)
    joined = records.select(*needed).join(
        entities.select(
            F.col("id").alias(id_col), F.col(entity_col)
        ),
        id_col,
    )
    freq_rules = [c for c, r in rules.items() if r == "most_frequent"]
    if freq_rules:
        # the join feeds the main aggregate PLUS one mode count per
        # most_frequent column; checkpoint the (column-pruned) join
        # once so the records→entities lineage doesn't re-run per
        # consumer
        joined = joined.localCheckpoint(eager=False)
    aggs = [F.count(F.lit(1)).alias("n_members")]
    freq_cols = []
    for c, r in rules.items():
        if r == "most_frequent":
            freq_cols.append(c)
        elif r == "longest":
            # longest value, then smallest lexicographically: exact
            # inverse ordering via min_by on (-len, value)
            aggs.append(
                F.expr(
                    f"min_by({c}, struct(-length({c}), {c})) "
                    f"FILTER (WHERE {c} IS NOT NULL)"
                ).alias(c)
            )
        elif r == "latest":
            aggs.append(
                F.expr(
                    f"max_by({c}, struct({ts_col}, {id_col})) "
                    f"FILTER (WHERE {c} IS NOT NULL AND {ts_col} IS NOT NULL)"
                ).alias(c)
            )
        elif r == "earliest":
            aggs.append(
                F.expr(
                    f"min_by({c}, struct({ts_col}, {id_col})) "
                    f"FILTER (WHERE {c} IS NOT NULL AND {ts_col} IS NOT NULL)"
                ).alias(c)
            )
        elif r == "max":
            aggs.append(F.max(c).alias(c))
        elif r == "min":
            aggs.append(F.min(c).alias(c))
        elif r == "first_non_null":
            aggs.append(
                F.expr(
                    f"min_by({c}, {id_col}) FILTER (WHERE {c} IS NOT NULL)"
                ).alias(c)
            )
    out = joined.groupBy(entity_col).agg(*aggs)
    for c in freq_cols:
        counts = (
            joined.filter(F.col(c).isNotNull())
            .groupBy(entity_col, c)
            .agg(F.count(F.lit(1)).alias("__n"))
        )
        # highest count, then smallest value: min_by on (-count, value)
        mode = counts.groupBy(entity_col).agg(
            F.expr(f"min_by({c}, struct(-__n, {c}))").alias(c)
        )
        out = out.join(mode, entity_col, "left")
    return out.select(entity_col, "n_members", *list(rules))
