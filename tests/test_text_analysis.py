"""Text-analysis operator semantics on crafted strings."""

import pytest

from otters_spark.operators.text_analysis import (
    langid_table,
    quality_features,
    token_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "el gato y la casa de los perros"),
        (2, "xyzzy plugh qwerty"),
        (3, "aa bb aa bb aa bb"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_token_stats(docs):
    rows = {r["doc_id"]: r for r in token_stats(docs).collect()}
    assert rows[0]["n_tokens"] == 6
    assert rows[0]["n_distinct_tokens"] == 5  # 'the' twice
    assert rows[3]["n_tokens"] == 6 and rows[3]["n_distinct_tokens"] == 2
    # 'the cat sat on the mat': 3+3+3+2+3+3 = 17/6
    assert abs(rows[0]["avg_token_len"] - round(17 / 6, 6)) < 1e-9


def test_quality_features(docs):
    rows = {r["doc_id"]: r for r in quality_features(docs).collect()}
    assert rows[3]["type_token_ratio"] == round(2 / 6, 6)
    assert rows[2]["stopword_ratio"] == 0.0
    for r in rows.values():
        assert 0.0 <= r["quality_score"] <= 1.0
    # doc 0 has stopwords ('the','on') -> higher quality than doc 2
    assert rows[0]["quality_score"] > rows[2]["quality_score"]


def test_langid(docs):
    rows = {r["doc_id"]: r["detected_lang"] for r in langid_table(docs).collect()}
    assert rows[0] == "en"
    assert rows[1] == "es"
    assert rows[2] == "und"


def test_vocab_coverage(spark):
    from otters_spark.operators.text_analysis import vocab_coverage

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a a a"), (3, "x y")], ["doc_id", "text"]
    )
    vocab = spark.createDataFrame([("a",), ("b",), ("y",)], ["token"])
    got = {r["doc_id"]: r for r in vocab_coverage(docs, vocab).collect()}
    assert (got[1]["n_tokens"], got[1]["n_oov"]) == (4, 2)  # c, d oov
    assert got[1]["oov_rate"] == 0.5
    assert (got[2]["n_tokens"], got[2]["n_oov"]) == (1, 0)  # distinct tokens
    assert got[3]["oov_rate"] == 0.5


def test_repetition_features(spark):
    from otters_spark.operators.text_analysis import repetition_features

    rows = [
        (0, "a b a b a b a b"),        # one dominant bigram, heavy dup
        (1, "u v w x y z"),            # all unique
        (2, "solo"),                   # no bigrams
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in repetition_features(df).collect()}

    # doc 0: 8 tokens, 2 distinct -> dup_token_frac = 6/8; bigrams =
    # ['a b'x4, 'b a'x3] -> top = 4/7, dup = (7-2)/7
    assert out[0]["dup_token_frac"] == round(6 / 8, 6)
    assert out[0]["top_bigram_frac"] == round(4 / 7, 6)
    assert out[0]["dup_bigram_frac"] == round(5 / 7, 6)
    assert out[0]["keep"] is False

    # doc 1: no repetition anywhere; top bigram frac = 1/5 (all equally
    # common) so only the dup fractions are zero
    assert out[1]["dup_token_frac"] == 0.0
    assert out[1]["dup_bigram_frac"] == 0.0
    assert out[1]["top_bigram_frac"] == 0.2

    # doc 2: single token -> no bigrams, all fractions 0, kept
    assert out[2]["n_tokens"] == 1
    assert out[2]["top_bigram_frac"] == 0.0
    assert out[2]["keep"] is True


def test_chunk_passages(spark):
    from otters_spark.operators.text_analysis import chunk_passages

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(12))), (2, "a b c")],
        ["doc_id", "text"],
    )
    rows = chunk_passages(df, chunk_tokens=5, overlap=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: starts 1,4,7,10 (start 13 would add <= overlap new tokens)
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [r["passage"] for r in c1] == [
        "t0 t1 t2 t3 t4", "t3 t4 t5 t6 t7", "t6 t7 t8 t9 t10", "t9 t10 t11",
    ]
    assert [r["n_chunk_tokens"] for r in c1] == [5, 5, 5, 3]
    # every token appears in some chunk; consecutive chunks overlap by 2
    assert by_doc[2][0]["passage"] == "a b c"


def test_chunk_passages_validates(spark):
    import pytest

    from otters_spark.operators.text_analysis import chunk_passages

    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_passages(df, chunk_tokens=5, overlap=5)


def test_tfidf_keywords_hand_computed(spark):
    import math

    from otters_spark.operators.text_analysis import tfidf_keywords

    df = spark.createDataFrame(
        [(0, "a a b"), (1, "a c"), (2, "a b")], ["doc_id", "text"]
    )
    out = {
        (r.doc_id, r.rank): (r.term, r.score)
        for r in tfidf_keywords(df, top_n=2).collect()
    }
    # N=3; df: a=3 (idf ln(4/4)=0), b=2 (ln(4/3)), c=1 (ln(4/2))
    assert out[(0, 1)][0] == "b"
    assert out[(0, 1)][1] == pytest.approx(math.log(4 / 3), abs=1e-6)
    assert out[(0, 2)] == ("a", 0.0)  # idf 0 still ranks by (score, term)
    assert out[(1, 1)][0] == "c"
    assert out[(1, 1)][1] == pytest.approx(math.log(2.0), abs=1e-6)
    # every doc emits at most top_n rows
    assert max(r for (_, r) in out) <= 2


def test_unigram_logprob(spark):
    import math

    from otters_spark.operators.text_analysis import unigram_logprob

    # corpus: 'a' x6, 'b' x2 -> p(a)=0.75, p(b)=0.25
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "a a a b")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    expect = -(3 * math.log(0.75) + math.log(0.25)) / 4
    for i in (1, 2):
        assert rows[i]["n_tokens"] == 4
        assert abs(rows[i]["avg_neg_logprob"] - round(expect, 6)) < 1e-9


def test_bm25_ranks_term_dense_docs_first(spark):
    import math

    rows = [
        (0, "apple apple apple pear"),       # high tf, short
        (1, "apple pear plum quince fig"),   # tf 1, longer
        (2, "plum quince fig date cherry"),  # no match
        (3, "apple " * 2 + "x " * 40),       # tf 2 but long doc
    ]
    df = spark.createDataFrame([(i, t.strip()) for i, t in rows], ["doc_id", "text"])
    from otters_spark.operators.text_analysis import bm25_topk

    got = bm25_topk(df, ["apple"], k=10).collect()
    ids = [r["doc_id"] for r in got]
    assert 2 not in ids  # non-matching doc excluded
    assert ids[0] == 0  # densest short doc wins
    # hand-check doc 0's score: N=4, df=3, dl=4, avgdl computed over all
    dls = [4, 5, 5, 42]
    avgdl = sum(dls) / 4
    idf = math.log(1 + (4 - 3 + 0.5) / (3 + 0.5))
    tf = 3.0
    want = idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * 4 / avgdl))
    assert abs(got[0]["score"] - want) < 1e-9


def test_bm25_rejects_empty_query(spark):
    import pytest as _pytest

    from otters_spark.operators.text_analysis import bm25_topk

    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with _pytest.raises(ValueError):
        bm25_topk(df, [])


def test_bigram_logprob_vs_python_reference(spark):
    import math
    from collections import Counter
    from pyspark.sql import Row
    from otters_spark.operators.text_analysis import bigram_logprob

    texts = {
        0: "a b a b c",
        1: "a b c d",
        2: "d d d d d d",
        3: "x",            # single token: no bigrams -> no row
    }
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in texts.items()], "doc_id long, text string"
    )
    k = 0.5
    bg = Counter()
    for t in texts.values():
        w = t.split(" ")
        bg.update(zip(w[:-1], w[1:]))
    ctx = Counter()
    for (p, _), n in bg.items():
        ctx[p] += n
    vocab = {w for t in texts.values() for w in t.split(" ")}
    V = len(vocab)

    def ref(t):
        w = t.split(" ")
        ps = [
            math.log((bg[(p, c)] + k) / (ctx[p] + k * V))
            for p, c in zip(w[:-1], w[1:])
        ]
        return len(ps), round(-sum(ps) / len(ps), 6)

    got = {r.doc_id: (r.n_bigrams, r.avg_neg_logprob) for r in bigram_logprob(df, k).collect()}
    assert set(got) == {0, 1, 2}
    for i in (0, 1, 2):
        n, v = ref(texts[i])
        assert got[i][0] == n
        assert got[i][1] == pytest.approx(v, abs=2e-6)
    # repetitive word salad ("d d d ...") must score LOW surprise under
    # the bigram model only if the corpus supports it -- here (d,d)
    # dominates its own context, so doc 2 is the least surprising
    assert got[2][1] == min(v for _, v in got.values())


def test_train_bpe_merges_vs_python_reference(spark):
    from collections import Counter
    from pyspark.sql import Row
    from otters_spark.operators.text_analysis import train_bpe_merges

    texts = ["low low low lower lowest", "new newer newest low", "wider wide new"]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)], "doc_id long, text string"
    )

    wc = Counter(w for t in texts for w in t.split(" "))
    syms = {w: list(w) for w in wc}
    want = []
    for rank in range(8):
        pc = Counter()
        for w, c in wc.items():
            s = syms[w]
            for a, b in zip(s[:-1], s[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((rank, a, b, c))
        for w, s in syms.items():
            out = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms[w] = out

    got = train_bpe_merges(df, n_merges=8)
    assert got == want

    # exhaustion: single-char vocabulary runs dry before n_merges
    tiny = spark.createDataFrame([Row(doc_id=0, text="a b a")], "doc_id long, text string")
    m = train_bpe_merges(tiny, n_merges=5)
    assert m == []

    with pytest.raises(ValueError):
        train_bpe_merges(df, n_merges=0)


def test_apply_bpe_merges_roundtrip(spark):
    from pyspark.sql import Row
    from otters_spark.operators.text_analysis import apply_bpe_merges, train_bpe_merges

    texts = ["low low low lower lowest", "new newer newest low", "wider wide new"]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = train_bpe_merges(df, n_merges=6)
    out = {r.doc_id: r.bpe_tokens for r in apply_bpe_merges(df, merges).collect()}

    # fixpoint property: after full application no adjacent symbol
    # pair may still match a learned rule (the encoder loops until no
    # rule applies)
    merged_pairs = {(m[1], m[2]) for m in merges}
    for toks in out.values():
        for a, b in zip(toks[:-1], toks[1:]):
            assert (a, b) not in merged_pairs
    # concatenation is lossless: joining symbols rebuilds each word
    for i, t in enumerate(texts):
        assert "".join(out[i]) == t.replace(" ", "")
    # NULL text passes through as NULL tokens
    nul = spark.createDataFrame([Row(doc_id=9, text=None)], "doc_id long, text string")
    assert apply_bpe_merges(nul, merges).collect()[0].bpe_tokens is None


def test_compression_ratio_exact_vs_zlib(spark, sf_dir):
    import zlib

    from otters_spark.operators.text_analysis import compression_ratio

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    got = {r["doc_id"]: (r["raw_len"], r["comp_len"], r["ratio"])
           for r in compression_ratio(docs).collect()}
    for r in docs.select("doc_id", "text").collect():
        b = r["text"].encode("utf-8")
        c = len(zlib.compress(b, 6))
        exp = (len(b), c, c / len(b) if b else None)
        assert got[r["doc_id"]] == exp
    # natural prose lands in a sane band — the gate thresholds make sense
    ratios = [v[2] for v in got.values() if v[2] is not None]
    assert all(0.2 < x < 1.2 for x in ratios)


def test_compression_ratio_edges(spark):
    import pytest as _pytest

    from otters_spark.operators.text_analysis import compression_ratio

    df = spark.createDataFrame(
        [(1, "ab" * 500), (2, ""), (3, None)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    assert rows[1]["ratio"] < 0.1          # pure repetition compresses away
    assert rows[2]["raw_len"] == 0 and rows[2]["ratio"] is None
    assert rows[3]["raw_len"] is None and rows[3]["ratio"] is None
    with _pytest.raises(ValueError):
        compression_ratio(df, level=11)


def test_pmi_pairs_matches_python_reference(spark):
    import math
    from collections import Counter

    from otters_spark.operators.text_analysis import pmi_pairs

    texts = [
        "new york is a big city",
        "new york has a big port",
        "the big city of new york",
        "a city by the sea",
        "the sea and the city",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    window = 2
    pair_counts, tok_counts = Counter(), Counter()
    for t in texts:
        toks = t.split(" ")
        tok_counts.update(toks)
        for i, a in enumerate(toks):
            for j in range(i + 1, min(i + window + 1, len(toks))):
                pair_counts[tuple(sorted((a, toks[j])))] += 1
    n_tok, n_pair = sum(tok_counts.values()), sum(pair_counts.values())
    expected = {
        p: (
            c,
            math.log(
                (c / n_pair)
                / ((tok_counts[p[0]] / n_tok) * (tok_counts[p[1]] / n_tok))
            ),
        )
        for p, c in pair_counts.items()
        if c >= 2
    }
    got = {
        (r["a"], r["b"]): (r["n_ab"], r["pmi"])
        for r in pmi_pairs(df, window=window, min_count=2).collect()
    }
    assert set(got) == set(expected)
    for p, (c, v) in expected.items():
        assert got[p][0] == c
        assert abs(got[p][1] - v) < 1e-9
    # the real collocation outscores a chance co-occurrence pair
    assert got[("new", "york")][0] == 3
    assert got[("new", "york")][1] > got[("big", "city")][1] > 0


def test_pmi_pairs_edges(spark):
    import pytest as _pytest

    from otters_spark.operators.text_analysis import pmi_pairs

    # single-token and empty docs produce no pairs but still count tokens
    df = spark.createDataFrame(
        [(1, "one"), (2, ""), (3, "a b a b a b")], "doc_id long, text string"
    )
    rows = pmi_pairs(df, window=3, min_count=1).collect()
    assert all(r["a"] <= r["b"] for r in rows)  # canonical unordered pairs
    assert {(r["a"], r["b"]) for r in rows} == {("a", "b"), ("a", "a"), ("b", "b")}
    with _pytest.raises(ValueError):
        pmi_pairs(df, window=0)


def test_ngram_novelty_hand_computed(spark):
    from otters_spark.operators.text_analysis import ngram_novelty

    docs = spark.createDataFrame(
        [
            # docs 1 and 2 share their only 3-gram -> novelty 0
            (1, "a b c"),
            (2, "a b c"),
            # doc 3: 2 distinct 3-grams, both unique -> novelty 1
            (3, "x y z w"),
            # doc 4: one shared gram (a b c), one unique -> 0.5
            (4, "a b c q"),
            # doc 5: too short for a 3-gram -> no row
            (5, "p q"),
            # repeated gram inside one doc counts once (distinct)
            (6, "m n o m n o m n o"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_novelty(docs, n=3).collect()}
    assert set(out) == {1, 2, 3, 4, 6}
    assert out[1]["novelty"] == 0.0 and out[2]["novelty"] == 0.0
    assert out[3]["n_ngrams"] == 2 and out[3]["novelty"] == 1.0
    assert out[4]["n_ngrams"] == 2 and out[4]["n_novel"] == 1
    assert out[4]["novelty"] == 0.5
    # doc 6: grams {m n o, n o m, o m n} each seen 3x in-doc but
    # deduped per doc -> df 1 each -> fully novel
    assert out[6]["n_ngrams"] == 3 and out[6]["novelty"] == 1.0
    with pytest.raises(ValueError, match=">= 1"):
        ngram_novelty(docs, n=0)


def test_ngram_novelty_planted_dups_score_low(spark, sf_dir):
    """On the synthetic corpus the planted dup clusters must score
    below the corpus median: their 8-grams recur in their cluster."""
    from otters_spark.operators.text_analysis import ngram_novelty

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = ngram_novelty(docs, n=8).collect()
    by_id = {r["doc_id"]: r["novelty"] for r in out}
    import statistics

    med = statistics.median(by_id.values())
    dup_scores = [v for k, v in by_id.items() if k % 20 == 0]
    assert statistics.median(dup_scores) <= med


def test_canonical_url_rules(spark):
    """Each canonicalization rule pinned: host case/www, scheme drop,
    fragment drop, trailing slash, tracking strip, param sort."""
    from otters_spark.functions.text import canonical_url_expr

    cases = [
        ("https://WWW.Site.com/a/b/?utm_source=x&b=2&a=1#frag",
         "site.com/a/b?a=1&b=2"),
        ("http://site.com/a/b?a=1&b=2", "site.com/a/b?a=1&b=2"),
        ("https://site.com/CaseKept/", "site.com/CaseKept"),
        ("https://site.com/x?gclid=123&fbclid=9&ref=z&mc_cid=1&mc_eid=2",
         "site.com/x"),
        ("https://site.com/x#only-fragment", "site.com/x"),
        ("https://www.site.com/x?z=1&y=2&utm_campaign=c",
         "site.com/x?y=2&z=1"),
        (None, None),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [
        r["c"]
        for r in df.select(canonical_url_expr("url").alias("c")).collect()
    ]
    assert got == [want for _, want in cases]


def test_bigram_logprob_cross_domain_backoff(spark):
    """train_df separates model from scored corpus: bigrams the
    reference never saw back off to the 1/V floor, so an in-domain
    candidate scores strictly lower cross-entropy than word salad."""
    import math

    from otters_spark.operators.text_analysis import bigram_logprob

    ref = spark.createDataFrame(
        [(100 + i, "the cat sat on the mat") for i in range(3)],
        "doc_id long, text string",
    )
    tgt = spark.createDataFrame(
        [(1, "the cat sat"), (2, "zz qq vv")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["avg_neg_logprob"]
        for r in bigram_logprob(tgt, k=0.5, train_df=ref).collect()
    }
    assert got[1] < got[2]
    # doc 2: every bigram unseen, every context unseen -> exactly
    # -ln(k / (0 + k*V)) = ln(V) per bigram; ref vocab V = 5
    assert got[2] == round(math.log(5.0), 6)
    # doc 1: (the,cat) seen 3x under context 'the' (cp=6: the->cat,
    # the->mat, 3x each); (cat,sat) seen 3x under 'cat' (cp=3); V=5
    want1 = round(-(math.log(3.5 / 8.5) + math.log(3.5 / 5.5)) / 2, 6)
    assert got[1] == want1


def test_vocab_growth_curve_matches_python(spark):
    from otters_spark.operators.text_analysis import vocab_growth

    docs = [
        (0, "a b a"),
        (1, "b c"),
        (2, "c d a"),
        (3, "e"),
        (7, "a e f f"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["bucket"]: (
            r["n_tokens"], r["new_vocab"], r["cum_tokens"], r["cum_vocab"]
        )
        for r in vocab_growth(df, n_buckets=4).collect()
    }
    # ids 0..7 -> bucket = (id-0)*4 DIV 8: 0,0,1,1,3
    # bucket0: docs 0,1 -> 5 tokens, first-seen {a,b,c} = 3
    # bucket1: docs 2,3 -> 4 tokens, first-seen {d,e} = 2
    # bucket3: doc 7 -> 4 tokens, first-seen {f} = 1
    assert got[0] == (5, 3, 5, 3)
    assert got[1] == (4, 2, 9, 5)
    assert got[3] == (4, 1, 13, 6)
    assert 2 not in got  # empty bucket emits no row
    with pytest.raises(ValueError):
        vocab_growth(df, n_buckets=1)
