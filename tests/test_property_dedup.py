"""Property-based differential tests for the dedup kernels: on random
corpora, the scale-shaped formulations (banded SimHash, salted
incidence-matmul) must agree EXACTLY with their straightforward
all-pairs references. Randomness is seeded per-case and all corpora
for a run are generated up front so runtime stays bounded."""

import random

import pytest

from otters_spark.operators.dedup import (
    jaccard_pairs,
    jaccard_pairs_blocked_matmul,
    simhash_banded_pairs,
    simhash_pairs,
)

WORDS = [f"w{i}" for i in range(40)]


def _corpus(seed: int, n_docs: int):
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        if rng.random() < 0.1:
            text = None  # exercise null paths
        elif rng.random() < 0.3 and rows:
            # near-dup of an earlier doc: copy + mutate one token
            base = rows[rng.randrange(len(rows))][1]
            toks = (base or "w0").split()
            toks[rng.randrange(len(toks))] = rng.choice(WORDS)
            text = " ".join(toks)
        else:
            text = " ".join(rng.choice(WORDS) for _ in range(rng.randint(3, 12)))
        rows.append((i, text, rng.choice(["en", "fr"]), f"s{rng.randrange(2)}"))
    return rows


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_simhash_banded_equals_all_pairs_random(spark, seed):
    docs = spark.createDataFrame(
        _corpus(seed, 60), ["doc_id", "text", "lang", "source"]
    ).filter("text is not null")
    d = [2, 4, 7][seed % 3]
    kw = dict(bits=32, block_cols=["lang", "source"])
    allp = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_pairs(docs, d, **kw).collect()
    }
    banded = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_banded_pairs(docs, d, **kw).collect()
    }
    assert banded == allp


@pytest.mark.parametrize("seed,cap", [(11, 5), (12, 16), (13, 100)])
def test_salted_matmul_equals_join_random(spark, seed, cap):
    docs = spark.createDataFrame(
        _corpus(seed, 50), ["doc_id", "text", "lang", "source"]
    )
    kw = dict(block_cols=["lang", "source"])
    exact = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in jaccard_pairs(docs.filter("text is not null"), 0.4, **kw).collect()
    }
    salted = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in jaccard_pairs_blocked_matmul(
            docs, 0.4, rows_per_block=cap, **kw
        ).collect()
    }
    assert salted == exact


def _py_levenshtein(a: str, b: str) -> int:
    d = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, d[0] = d[0], i
        for j, cb in enumerate(b, 1):
            prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (ca != cb))
    return d[-1]


@pytest.mark.parametrize("seed", [11, 12])
def test_edit_distance_pairs_match_python_reference(spark, seed):
    """On random mutated corpora, the bounded Spark verify must return
    exactly the pairs (and distances) an unbounded Python Levenshtein
    finds under the threshold — including the length-prefilter edge
    (|len diff| == max_edits) and mutations that push pairs just past
    the bound."""
    from otters_spark.operators.dedup import edit_distance_pairs

    rng = random.Random(seed)
    alphabet = "abcdef "
    rows = []
    for i in range(25):
        if rng.random() < 0.4 and rows:
            base = rows[rng.randrange(len(rows))][1] or "abc"
            s = list(base)
            for _ in range(rng.randrange(0, 8)):
                op = rng.randrange(3)
                pos = rng.randrange(len(s)) if s else 0
                if op == 0 and s:
                    s[pos] = rng.choice(alphabet)
                elif op == 1:
                    s.insert(pos, rng.choice(alphabet))
                elif s:
                    del s[pos]
            text = "".join(s)
        else:
            text = "".join(rng.choice(alphabet) for _ in range(rng.randint(5, 30)))
        rows.append((i, text))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    ids = docs.select("doc_id")
    cand = (
        ids.withColumnRenamed("doc_id", "id_a")
        .crossJoin(ids.withColumnRenamed("doc_id", "id_b"))
        .filter("id_a < id_b")
    )
    k = 5
    got = {
        (r["id_a"], r["id_b"]): r["edits"]
        for r in edit_distance_pairs(docs, cand, max_edits=k).collect()
    }
    texts = dict(rows)
    want = {}
    for ia in range(25):
        for ib in range(ia + 1, 25):
            e = _py_levenshtein(texts[ia], texts[ib])
            if e <= k:
                want[(ia, ib)] = e
    assert got == want


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_remove_frequent_segments_vs_python_reference(spark, seed):
    from collections import defaultdict

    from otters_spark.operators.dedup import remove_frequent_segments

    rows = [(i, t) for i, t, _, _ in _corpus(seed, 40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    width, min_docs = 2, 2
    segs_by_doc: dict[int, list[str]] = {}
    docs_per_seg: dict[str, set[int]] = defaultdict(set)
    for i, t in rows:
        if not t:
            continue
        w = t.split(" ")
        segs = [" ".join(w[j : j + width]) for j in range(0, len(w), width)]
        segs_by_doc[i] = segs
        for s in segs:
            docs_per_seg[s].add(i)
    hot = {s for s, ds in docs_per_seg.items() if len(ds) >= min_docs}
    want = {
        i: (
            len(segs),
            sum(s in hot for s in segs),
            " ".join(s for s in segs if s not in hot),
        )
        for i, segs in segs_by_doc.items()
    }

    got = {
        r.doc_id: (r.n_segments, r.n_dropped, r.cleaned)
        for r in remove_frequent_segments(df, width, min_docs).collect()
    }
    assert got == want


@pytest.mark.parametrize("seed", [21, 22])
def test_incremental_dedup_vs_bruteforce(spark, seed):
    from otters_spark.operators.dedup import incremental_dedup

    rows = _corpus(seed, 50)
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    new_rows = [r for r in rows if r[0] % 5 == 0]
    corp_rows = [r for r in rows if r[0] % 5 != 0]
    new = df.filter(df.doc_id % 5 == 0)
    corpus = df.filter(df.doc_id % 5 != 0)

    thr = 0.8

    def jac(a, b):
        if not a or not b:
            return 0.0
        sa, sb = set(a.split()), set(b.split())
        return len(sa & sb) / len(sa | sb)

    exact_dups, brute_survivors = set(), set()
    for i, t, lang, src in new_rows:
        if any(t is not None and t == ct for _, ct, _, _ in corp_rows):
            exact_dups.add(i)
        near = any(
            lang == cl and src == cs and jac(t, ct) >= thr
            for _, ct, cl, cs in corp_rows
        )
        if i not in exact_dups and not near:
            brute_survivors.add(i)

    got = {
        r.doc_id
        for r in incremental_dedup(
            new, corpus, thr, block_cols=["lang", "source"]
        ).collect()
    }
    # SOUND one-sided properties (LSH banding is a candidate generator:
    # it may MISS a borderline near-dup pair, never invent one, so the
    # operator can only over-admit relative to exhaustive brute force):
    # 1. nothing the brute force admits is rejected (no false rejects)
    assert got >= brute_survivors
    # 2. verbatim copies are ALWAYS rejected (the exact gate is
    #    deterministic, independent of banding recall)
    assert not (got & exact_dups)
    # 3. every extra admit beyond brute force is a banding recall miss
    #    on a genuinely >= thr pair — i.e., it must NOT be exact
    assert (got - brute_survivors) <= ({i for i, *_ in new_rows} - exact_dups)


@pytest.mark.parametrize("seed", [31, 32, 33])
def test_fuzzy_best_match_vs_bruteforce(spark, seed):
    from otters_spark.operators.linkage import fuzzy_best_match

    rows = [(i, t) for i, t, _, _ in _corpus(seed, 40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    left_rows = [r for r in rows if r[0] % 4 == 0]
    right_rows = [r for r in rows if r[0] % 4 != 0]
    left = df.filter(df.doc_id % 4 == 0)
    right = df.filter(df.doc_id % 4 != 0)

    def grams(t):
        if not t:
            return set()
        w = t.split(" ")
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    thr = 0.3
    want = {}
    for li, lt in left_rows:
        best = None
        for ri, rt in right_rows:
            ga, gb = grams(lt), grams(rt)
            if not ga or not gb:
                continue
            j = len(ga & gb) / len(ga | gb)
            if j >= thr and (best is None or j > best[1] or (j == best[1] and ri < best[0])):
                best = (ri, j)
        if best:
            want[li] = best

    got = {
        r.left_id: (r.right_id, r.score)
        for r in fuzzy_best_match(left, right, thr).collect()
    }
    # EQUALITY is sound here (unlike LSH banding): the shared-shingle
    # inverted index is exact for any threshold > 0
    assert set(got) == set(want)
    for li, (ri, j) in want.items():
        assert got[li][0] == ri
        assert got[li][1] == pytest.approx(j, abs=1e-12)
