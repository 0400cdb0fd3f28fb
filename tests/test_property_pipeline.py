"""Property-based differential tests for the round-2 pipeline
operators: on random corpora, the scale-shaped formulations must agree
EXACTLY with straightforward Python references computed driver-side.
Randomness is seeded per case so failures reproduce."""

import math
import random
from collections import Counter

import pytest

WORDS = [f"w{i}" for i in range(25)]


def _corpus(seed: int, n_docs: int = 60):
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        n = rng.randint(1, 30)
        rows.append((i, " ".join(rng.choice(WORDS) for _ in range(n))))
    return rows


@pytest.mark.parametrize("seed", [11, 12])
def test_repetition_features_vs_python(spark, seed):
    from otters_spark.operators.text_analysis import repetition_features

    rows = _corpus(seed)
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in repetition_features(df).collect()}
    for i, text in rows:
        toks = text.split(" ")
        bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        c = Counter(bigrams)
        nt, nd = len(toks), len(set(toks))
        tot, ndb, mx = len(bigrams), len(c), max(c.values(), default=0)
        r = got[i]
        assert r["n_tokens"] == nt
        assert r["dup_token_frac"] == round((nt - nd) / nt, 6)
        assert r["top_bigram_frac"] == round(mx / tot if tot else 0.0, 6)
        assert r["dup_bigram_frac"] == round((tot - ndb) / tot if tot else 0.0, 6)


@pytest.mark.parametrize("seed", [21, 22])
def test_tfidf_pairs_vs_python(spark, seed):
    from otters_spark.operators.dedup import tfidf_cosine_pairs

    rows = _corpus(seed, n_docs=40)
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(df, threshold=0.0, max_df_frac=0.6).collect()
    }

    n_docs = len(rows)
    tf = {i: Counter(t.split(" ")) for i, t in rows}
    dfreq = Counter(tok for c in tf.values() for tok in c)
    idf = {
        t: math.log(n_docs / d)
        for t, d in dfreq.items()
        if d / n_docs <= 0.6
    }
    vecs = {
        i: {t: n * idf[t] for t, n in c.items() if t in idf}
        for i, c in tf.items()
    }
    norms = {i: math.sqrt(sum(w * w for w in v.values())) for i, v in vecs.items()}
    expect = {}
    for a in range(n_docs):
        for b in range(a + 1, n_docs):
            dot = sum(w * vecs[b].get(t, 0.0) for t, w in vecs[a].items())
            if dot > 0 or (set(vecs[a]) & set(vecs[b])):
                denom = norms[a] * norms[b]
                expect[(a, b)] = dot / denom if denom > 0 else 0.0
    assert set(got) == set(expect)
    for k, v in expect.items():
        assert abs(got[k] - v) < 1e-9, k


@pytest.mark.parametrize("seed", [31, 32])
def test_token_budget_vs_global_sort(spark, seed):
    """The two-phase binned selection must equal the global-sort
    prefix-sum reference for random qualities/budgets and ANY bins."""
    from otters_spark.operators.sampling import select_to_token_budget

    rng = random.Random(seed)
    rows = [
        (i, round(rng.random(), 6), rng.randint(1, 50)) for i in range(80)
    ]
    total = sum(n for _, _, n in rows)
    budget = rng.randint(total // 4, 3 * total // 4)

    order = sorted(rows, key=lambda r: (-r[1], r[0]))
    cum, expect = 0, set()
    for i, q, n in order:
        cum += n
        if cum <= budget:
            expect.add(i)

    df = spark.createDataFrame(rows, ["doc_id", "q", "n"])
    for bins in (7, 1000):
        kept = {
            r["doc_id"]
            for r in select_to_token_budget(df, budget, "q", "n", bins=bins).collect()
        }
        assert kept == expect, bins


@pytest.mark.parametrize("seed", [41])
def test_contamination_vs_python(spark, seed):
    from otters_spark.operators.decontam import contamination_report

    rng = random.Random(seed)
    train = _corpus(seed, n_docs=50)
    # eval set: excerpts of random train docs + pure noise
    ev = []
    for j in range(8):
        i, text = train[rng.randrange(len(train))]
        toks = text.split(" ")
        if len(toks) >= 10:
            s = rng.randrange(0, len(toks) - 9)
            ev.append((1000 + j, " ".join(toks[s:s + 10])))
        else:
            ev.append((1000 + j, " ".join(rng.choice(WORDS) for _ in range(9))))
    n = 6
    grams = lambda t: {
        " ".join(t.split(" ")[k:k + n])
        for k in range(len(t.split(" ")) - n + 1)
    }
    expect = {}
    for i, text in train:
        g = grams(text)
        shared = set()
        hits = set()
        for j, et in ev:
            inter = g & grams(et)
            if inter:
                shared |= inter
                hits.add(j)
        if shared:
            expect[i] = (len(shared), len(hits))

    tdf = spark.createDataFrame(train, ["doc_id", "text"])
    edf = spark.createDataFrame(ev, ["doc_id", "text"])
    got = {
        r["train_id"]: (r["n_shared_ngrams"], r["n_eval_docs"])
        for r in contamination_report(tdf, edf, n=n).collect()
    }
    assert got == expect


@pytest.mark.parametrize("seed", [71, 72])
def test_bm25_vs_python(spark, seed):
    from otters_spark.operators.text_analysis import bm25_topk

    rows = _corpus(seed, n_docs=50)
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    terms = ["w0", "w3", "w7"]
    k1, b = 1.2, 0.75
    got = [(r["doc_id"], r["score"]) for r in bm25_topk(df, terms, k=50).collect()]

    dls = {i: len(t.split(" ")) for i, t in rows}
    n = len(rows)
    avgdl = sum(dls.values()) / n
    tfs = {i: Counter(t.split(" ")) for i, t in rows}
    dfreq = {t: sum(1 for c in tfs.values() if c[t] > 0) for t in terms}
    want = []
    for i, _ in rows:
        s = 0.0
        for t in terms:
            tf = tfs[i][t]
            if tf == 0:
                continue
            idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dls[i] / avgdl))
        if s > 0:
            want.append((i, s))
    want.sort(key=lambda p: (-p[1], p[0]))
    assert [i for i, _ in got] == [i for i, _ in want[:50]]
    for (gi, gs), (wi, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9)


@pytest.mark.parametrize("seed", [81, 82])
def test_pack_sequences_vs_python(spark, seed):
    from otters_spark.operators.sampling import pack_sequences

    rng = random.Random(seed)
    rows = [(i, rng.randint(0, 120)) for i in range(80)]
    df = spark.createDataFrame(rows, ["doc_id", "n"])
    ctx = rng.choice([32, 64, 100])
    got = {
        r["doc_id"]: (r["seq_start"], r["seq_end"], r["start_offset"])
        for r in pack_sequences(df, ctx, "n", bins=7).collect()
    }
    cb = 0
    for i, n in rows:
        start = cb // ctx
        end = (cb + n - 1) // ctx if n > 0 else start
        assert got[i] == (start, end, cb - start * ctx), (i, ctx)
        cb += n


@pytest.mark.parametrize("seed", [91, 92])
def test_cap_per_group_vs_python(spark, seed):
    """Sound bounds on random corpora: never over the cap, exactly the
    cap when the group is big enough and the prefilter can't undershoot
    (group size <= safety*n_max => p=1, exact reservoir semantics —
    checked against a Python md5-rank reference); selection invariant
    under repartitioning."""
    import hashlib

    from otters_spark.operators.sampling import cap_per_group

    rng = random.Random(seed)
    n_max = rng.choice([2, 4])
    rows = []
    gid = 0
    for size in [1, n_max, 2 * n_max, 2 * n_max + 7, 40]:
        for _ in range(size):
            rows.append((rng.randrange(10**9), f"g{gid}"))
        gid += 1
    df = spark.createDataFrame(rows, ["doc_id", "grp"])
    kept = cap_per_group(df, ["grp"], n_max, key_col="doc_id").collect()
    by_grp = Counter(r["grp"] for r in kept)
    sizes = Counter(g for _, g in rows)
    for g, size in sizes.items():
        assert by_grp[g] <= min(n_max, size)
        if size <= 2 * n_max:  # p=1: exact reservoir semantics
            assert by_grp[g] == min(n_max, size)
            want = sorted(
                (int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16), i)
                for i, gg in rows
                if gg == g
            )[:n_max]
            got_ids = sorted(r["doc_id"] for r in kept if r["grp"] == g)
            assert got_ids == sorted(i for _, i in want)
    # repartition-invariance
    again = sorted(
        r["doc_id"]
        for r in cap_per_group(df.repartition(13), ["grp"], n_max).collect()
    )
    assert again == sorted(r["doc_id"] for r in kept)


@pytest.mark.parametrize("seed", [101, 102])
def test_tfidf_keywords_vs_python(spark, seed):
    from otters_spark.operators.text_analysis import tfidf_keywords

    rows = _corpus(seed, n_docs=40)
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["score"])
        for r in tfidf_keywords(df, top_n=2).collect()
    }
    n = len(rows)
    dfreq = Counter()
    for _, text in rows:
        for t in set(text.split(" ")):
            dfreq[t] += 1
    for i, text in rows:
        tf = Counter(text.split(" "))
        scored = sorted(
            ((t, c * math.log((n + 1.0) / (dfreq[t] + 1.0))) for t, c in tf.items()),
            key=lambda kv: (-kv[1], kv[0]),
        )[:2]
        for rank, (t, s) in enumerate(scored, start=1):
            gt, gs = got[(i, rank)]
            assert gt == t, (i, rank, gt, t)
            assert gs == pytest.approx(round(s, 6), abs=1e-6)


@pytest.mark.parametrize("seed", [111, 112])
def test_retrieval_metrics_vs_python(spark, seed):
    from otters_spark.operators.evaluation import retrieval_metrics

    rng = random.Random(seed)
    rows_a, rows_t = [], []
    for qid in range(6):
        ids = rng.sample(range(50), 20)
        truth = ids[:10]
        approx = rng.sample(range(50), rng.randint(0, 10))
        rows_t += [(qid, v, r + 1) for r, v in enumerate(truth)]
        rows_a += [(qid, v, r + 1) for r, v in enumerate(approx)]
    a = spark.createDataFrame(rows_a, "query_id int, vec_id int, rank int")
    t = spark.createDataFrame(rows_t, "query_id int, vec_id int, rank int")
    got = {r["query_id"]: r for r in retrieval_metrics(a, t).collect()}
    for qid in range(6):
        truth = {v for q, v, _ in rows_t if q == qid}
        approx = [(v, r) for q, v, r in rows_a if q == qid]
        hits = [(v, r) for v, r in approx if v in truth]
        r0 = got[qid]
        assert r0["n_truth"] == len(truth)
        assert r0["n_hits"] == len(hits)
        assert r0["recall"] == pytest.approx(round(len(hits) / len(truth), 6))
        mrr = 1.0 / min((r for _, r in hits), default=math.inf) if hits else 0.0
        assert r0["mrr"] == pytest.approx(round(mrr, 6))
        dcg = sum(1.0 / math.log2(r + 1) for _, r in hits)
        idcg = sum(1.0 / math.log2(r + 1) for r in range(1, len(truth) + 1))
        assert r0["ndcg"] == pytest.approx(round(dcg / idcg, 6), abs=1e-6)


@pytest.mark.parametrize("seed", [31, 32])
def test_transition_and_paths_vs_python(spark, seed):
    """Random event streams (with deliberate ts ties): transition
    counts/gaps/probs and 3-step path counts must equal a driver-side
    walk using the same (ts, id) ordering."""
    from datetime import datetime, timedelta

    from otters_spark.operators.behavior import path_counts, transition_matrix

    rng = random.Random(seed)
    types = ["a", "b", "c", "d"]
    rows = []
    eid = 0
    base = datetime(2024, 1, 1)
    for u in range(12):
        t = base
        for _ in range(rng.randint(0, 15)):
            # ~30% chance the ts does NOT advance -> real ties
            if rng.random() > 0.3:
                t = t + timedelta(seconds=rng.randint(1, 500))
            rows.append((eid, u, t, rng.choice(types)))
            eid += 1
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    # python reference
    trans = Counter()
    gaps = Counter()
    paths = Counter()
    by_user = {}
    for eid_, u, t, ty in rows:
        by_user.setdefault(u, []).append((t, eid_, ty))
    for u, evs in by_user.items():
        evs.sort()
        for (t1, _, a), (t2, _, b) in zip(evs, evs[1:]):
            trans[(a, b)] += 1
            gaps[(a, b)] += int((t2 - t1).total_seconds() * 1_000_000)
        for (_, _, a), (_, _, b), (_, _, c) in zip(evs, evs[1:], evs[2:]):
            paths[(a, b, c)] += 1
    got = {(r["from_type"], r["to_type"]): r for r in transition_matrix(df).collect()}
    assert set(got) == set(trans)
    from_totals = Counter()
    for (a, _), n in trans.items():
        from_totals[a] += n
    for k, n in trans.items():
        assert got[k]["n_trans"] == n
        assert got[k]["gap_micros_total"] == gaps[k]
        assert got[k]["prob"] == round(n / from_totals[k[0]], 6)
    gotp = {
        (r["step_1"], r["step_2"], r["step_3"]): r["n_paths"]
        for r in path_counts(df, depth=3).collect()
    }
    assert gotp == dict(paths)


@pytest.mark.parametrize("seed", [41, 42])
def test_ngram_novelty_vs_python(spark, seed):
    from otters_spark.operators.text_analysis import ngram_novelty

    rows = _corpus(seed, n_docs=50)
    n = 3
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    per_doc = {}
    dfreq = Counter()
    for i, text in rows:
        toks = [t for t in text.split(" ") if t]
        grams = {
            " ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)
        }
        if grams:
            per_doc[i] = grams
            for g in grams:
                dfreq[g] += 1
    got = {r["doc_id"]: r for r in ngram_novelty(df, n=n).collect()}
    assert set(got) == set(per_doc)
    for i, grams in per_doc.items():
        novel = sum(1 for g in grams if dfreq[g] == 1)
        assert got[i]["n_ngrams"] == len(grams)
        assert got[i]["n_novel"] == novel
        assert got[i]["novelty"] == round(novel / len(grams), 6)
