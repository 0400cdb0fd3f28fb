"""Deterministic sampling/splitting: stability, exactness, leakage."""

import pytest
from pyspark.sql import functions as F

from otters_spark.operators.sampling import (
    hash_sample,
    hash_split,
    leakage_safe_split,
    reservoir_per_group,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_split_stable_and_partitioned(docs):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id", w).collect()}
    # repartitioned input must produce the identical assignment
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.repartition(7), "doc_id", w).collect()
    }
    assert a == b
    frac = sum(1 for s in a.values() if s == "train") / len(a)
    assert 0.75 < frac < 0.85  # hash buckets track requested fraction


def test_split_growth_no_reassignment(docs):
    # adding documents must not move existing ones across splits —
    # the anti-leakage property rand() splits do not have
    w = {"train": 0.9, "test": 0.1}
    small = docs.limit(100)
    a = {r["doc_id"]: r["split"] for r in hash_split(small, "doc_id", w).collect()}
    full = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id", w).collect()}
    assert all(full[k] == v for k, v in a.items())


def test_split_validation(docs):
    with pytest.raises(ValueError):
        hash_split(docs, weights={"a": 0.9, "b": 0.2})
    with pytest.raises(ValueError):
        hash_split(docs, weights={"a": -0.1, "b": 0.5})


def test_leakage_safe_split_respects_clusters(spark):
    # chain 1-2-3 plus pair (10,11); singletons 20, 21
    docs = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 10, 11, 20, 21]], ["doc_id"]
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"])
    w = {"train": 0.5, "val": 0.25, "test": 0.25}
    out = {r["doc_id"]: r["split"]
           for r in leakage_safe_split(docs, pairs, weights=w).collect()}
    assert len(out) == 7  # left join: no rows dropped or duplicated
    assert out[1] == out[2] == out[3]  # transitive cluster stays together
    assert out[10] == out[11]
    # singletons split exactly as plain hash_split would
    plain = {r["doc_id"]: r["split"]
             for r in hash_split(docs, "doc_id", w).collect()}
    assert out[20] == plain[20] and out[21] == plain[21]
    # cluster members all get the split of their min-id representative
    assert out[1] == plain[1] and out[10] == plain[10]


def test_leakage_safe_split_no_pair_straddles(spark, sf_dir):
    # real near-dup pairs on the corpus: no pair may cross splits
    from otters_spark.suite import dedup_minhash_banded_verified

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dedup_minhash_banded_verified(spark, sf_dir).select("id_a", "id_b")
    split = leakage_safe_split(d, pairs)
    a = split.select("doc_id", "split")
    crossing = (
        pairs.join(a.withColumnRenamed("doc_id", "id_a")
                   .withColumnRenamed("split", "sa"), "id_a")
        .join(a.withColumnRenamed("doc_id", "id_b")
              .withColumnRenamed("split", "sb"), "id_b")
        .filter("sa <> sb")
        .count()
    )
    assert crossing == 0
    assert pairs.count() > 0  # the property is vacuous on an empty pair set


def test_hash_sample_subset_semantics(docs):
    s10 = {r["doc_id"] for r in hash_sample(docs, 0.1).collect()}
    s30 = {r["doc_id"] for r in hash_sample(docs, 0.3).collect()}
    assert s10 <= s30  # growing the fraction only ADDS rows
    n = docs.count()
    assert abs(len(s10) / n - 0.1) < 0.05
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5)


def test_reservoir_exact_k(docs):
    out = reservoir_per_group(docs, ["lang", "source"], k=3)
    sizes = {tuple(r[:2]): r["n"] for r in out.groupBy("lang", "source").count()
             .withColumnRenamed("count", "n").collect()}
    group_sizes = {tuple(r[:2]): r["n"] for r in docs.groupBy("lang", "source").count()
                   .withColumnRenamed("count", "n").collect()}
    for g, n in group_sizes.items():
        assert sizes[g] == min(3, n)
    # deterministic: second run picks the same representatives
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in reservoir_per_group(docs, ["lang", "source"], k=3).collect())
    assert a == b


def test_cap_per_group_matches_reservoir(docs):
    """cap_per_group is reservoir_per_group with bounded window
    partitions; on any corpus where the prefilter doesn't undershoot
    (a Chernoff-tail event) the kept sets are IDENTICAL."""
    from otters_spark.operators.sampling import cap_per_group

    a = sorted(r["doc_id"] for r in cap_per_group(docs, ["source"], 5).collect())
    b = sorted(
        r["doc_id"] for r in reservoir_per_group(docs, ["source"], k=5).collect()
    )
    assert a == b
    sizes = [r["n"] for r in cap_per_group(docs, ["source"], 5)
             .groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()]
    assert all(s == 5 for s in sizes)  # every source has >= 5 docs


def test_cap_per_group_null_group_key(spark):
    """NULL group keys form one capped group (null-safe count join —
    the gap_fill/percentile NULL-key lesson applied up front)."""
    from otters_spark.operators.sampling import cap_per_group

    rows = [(i, None if i % 2 == 0 else "g") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out = cap_per_group(df, ["grp"], 3, key_col="doc_id")
    got = {r["grp"]: 0 for r in out.collect()}
    for r in out.collect():
        got[r["grp"]] += 1
    assert got == {None: 3, "g": 3}


def test_cap_per_group_null_selection_key_not_dropped(spark):
    """A NULL key_col hashes to 0 and ranks first (reservoir's
    NULLS-FIRST analog) instead of being silently dropped by the
    prefilter."""
    from otters_spark.operators.sampling import cap_per_group

    rows = [(None, "g")] + [(str(i), "g") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id string, grp string")
    kept = cap_per_group(df, ["grp"], 3, key_col="doc_id").collect()
    assert len(kept) == 3
    assert any(r["doc_id"] is None for r in kept)


def test_cap_per_group_small_groups_pass_through(spark):
    from otters_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame(
        [(i, "tiny") for i in range(4)], "doc_id long, grp string"
    )
    assert cap_per_group(df, ["grp"], 10, key_col="doc_id").count() == 4
    with pytest.raises(ValueError):
        cap_per_group(df, ["grp"], 0)
    with pytest.raises(ValueError):
        cap_per_group(df, ["grp"], 5, safety=0.5)


def test_stratified_sample_rates(spark):
    from otters_spark.operators.sampling import stratified_sample

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = stratified_sample(df, "source", {"a": 1.0}, default=0.0)
    got = out.groupBy("source").count().collect()
    counts = {r["source"]: r["count"] for r in got}
    assert counts == {"a": 1000}  # full keep for a, default drops b

    half = stratified_sample(df, "source", {"a": 0.5, "b": 0.1})
    c2 = {r["source"]: r["count"] for r in half.groupBy("source").count().collect()}
    assert 380 <= c2["a"] <= 620 and 40 <= c2["b"] <= 180
    # determinism: same rows kept on re-run
    ids1 = sorted(r["doc_id"] for r in half.collect())
    ids2 = sorted(r["doc_id"] for r in stratified_sample(
        df, "source", {"a": 0.5, "b": 0.1}).collect())
    assert ids1 == ids2


def test_stratified_sample_validates(spark):
    import pytest

    from otters_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame([(1, "a")], ["doc_id", "source"])
    with pytest.raises(ValueError):
        stratified_sample(df, "source", {"a": 1.5})
    with pytest.raises(ValueError):
        stratified_sample(df, "source", {"a": 0.5}, default=-0.1)


def test_select_to_token_budget_exact(spark):
    from otters_spark.operators.sampling import select_to_token_budget

    # quality ordering: doc 3 (0.9), doc 1 (0.5), doc 2 (0.5, id tie),
    # doc 4 (0.1); tokens 10 each; budget 25 -> keep 3 and 1 only
    rows = [
        (1, 0.5, 10),
        (2, 0.5, 10),
        (3, 0.9, 10),
        (4, 0.1, 10),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "q", "n"])
    kept = sorted(
        r["doc_id"]
        for r in select_to_token_budget(df, 25, "q", "n").collect()
    )
    assert kept == [1, 3]
    # budget exactly covers three docs -> tie broken by doc_id
    kept30 = sorted(
        r["doc_id"]
        for r in select_to_token_budget(df, 30, "q", "n").collect()
    )
    assert kept30 == [1, 2, 3]
    # tiny bins still exact (every doc its own bin boundary behavior)
    kept_b2 = sorted(
        r["doc_id"]
        for r in select_to_token_budget(df, 25, "q", "n", bins=2).collect()
    )
    assert kept_b2 == [1, 3]


def test_pack_sequences_matches_python_cumsum(spark):
    import math

    rows = [(i, (i * 37) % 90 + 1) for i in range(40)]  # varied lengths
    rows[7] = (7, 0)  # zero-length doc
    df = spark.createDataFrame(rows, ["doc_id", "n"])
    from otters_spark.operators.sampling import pack_sequences

    ctx = 64
    got = {
        r["doc_id"]: (r["seq_start"], r["seq_end"], r["start_offset"], r["n_seqs"])
        for r in pack_sequences(df, ctx, "n", bins=5).collect()
    }
    cb = 0
    total = 0
    for i, n in rows:
        start = cb // ctx
        end = (cb + n - 1) // ctx if n > 0 else start
        assert got[i] == (start, end, cb - start * ctx, end - start + 1), i
        cb += n
        total += n
    # stream covers exactly ceil(total/ctx) sequences
    assert max(e for _, e, _, _ in got.values()) == math.ceil(total / ctx) - 1


def test_pack_sequences_rejects_bad_ctx(spark):
    import pytest as _pytest

    from otters_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame([(1, 2)], ["doc_id", "n"])
    with _pytest.raises(ValueError):
        pack_sequences(df, 0, "n")


def test_temperature_mix_flattens_mixture(spark):
    from pyspark.sql import Row, functions as F
    from otters_spark.operators.sampling import temperature_mix

    rows = [Row(doc_id=i, src="big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, src string")

    out = temperature_mix(df, "src", 0.5)
    got = {r.src: r.n for r in out.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()}
    # rates: w_big=sqrt(900), w_small=sqrt(100); rate_big = 1000*30/(40*900)=0.8333,
    # rate_small = 1000*10/(40*100) = 2.5 -> capped at 1 (no upsampling)
    assert got["small"] == 100
    # deterministic hash-bucket at rate 0.8333: same rows hash_sample(5/6) keeps
    big = df.filter(F.col("src") == "big")
    assert got["big"] == hash_sample(big, 10_000 * 5 // 6 / 10_000).count()
    # big's share dropped from 90% toward the sqrt-flattened target
    assert 0.75 < got["big"] / 900 < 0.92

    # alpha=1 keeps natural proportions: every rate is exactly 1
    nat = temperature_mix(df, "src", 1.0)
    assert nat.count() == 1000

    with pytest.raises(ValueError):
        temperature_mix(df, "src", 0.0)


def test_temperature_mix_null_group_kept(spark):
    from pyspark.sql import Row, functions as F
    from otters_spark.operators.sampling import temperature_mix

    rows = [Row(doc_id=i, src="a" if i < 50 else None) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = temperature_mix(df, "src", 0.5)
    got = {
        (r.src, r.n)
        for r in out.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # equal-size groups at alpha=0.5 -> both rates exactly 1; the NULL
    # group must survive the rates join (null-safe equality)
    assert got == {("a", 50), (None, 50)}


# ------------------------------------------------------------------ DSIR


def _dsir_corpus(spark):
    from pyspark.sql import functions as F

    rows = []
    # 20 "code-like" docs and 20 "prose-like" docs with disjoint vocab
    for i in range(20):
        rows.append((i, "def class import return yield lambda " * 5))
    for i in range(20, 40):
        rows.append((i, "the quick brown fox jumps over dogs " * 5))
    rows.append((40, None))  # NULL text: must yield no weight row
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dsir_weights_zero_when_target_is_corpus(spark):
    from otters_spark.operators.sampling import dsir_weights

    corpus = _dsir_corpus(spark).filter("text is not null")
    w = dsir_weights(corpus, corpus).collect()
    assert len(w) == 40
    assert all(r["logw_micro"] == 0 for r in w)  # identical models -> lr 0


def test_dsir_weights_favor_target_domain(spark):
    from otters_spark.operators.sampling import dsir_weights

    corpus = _dsir_corpus(spark)
    target = corpus.filter("doc_id < 5")  # code-like target domain
    w = {r["doc_id"]: r["logw_micro"] for r in dsir_weights(corpus, target).collect()}
    assert 40 not in w  # NULL text doc has no token stream
    code = [w[i] for i in range(20)]
    prose = [w[i] for i in range(20, 40)]
    assert min(code) > max(prose)  # clean separation on disjoint vocab


def test_dsir_select_is_stable_and_biased(spark):
    from otters_spark.operators.sampling import dsir_select

    corpus = _dsir_corpus(spark)
    target = corpus.filter("doc_id < 5")
    a = {r["doc_id"] for r in dsir_select(corpus, target, n_take=15).collect()}
    b = {
        r["doc_id"]
        for r in dsir_select(corpus.repartition(7), target, n_take=15).collect()
    }
    assert a == b and len(a) == 15  # content-keyed Gumbel: re-run stable
    # weights dominate the noise here (disjoint vocab, long docs):
    # the sample is drawn from the code-like half
    assert all(i < 20 for i in a)


def test_dsir_validation(spark):
    import pytest as _pytest

    from otters_spark.operators.sampling import dsir_select, dsir_weights

    corpus = _dsir_corpus(spark)
    with _pytest.raises(ValueError, match="n_buckets"):
        dsir_weights(corpus, corpus, n_buckets=1)
    with _pytest.raises(ValueError, match="smoothing"):
        dsir_weights(corpus, corpus, smoothing=0.0)
    with _pytest.raises(ValueError, match="n_take"):
        dsir_select(corpus, corpus, n_take=0)


def test_shuffle_shards_is_exact_global_permutation(docs, spark):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from otters_spark.functions.text import md5_long_expr
    from otters_spark.operators.sampling import shuffle_shards

    out = shuffle_shards(docs, n_shards=8, bins=64)
    rows = out.select("doc_id", "shard_id", "shard_pos").collect()
    # reference: single-window global row number over the hash order
    ref = (
        docs.withColumn("__h", md5_long_expr(F.col("doc_id")))
        .withColumn(
            "__idx",
            F.row_number().over(Window.orderBy("__h", "doc_id")) - 1,
        )
        .select("doc_id", (F.pmod("__idx", F.lit(8))).alias("shard_id"),
                F.floor(F.col("__idx") / 8).cast("long").alias("shard_pos"))
        .collect()
    )
    assert {(r.doc_id, r.shard_id, r.shard_pos) for r in rows} == {
        (r.doc_id, r.shard_id, r.shard_pos) for r in ref
    }
    # balance: round-robin shard sizes differ by <= 1
    sizes = [r["n"] for r in out.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n")).collect()]
    assert len(sizes) == 8 and max(sizes) - min(sizes) <= 1


def test_shuffle_shards_partition_invariant(docs):
    from otters_spark.operators.sampling import shuffle_shards

    a = {(r.doc_id, r.shard_id, r.shard_pos)
         for r in shuffle_shards(docs, 4).select(
             "doc_id", "shard_id", "shard_pos").collect()}
    b = {(r.doc_id, r.shard_id, r.shard_pos)
         for r in shuffle_shards(docs.repartition(13), 4).select(
             "doc_id", "shard_id", "shard_pos").collect()}
    assert a == b


def test_shuffle_shards_validation(docs):
    import pytest as _pytest

    from otters_spark.operators.sampling import shuffle_shards

    with _pytest.raises(ValueError):
        shuffle_shards(docs, 0)
    with _pytest.raises(ValueError):
        shuffle_shards(docs, 4, bins=100)  # not a power of two


def test_write_training_shards_layout(docs, spark, tmp_path):
    from pyspark.sql import functions as F

    from otters_spark.operators.sampling import shuffle_shards, write_training_shards

    path = str(tmp_path / "shards")
    write_training_shards(docs.limit(200), path, n_shards=4)
    back = spark.read.parquet(path)
    assert back.count() == 200
    assert {r["shard_id"] for r in back.select("shard_id").distinct().collect()} == {0, 1, 2, 3}
    # within a shard file the rows are stored in permutation order
    one = spark.read.parquet(f"{path}/shard_id=0")
    pos = [r["shard_pos"] for r in one.collect()]
    assert pos == sorted(pos)
    # round-trip agrees with the operator's assignment
    direct = shuffle_shards(docs.limit(200), 4)
    assert {(r.doc_id, r.shard_pos) for r in back.select("doc_id", "shard_pos").collect()} == {
        (r.doc_id, r.shard_pos) for r in direct.select("doc_id", "shard_pos").collect()
    }


def test_shuffle_shards_null_keys_do_not_offset_indices(spark):
    from otters_spark.operators.sampling import shuffle_shards

    with_nulls = spark.createDataFrame(
        [(None,), (None,), (None,)] + [(i,) for i in range(8)], "doc_id long"
    )
    clean = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    a = {(r.doc_id, r.shard_id, r.shard_pos)
         for r in shuffle_shards(with_nulls, 4).collect()}
    b = {(r.doc_id, r.shard_id, r.shard_pos)
         for r in shuffle_shards(clean, 4).collect()}
    # NULL keys drop out entirely; real rows keep 0-based positions
    assert a == b
    assert min(p for _, _, p in a) == 0


def test_epoch_mix_fractional_replication(docs, spark):
    from pyspark.sql import functions as F

    from otters_spark.operators.sampling import epoch_mix

    out = epoch_mix(docs, {"src0": 2.5, "src1": 0.4}, default=1.0)
    per_doc = {r["doc_id"]: r["n"] for r in out.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    src = {r["doc_id"]: r["source"] for r in docs.collect()}
    n0 = [per_doc.get(d, 0) for d, s in src.items() if s == "src0"]
    n1 = [per_doc.get(d, 0) for d, s in src.items() if s == "src1"]
    rest = [per_doc.get(d, 0) for d, s in src.items() if s not in ("src0", "src1")]
    assert set(n0) <= {2, 3} and set(n1) <= {0, 1} and set(rest) == {1}
    # fractional tails track the requested rates
    assert abs(sum(n0) / len(n0) - 2.5) < 0.25
    assert abs(sum(n1) / len(n1) - 0.4) < 0.25
    # copy ids are 1..n per doc
    copies = out.filter(F.col("doc_id") == [d for d, s in src.items() if s == "src0"][0])
    ids = sorted(r["copy_id"] for r in copies.collect())
    assert ids == list(range(1, len(ids) + 1))


def test_epoch_mix_stable_and_validated(docs):
    from otters_spark.operators.sampling import epoch_mix

    a = {(r.doc_id, r.copy_id) for r in epoch_mix(docs, {"src0": 1.7}).collect()}
    b = {(r.doc_id, r.copy_id)
         for r in epoch_mix(docs.repartition(9), {"src0": 1.7}).collect()}
    assert a == b
    import pytest as _pytest

    with _pytest.raises(ValueError):
        epoch_mix(docs, {"src0": -1.0})


def test_weighted_sample_python_replication_and_grouping(spark):
    """The Gumbel selection key replicates exactly in Python (same md5
    convention), so the chosen set is checkable row for row; grouped
    mode takes n per group; nonpositive/NULL weights are excluded."""
    import hashlib
    import math

    from otters_spark.operators.sampling import weighted_sample

    rows = [(i, "g" + str(i % 2), float(1 + (i * 7) % 13)) for i in range(40)]
    rows += [(100, "g0", 0.0), (101, "g1", -2.0), (102, "g0", None)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, w double")

    def key(doc_id, w):
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        u = (h + 1) / (2**60 + 1)
        return round(math.log(w) * 1e6) + round(-math.log(-math.log(u)) * 1e6)

    expect = {}
    for doc_id, grp, w in rows:
        if w is None or w <= 0:
            continue
        expect.setdefault(grp, []).append((-key(doc_id, w), doc_id))
    want = {
        (grp, doc_id)
        for grp, lst in expect.items()
        for _, doc_id in sorted(lst)[:3]
    }
    got = {
        (r["grp"], r["doc_id"])
        for r in weighted_sample(df, "w", 3, group_cols=["grp"]).collect()
    }
    assert got == want
    assert not {d for _, d in got} & {100, 101, 102}
    # global mode: a single top-n, deterministic across re-runs
    g1 = {r["doc_id"] for r in weighted_sample(df, "w", 5).collect()}
    g2 = {r["doc_id"] for r in weighted_sample(df, "w", 5).collect()}
    assert g1 == g2 and len(g1) == 5
    with pytest.raises(ValueError, match="positive"):
        weighted_sample(df, "w", 0)


def test_weighted_sample_favors_heavy_weights(spark):
    """Statistical sanity: with two weight classes 10:1, the heavy
    class must win well over half the slots (the deterministic draw
    makes this a fixed, reproducible assertion, not a flaky one)."""
    from otters_spark.operators.sampling import weighted_sample

    rows = [(i, 10.0 if i < 200 else 1.0) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    picked = [r["doc_id"] for r in weighted_sample(df, "w", 60).collect()]
    heavy = sum(1 for d in picked if d < 200)
    # E[heavy] ≈ 60 * 10/11 ≈ 54.5; the fixed draw lands near it
    assert heavy >= 45


def test_poisson_bootstrap_ci_brackets_truth_and_is_deterministic(spark):
    """CI must bracket the true mean on a well-behaved sample, shrink
    with n, and reproduce bit-for-bit across reruns/partitionings."""
    from otters_spark.operators.sampling import poisson_bootstrap_ci

    rows = [(i, "g", 100 + (i * 37) % 21) for i in range(400)]  # mean ~110
    df = spark.createDataFrame(rows, "doc_id long, grp string, x long")
    a = poisson_bootstrap_ci(df, "x", "doc_id", ["grp"], n_boot=40).collect()[0]
    assert a["lo"] <= a["mean"] <= a["hi"]
    assert a["n"] == 400
    true_mean = sum(r[2] for r in rows) / 400
    assert a["mean"] == pytest.approx(true_mean, abs=1e-6)
    assert a["hi"] - a["lo"] < 3.0  # sane width for sd~6, n=400
    b = poisson_bootstrap_ci(
        df.repartition(13), "x", "doc_id", ["grp"], n_boot=40
    ).collect()[0]
    assert (a["lo"], a["hi"], a["mean"]) == (b["lo"], b["hi"], b["mean"])


def test_poisson_bootstrap_replica_counts_match_python(spark):
    """The deterministic Poisson draw: per-(id, b) k must equal the
    same md5→CDF walk in plain Python."""
    import hashlib

    from otters_spark.operators.sampling import (
        POISSON1_CDF,
        poisson_bootstrap_ci,
    )
    from pyspark.sql import functions as F
    from otters_spark.functions.text import md5_long_expr

    ids = list(range(30))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        (r["doc_id"], r["b"]): r["k"]
        for r in df.withColumn(
            "b", F.explode(F.sequence(F.lit(0), F.lit(3)))
        )
        .withColumn(
            "u",
            (
                md5_long_expr(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        F.col("b").cast("string"),
                    )
                )
                + 1
            ).cast("double")
            / F.lit(float(2**60 + 1)),
        )
        .withColumn(
            "k",
            F.size(
                F.filter(
                    F.array(*[F.lit(c) for c in POISSON1_CDF]),
                    lambda c: F.col("u") > c,
                )
            ),
        )
        .collect()
    }
    for i in ids:
        for b in range(4):
            h = int(hashlib.md5(f"{i}:{b}".encode()).hexdigest()[:15], 16)
            u = (h + 1) / float(2**60 + 1)
            k = sum(1 for c in POISSON1_CDF if u > c)
            assert got[(i, b)] == k, (i, b)
    # sanity: poisson_bootstrap_ci runs end-to-end ungrouped
    out = poisson_bootstrap_ci(df.withColumn("x", F.lit(5)), "x", "doc_id")
    row = out.collect()[0]
    assert row["mean"] == 5.0 and row["lo"] == 5.0 and row["hi"] == 5.0


def test_poisson_bootstrap_rejects_fractional_and_bad_params(spark):
    from otters_spark.operators.sampling import poisson_bootstrap_ci

    df = spark.createDataFrame([(1, 2.5)], "doc_id long, x double")
    with pytest.raises(ValueError, match="integral"):
        poisson_bootstrap_ci(df, "x", "doc_id")
    good = spark.createDataFrame([(1, 2)], "doc_id long, x long")
    with pytest.raises(ValueError, match="alpha"):
        poisson_bootstrap_ci(good, "x", "doc_id", alpha=1.0)
    with pytest.raises(ValueError, match="n_boot"):
        poisson_bootstrap_ci(good, "x", "doc_id", n_boot=2)


def test_poisson_bootstrap_no_long_wrap(spark):
    """Values whose weighted sums pass 2^63 must accumulate exactly
    (decimal cast BEFORE the replicate and point sums, round-6
    hardening): with three docs of n_chars = 2^62 the long sum wraps
    negative in non-ANSI mode, collapsing the mean and the CI bounds;
    the decimal path keeps the point mean at exactly 2^62."""
    from otters_spark.operators.sampling import poisson_bootstrap_ci

    v = 1 << 62
    df = spark.createDataFrame(
        [(1, v, "en"), (2, v, "en"), (3, v, "en")],
        "doc_id long, n_chars long, lang string",
    )
    got = poisson_bootstrap_ci(
        df, "n_chars", "doc_id", ["lang"], n_boot=8, round_to=2
    ).collect()[0]
    assert got["n"] == 3
    assert got["mean"] == float(v)
    # every replicate resamples the same constant, so the CI is tight
    # around it — and neither bound can be the wrapped negative value
    assert got["lo"] == float(v) and got["hi"] == float(v)
