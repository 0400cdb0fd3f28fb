"""PII detection/redaction semantics on crafted strings."""

from otters_spark.operators.pii import pii_features, pii_scrub


def test_pii_counts_and_masking(spark):
    rows = [
        (0, "mail a@b.com and c.d+x@sub.example.org ok"),
        (1, "call 555-867-5309 or 555.123.4567"),
        (2, "host 10.0.0.7 peer 192.168.1.254"),
        (3, "clean text with no secrets at all"),
        (4, "mixed a@b.io 555-000-1111 127.0.0.1"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    feats = {r["doc_id"]: r for r in pii_features(df).collect()}
    assert feats[0]["n_email"] == 2 and feats[0]["n_pii"] == 2
    assert feats[1]["n_phone"] == 2
    assert feats[2]["n_ipv4"] == 2
    assert feats[3]["n_pii"] == 0
    assert feats[4]["n_pii"] == 3

    out = {r["doc_id"]: r["clean_text"] for r in pii_scrub(df).collect()}
    assert out[0] == "mail <EMAIL> and <EMAIL> ok"
    assert out[1] == "call <PHONE> or <PHONE>"
    assert out[2] == "host <IP> peer <IP>"
    assert out[3] == rows[3][1]  # untouched
    assert out[4] == "mixed <EMAIL> <PHONE> <IP>"


def test_pii_order_no_half_eaten_email(spark):
    # digits-and-dots inside an email must not be re-matched as an IP
    # after the email placeholder lands (emails are applied first)
    df = spark.createDataFrame([(0, "u 10.0.0.7@example.com v")], ["doc_id", "text"])
    r = pii_scrub(df).collect()[0]
    assert r["clean_text"] == "u <EMAIL> v"
    assert r["n_email"] == 1
