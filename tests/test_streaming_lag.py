"""Replay test for the streaming lag monitor: deterministic simulated
arrival times let the per-batch log be recomputed driver-side."""

import glob
import os
import shutil
import time

import pytest
from pyspark.sql import functions as F


def test_lag_monitor_replay_matches_reference(spark, tmp_path):
    from otters_spark.streaming.lag import lag_report, streaming_lag_monitor

    # three micro-batches; arrival = event + fixed per-row lag, with
    # one very late straggler in batch 2 (event time far behind)
    batches = [
        [("a", "2024-01-01 10:00:00", "2024-01-01 10:00:05"),
         ("a", "2024-01-01 10:00:30", "2024-01-01 10:00:31"),
         ("b", "2024-01-01 10:00:10", "2024-01-01 10:02:10")],
        [("a", "2024-01-01 10:01:00", "2024-01-01 10:01:02"),
         ("a", "2024-01-01 09:49:00", "2024-01-01 10:01:30"),  # straggler
         ("b", "2024-01-01 10:01:20", "2024-01-01 10:01:21")],
        [("b", "2024-01-01 09:30:00", "2024-01-01 10:02:00"),  # very late
         ("a", "2024-01-01 10:02:00", "2024-01-01 10:02:01")],
    ]
    schema = "k string, ts timestamp, arrived timestamp"
    flat = tmp_path / "flat"
    flat.mkdir()
    now = time.time()
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(
            [(k, t, a) for k, t, a in rows], "k string, ts string, arrived string"
        ).select(
            "k",
            F.col("ts").cast("timestamp"),
            F.col("arrived").cast("timestamp"),
        )
        d = tmp_path / f"b{i}"
        df.coalesce(1).write.parquet(str(d))
        dst = flat / f"{i:02d}.parquet"
        shutil.copy(glob.glob(str(d / "part-*.parquet"))[0], dst)
        os.utime(dst, (now + i, now + i))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(flat))
    )
    log_path = str(tmp_path / "laglog")
    q = (
        streaming_lag_monitor(
            stream,
            log_path,
            ["k"],
            ts_col="ts",
            candidate_delays_s=[60, 600],
            processing_ts_col="arrived",
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # ---- driver-side recomputation of the same batch sequence ----
    from datetime import datetime

    def us(s):
        return int(datetime.fromisoformat(s).timestamp() * 1e6)

    seen_max = None
    want = {}  # (batch, k) -> dict
    for i, rows in enumerate(batches):
        per_key = {}
        for k, t, a in rows:
            e, p = us(t), us(a)
            d = per_key.setdefault(
                k, {"n": 0, "sum": 0, "mn": None, "mx": None, "me": None,
                    "d60": 0, "d600": 0}
            )
            d["n"] += 1
            d["sum"] += p - e
            d["mn"] = p - e if d["mn"] is None else min(d["mn"], p - e)
            d["mx"] = p - e if d["mx"] is None else max(d["mx"], p - e)
            d["me"] = e if d["me"] is None else max(d["me"], e)
            if seen_max is not None:
                if e < seen_max - 60 * 1_000_000:
                    d["d60"] += 1
                if e < seen_max - 600 * 1_000_000:
                    d["d600"] += 1
        for k, d in per_key.items():
            want[(i, k)] = d
        batch_max = max(us(t) for _, t, _ in rows)
        seen_max = batch_max if seen_max is None else max(seen_max, batch_max)

    got = {
        (r["batch_id"], r["k"]): r
        for r in spark.read.parquet(log_path).collect()
    }
    assert set(got) == set(want)
    for key, d in want.items():
        r = got[key]
        assert r["n_rows"] == d["n"]
        assert r["sum_lag_micros"] == d["sum"]
        assert r["min_lag_micros"] == d["mn"]
        assert r["max_lag_micros"] == d["mx"]
        assert r["max_event_micros"] == d["me"]
        assert r["dropped_at_60s"] == d["d60"]
        assert r["dropped_at_600s"] == d["d600"]

    # the report: key b saw the 30-min straggler; a 60s watermark
    # would have dropped it, the 600s one too (1800s late vs batch-2 max)
    rep = {r["k"]: r for r in lag_report(
        spark, log_path, ["k"], candidate_delays_s=[60, 600]
    ).collect()}
    assert rep["b"]["drop_frac_at_60s"] > 0
    assert rep["a"]["n_rows"] == 5 and rep["b"]["n_rows"] == 3
