"""The at-scale state-store claim from SCALE.md, exercised: streaming
sessionization runs on the RocksDB state store provider (off-heap
state, the 100TB-scale configuration) and produces the same result as
the default provider."""

import pytest

from otters_spark.streaming.events import sessionize, stream_events
from otters_spark.suite import load_events

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def test_sessionize_on_rocksdb_state_store(spark, sf_dir):
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    try:
        agg = sessionize(stream_events(spark, sf_dir), gap="30 minutes", watermark="1 hour")
        q = (
            agg.writeStream.format("memory")
            .queryName("t_rocks")
            .outputMode("complete")
            .start()
        )
        try:
            q.processAllAvailable()
            progress = q.lastProgress
        finally:
            q.stop()
        # the query ran with stateful operators under the RocksDB provider
        assert progress["stateOperators"], "no stateful operator in progress"
        assert (
            spark.conf.get("spark.sql.streaming.stateStore.providerClass") == ROCKSDB
        )
        got = spark.table("t_rocks").count()
        want = sessionize(load_events(spark, sf_dir), gap="30 minutes").count()
        assert got == want
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
