"""ASCII renderers: reference-shaped snapshots (src/display.rs:11-249)."""

import datetime as dt

import pytest

from otters_spark.display import (
    AsciiTable,
    format_build_stats,
    format_cell,
    format_query_stats,
    format_result,
)


def test_ascii_table_snapshot():
    t = AsciiTable(["a", "long_header"], [["1", "x"], ["22", "yy"]], title="T")
    assert t.render() == "\n".join(
        [
            "T",
            "+----+-------------+",
            "| a  | long_header |",
            "+----+-------------+",
            "| 1  | x           |",
            "| 22 | yy          |",
            "+----+-------------+",
        ]
    )


def test_format_cell():
    assert format_cell(None) == "NULL"
    assert format_cell(1.25) == "1.2500"
    assert format_cell(7) == "7"
    assert format_cell(dt.datetime(2024, 1, 2, 3, 4, 5)) == "2024-01-02 03:04:05 UTC"


def test_result_table(spark):
    from otters_spark import MetaStore, col

    rows = [(0, [1.0, 0.0], "b-label"), (1, [0.6, 0.8], "a-label")]
    store = MetaStore.from_df(
        spark.createDataFrame(rows, "vec_id long, embedding array<float>, name string"),
        vec_col="embedding",
    )
    got = format_result(
        store.query([1.0, 0.0], "cosine").take(2).collect(), store.id_col
    )
    lines = got.splitlines()
    # header: index, score, then name-sorted meta columns
    assert lines[1].split() == "| index | score | name |".split()
    assert "| 0" in lines[3] and "1.000000" in lines[3] and "b-label" in lines[3]


def test_stats_tables(spark):
    from otters_spark.plan import QueryStats
    from otters_spark.store import BuildStats

    b = format_build_stats(BuildStats(rows=10, chunks=2, elapsed_sec=0.5))
    assert b.startswith("MetaStore Build Stats")
    assert "| rows           | 10      |" in b
    q = format_query_stats(
        QueryStats(
            5, 5, 3, 2, 0.1,
            evaluated_chunks=1, pruned_chunks=9,
            prune_sec=0.001, score_sec=0.08, merge_sec=0.0105,
        )
    )
    assert "| total_chunks       | 10" in q
    assert "| pruned_chunks      | 9" in q
    # the reference's four phase rows, in its order and ms format
    # (src/display.rs:222-249)
    for want in (
        "| prune_ms           | 1.000",
        "| score_ms           | 80.000",
        "| merge_ms           | 10.500",
        "| total_ms           | 100.000",
    ):
        assert want in q, q
    assert q.index("prune_ms") < q.index("score_ms") < q.index("merge_ms") < q.index("total_ms")
    # in-memory store: chunk rows render n/a
    q2 = format_query_stats(QueryStats(5, 5, 3, 2, 0.1))
    assert "n/a" in q2


def test_store_printers(spark, capsys):
    from otters_spark import MetaStore

    store = MetaStore.from_df(
        spark.createDataFrame(
            [(0, [1.0, 0.0], 3)], "vec_id long, embedding array<float>, label long"
        ),
        vec_col="embedding",
    )
    store.show_head(1)
    store.print_stats()
    out = capsys.readouterr().out
    assert "MetaStore • rows=1" in out
    assert "| index | embedding" in out  # name-sorted columns, index first
    assert "No build stats available" in out
    assert "No query stats available" in out

    _, stats = store.query([1.0, 0.0], "cosine").take(1).collect_with_stats()
    store.print_last_query_stats()
    out = capsys.readouterr().out
    assert "Last Meta Query Stats" in out
    # live plans must actually yield the phase split (not n/a): the
    # SQLMetrics walk found the scan / codegen / merge operators
    assert stats.score_sec is not None and stats.score_sec >= 0
    assert stats.prune_sec is not None and stats.merge_sec is not None
    assert "| score_ms" in out and "| prune_ms" in out
    assert "| prune_ms           | n/a" not in out
    # unit guard: prune/score come from MILLISECOND SQLMetrics, so the
    # values must be whole milliseconds — a nanosecond mis-scaling
    # (the round-5 review catch) would make any nonzero value
    # fractional at the 1e-6 ms scale
    for v in (stats.prune_sec, stats.score_sec):
        ms = v * 1000.0
        assert abs(ms - round(ms)) < 1e-9, v
