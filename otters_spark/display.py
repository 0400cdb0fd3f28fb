"""ASCII table rendering for heads, query results, and stats.

Parity with the reference's display module (src/display.rs:11-249):
same box-drawing shape (``+---+`` separators, space-padded cells),
same column order (``index, score, <name-sorted meta columns>``,
src/display.rs:166-167), same cell formats (floats ``%.4f``, scores
``%.6f``, NULLs as ``NULL``, datetimes ``%Y-%m-%d %H:%M:%S UTC``).
Pure driver-side string work over already-collected rows — never feed
it an uncollected DataFrame at scale.
"""

from __future__ import annotations

import datetime as dt
from typing import Any, Sequence

__all__ = [
    "AsciiTable",
    "format_cell",
    "format_result",
    "format_head",
    "format_build_stats",
    "format_query_stats",
]


class AsciiTable:
    """Minimal ASCII table (src/display.rs:12-98)."""

    def __init__(
        self,
        headers: Sequence[str],
        rows: Sequence[Sequence[str]],
        title: str | None = None,
    ):
        self.headers = list(headers)
        self.rows = [list(r) for r in rows]
        self.title = title

    def with_title(self, title: str) -> "AsciiTable":
        self.title = title
        return self

    def render(self) -> str:
        if not self.headers:
            return ""
        n = len(self.headers)
        widths = [len(h) for h in self.headers]
        for row in self.rows:
            for i, cell in enumerate(row[:n]):
                widths[i] = max(widths[i], len(cell))
        sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"

        def line(cells: Sequence[str]) -> str:
            padded = [
                f" {cells[i] if i < len(cells) else ''}"
                f"{' ' * (widths[i] - len(cells[i] if i < len(cells) else '') + 1)}"
                for i in range(n)
            ]
            return "|" + "|".join(padded) + "|"

        out = [] if self.title is None else [self.title]
        out += [sep, line(self.headers), sep]
        out += [line(r) for r in self.rows]
        out.append(sep)
        return "\n".join(out)

    def __str__(self) -> str:
        return self.render()


def format_cell(value: Any) -> str:
    """One cell (src/display.rs:101-123): NULL marker, %.4f floats,
    UTC-rendered datetimes, str() for the rest."""
    if value is None:
        return "NULL"
    if isinstance(value, float):
        return f"{value:.4f}"
    if isinstance(value, dt.datetime):
        return value.strftime("%Y-%m-%d %H:%M:%S UTC")
    return str(value)


def format_result(rows: Sequence[Any], id_col: str = "vec_id") -> str:
    """Collected query-result rows → the reference's result table
    (src/display.rs:164-187): ``index`` (the row id), ``score`` at 6
    decimals, then every other column in the rows' order (the plan
    already emits metadata name-sorted, src/meta.rs:723-724)."""
    if not rows:
        return AsciiTable(["index", "score"], []).render()
    first = rows[0].asDict() if hasattr(rows[0], "asDict") else dict(rows[0])
    meta_cols = [c for c in first if c not in (id_col, "score")]
    headers = ["index", "score", *meta_cols]
    body = []
    for r in rows:
        d = r.asDict() if hasattr(r, "asDict") else dict(r)
        body.append(
            [str(d[id_col]), f"{d['score']:.6f}", *[format_cell(d[c]) for c in meta_cols]]
        )
    return AsciiTable(headers, body).render()


def format_head(store, n: int = 5) -> str:
    """MetaStore head as an ASCII table (src/display.rs:126-162):
    title ``MetaStore • rows=… • chunks=…``, ``index`` first, then
    name-sorted columns."""
    cols = sorted(c for c in store.df.columns if not c.startswith("__"))
    collected = store.df.select(*cols).limit(n).collect()
    rows = [
        [str(i), *[format_cell(r[c]) for c in cols]] for i, r in enumerate(collected)
    ]
    title = (
        f"MetaStore • rows={store.count()} • chunks={store.df.rdd.getNumPartitions()}"
    )
    return AsciiTable(["index", *cols], rows, title=title).render()


def format_build_stats(stats) -> str:
    """BuildStats → metric/value table (src/display.rs:197-219)."""
    rows = [
        ["rows", str(stats.rows)],
        ["chunks", str(stats.chunks)],
        ["build_total_ms", f"{stats.elapsed_sec * 1000.0:.3f}"],
    ]
    return AsciiTable(["metric", "value"], rows, title="MetaStore Build Stats").render()


def format_query_stats(stats) -> str:
    """QueryStats → metric/value table with the reference's four-phase
    timing split (src/display.rs:222-249: prune_ms/score_ms/merge_ms/
    total_ms). Phase rows are summed task milliseconds recovered from
    the executed plan's SQLMetrics (see QueryStats); ``n/a`` when the
    plan internals were unreachable."""

    def opt(v: Any) -> str:
        return "n/a" if v is None else str(v)

    def ms(v: Any) -> str:
        return "n/a" if v is None else f"{v * 1000.0:.3f}"

    total = (
        None
        if stats.evaluated_chunks is None or stats.pruned_chunks is None
        else stats.evaluated_chunks + stats.pruned_chunks
    )
    rows = [
        ["total_chunks", opt(total)],
        ["pruned_chunks", opt(stats.pruned_chunks)],
        ["evaluated_chunks", opt(stats.evaluated_chunks)],
        ["vectors_compared", str(stats.vectors_compared)],
        ["rows_after_filters", str(stats.rows_after_filters)],
        ["result_rows", str(stats.result_rows)],
        ["prune_ms", ms(stats.prune_sec)],
        ["score_ms", ms(stats.score_sec)],
        ["merge_ms", ms(stats.merge_sec)],
        ["total_ms", f"{stats.elapsed_sec * 1000.0:.3f}"],
    ]
    return AsciiTable(["metric", "value"], rows, title="Last Meta Query Stats").render()
