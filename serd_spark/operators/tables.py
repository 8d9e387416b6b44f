"""HTML <table> extraction — tables to (page, table, row, col, cell)
long form, the training-data op behind table-QA / table-to-text
corpora (and the tabular cousin of the RDF island extractors: pull
structured data out of page markup into a relational shape).

The whole extractor is pure JVM — three chained
``regexp_extract_all`` + ``posexplode`` stages (table blocks → row
blocks → cells) and a codegen cleanup chain (tag strip, the five
basic entity decodes with ``&amp;`` LAST, whitespace collapse). Zero
Python crossings, map-only: at 100 TB it fuses into the page scan
exactly like the sniffers. Scope, documented: non-greedy block
matching means NESTED tables resolve as the outer block ending at
the first ``</table>`` (nested tables are vanishingly rare in text
corpora and usually layout, not data); ``colspan``/``rowspan`` are
ignored — ``col_idx`` is positional.

Certificate (mm_probe / sniff pattern): ``synthesize_table_pages``
declares per-page ground truth (table/row/cell counts and an md5
content pin over the expected cleaned cells in row-major order),
then renders HTML to match across 7 variants — plain, <th> headers,
messy whitespace + attributes, entity escapes, inline formatting
tags, table-free pages, multi-table pages. The Spark query recovers
the counts and pin from the MARKUP alone; the DuckDB oracle
aggregates only declared columns.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["extract_tables", "synthesize_table_pages", "cells_pin"]

_BLOCK = r"(?s)<table[^>]*>(.*?)</table>"
_ROW = r"(?s)<tr[^>]*>(.*?)</tr>"
_CELL_KIND = r"(?s)<t([dh])[^>]*>.*?</t[dh]>"
_CELL_BODY = r"(?s)<t[dh][^>]*>(.*?)</t[dh]>"


def _clean(col: Column) -> Column:
    """Tag strip + basic entity decode + whitespace collapse — the
    published cell-text rule the generator mirrors in Python."""
    c = F.regexp_replace(col, r"<[^>]+>", "")
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),  # last, so &amp;lt; decodes to &lt;
    ):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def extract_tables(
    df: DataFrame, id_col: str = "tbl_id", html_col: str = "html"
) -> DataFrame:
    """``(id_col, t_idx, r_idx, c_idx, is_header, cell)`` — one row
    per cell, 0-based positional indexes, ``is_header`` true for
    ``<th>`` cells. Pages/rows without cells emit nothing (an empty
    ``<tr></tr>`` is not a data row)."""
    t = df.select(
        F.col(id_col),
        F.posexplode(
            F.regexp_extract_all(F.col(html_col), F.lit(_BLOCK), 1)
        ).alias("t_idx", "_tbl"),
    )
    r = t.select(
        id_col,
        "t_idx",
        F.posexplode(
            F.regexp_extract_all(F.col("_tbl"), F.lit(_ROW), 1)
        ).alias("r_idx", "_row"),
    )
    # kinds and bodies come from the SAME match positions (identical
    # pattern shape), so the zipped arrays always align
    c = r.select(
        id_col,
        "t_idx",
        "r_idx",
        F.posexplode(
            F.arrays_zip(
                F.regexp_extract_all(
                    F.col("_row"), F.lit(_CELL_KIND), 1
                ).alias("kind"),
                F.regexp_extract_all(
                    F.col("_row"), F.lit(_CELL_BODY), 1
                ).alias("body"),
            )
        ).alias("c_idx", "_cell"),
    )
    return c.select(
        id_col,
        "t_idx",
        "r_idx",
        "c_idx",
        (F.col("_cell.kind") == "h").alias("is_header"),
        _clean(F.col("_cell.body")).alias("cell"),
    )


def cells_pin(cells: Column) -> Column:
    """Content pin over an array of cell strings (row-major order):
    first 10 md5 hex digits as a bigint — mirrored by the
    generator's Python ``_pin``."""
    return F.conv(
        F.substring(
            F.md5(F.array_join(cells, "\u0001")), 1, 10
        ),
        16,
        10,
    ).cast("long")


def _pin(cells: list[str]) -> int:
    return int(
        hashlib.md5("\u0001".join(cells).encode("utf-8")).hexdigest()[
            :10
        ],
        16,
    )


def _render(i: int) -> tuple[str, str, int, int, int, int | None]:
    """(html, variant, n_tables, n_rows, n_cells, pin)."""
    v = i % 7
    if v == 5:
        html = f"<html><body><p>No tables on page {i}.</p></body></html>"
        return html, "no_table", 0, 0, 0, None

    def cell_text(t: int, r: int, c: int) -> str:
        if v == 3:
            return f'c{t}.{r}.{c} <a&"b> & ünïcode'
        return f"cell {i}-{t}-{r}-{c}"

    def cell_markup(t: int, r: int, c: int, tag: str) -> str:
        if v == 3:
            body = (
                f"c{t}.{r}.{c} &lt;a&amp;&quot;b&gt; &amp; ünïcode"
            )
        elif v == 4:
            body = (
                f'<b><a href="/x?t={t}">cell {i}-{t}-{r}-{c}</a></b>'
            )
        else:
            body = f"cell {i}-{t}-{r}-{c}"
        attrs = ' class="z" data-k="1"' if v == 2 else ""
        return f"<{tag}{attrs}>{body}</{tag}>"

    n_tables = 2 if v == 6 else 1
    variant = [
        "plain", "th_header", "messy_ws", "entities", "inline_tags",
        "no_table", "multi_table",
    ][v]
    parts = [f"<html><body><h1>Page {i}</h1>"]
    cells: list[str] = []
    total_rows = 0
    total_cells = 0
    for t in range(n_tables):
        n_r = 2 + (i + t) % 3
        n_c = 2 + i % 2
        sep = "\n   " if v == 2 else ""
        tattr = ' border="1"' if v == 2 else ""
        parts.append(f"<table{tattr}>{sep}")
        for r in range(n_r):
            tag = "th" if (v == 1 and r == 0) else "td"
            row = "".join(
                cell_markup(t, r, c, tag) for c in range(n_c)
            )
            parts.append(f"<tr>{sep}{row}{sep}</tr>{sep}")
            cells.extend(cell_text(t, r, c) for c in range(n_c))
            total_rows += 1
            total_cells += n_c
        parts.append("</table>")
    parts.append("</body></html>")
    return (
        "".join(parts),
        variant,
        n_tables,
        total_rows,
        total_cells,
        _pin(cells),
    )


def synthesize_table_pages(
    spark, n_rows: int, seed: int = 42, partitions: int = 8
) -> DataFrame:
    """Deterministic table-page corpus with declared ground truth:
    ``(tbl_id, html, variant, n_tables, n_rows, n_cells, pin)``.
    ``seed`` is accepted for signature parity with the other
    generators; content is a pure function of the row id."""
    del seed
    base = spark.range(0, n_rows, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {
                "tbl_id": [], "html": [], "variant": [],
                "n_tables": [], "n_rows": [], "n_cells": [], "pin": [],
            }
            for i in pdf["id"]:
                i = int(i)
                html, variant, nt, nr, nc, pin = _render(i)
                cols["tbl_id"].append(i)
                cols["html"].append(html)
                cols["variant"].append(variant)
                cols["n_tables"].append(nt)
                cols["n_rows"].append(nr)
                cols["n_cells"].append(nc)
                cols["pin"].append(pin)
            yield pd.DataFrame(
                {
                    "tbl_id": pd.Series(cols["tbl_id"], dtype="int64"),
                    "html": pd.Series(cols["html"], dtype=object),
                    "variant": pd.Series(cols["variant"], dtype=object),
                    "n_tables": pd.Series(
                        cols["n_tables"], dtype="int64"
                    ),
                    "n_rows": pd.Series(cols["n_rows"], dtype="int64"),
                    "n_cells": pd.Series(
                        cols["n_cells"], dtype="int64"
                    ),
                    "pin": pd.Series(cols["pin"], dtype="Int64"),
                }
            )

    return base.mapInPandas(
        gen,
        schema=(
            "tbl_id long, html string, variant string, n_tables long, "
            "n_rows long, n_cells long, pin long"
        ),
    )
