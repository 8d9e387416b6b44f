"""HTML table extraction (operators/tables.py)."""

from serd_spark.operators.tables import (
    extract_tables,
    synthesize_table_pages,
)


def _extract(spark, html):
    df = spark.createDataFrame(
        [(0, html)], "tbl_id long, html string"
    )
    return sorted(
        (
            r["t_idx"], r["r_idx"], r["c_idx"], r["is_header"],
            r["cell"],
        )
        for r in extract_tables(df).collect()
    )


def test_headers_entities_and_tags(spark):
    html = (
        "<table><tr><th>A &amp; B</th><th>C</th></tr>"
        "<tr><td><b>1</b></td><td><a href='/x'>2</a></td></tr></table>"
    )
    assert _extract(spark, html) == [
        (0, 0, 0, True, "A & B"),
        (0, 0, 1, True, "C"),
        (0, 1, 0, False, "1"),
        (0, 1, 1, False, "2"),
    ]


def test_empty_rows_and_tablefree_pages_emit_nothing(spark):
    assert _extract(spark, "<p>no tables</p>") == []
    assert _extract(spark, "<table><tr></tr></table>") == []


def test_whitespace_collapse_and_multi_table(spark):
    html = (
        "<table>\n <tr>\n  <td> a\n   b </td>\n </tr>\n</table>"
        "<table><tr><td>x</td></tr></table>"
    )
    assert _extract(spark, html) == [
        (0, 0, 0, False, "a b"),
        (1, 0, 0, False, "x"),
    ]


def test_nested_table_scope_rule(spark):
    # documented scope: the outer block ends at the FIRST </table>,
    # so the inner cell is captured and the trailing outer cell is
    # dropped — deterministic, documented divergence
    html = (
        "<table><tr><td>o1<table><tr><td>i1</td></tr></table>"
        "</td></tr></table>"
    )
    got = _extract(spark, html)
    assert got == [(0, 0, 0, False, "o1i1")]


def test_generator_declared_counts_match_extraction(spark):
    src = synthesize_table_pages(spark, 70)
    from serd_spark.operators.tables import cells_pin
    from pyspark.sql import functions as F

    ex = extract_tables(src)
    agg = ex.groupBy("tbl_id").agg(
        F.count(F.lit(1)).cast("long").alias("x_cells"),
        cells_pin(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct("t_idx", "r_idx", "c_idx", "cell")
                    )
                ),
                lambda s: s["cell"],
            )
        ).alias("x_pin"),
    )
    j = src.join(agg, "tbl_id", "left").select(
        "tbl_id", "variant", "n_cells", "x_cells", "pin", "x_pin"
    )
    for r in j.collect():
        assert (r["x_cells"] or 0) == r["n_cells"], r
        assert r["x_pin"] == r["pin"], r
