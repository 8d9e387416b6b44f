"""Entity canonicalization: RFC 3986 URI normalization + graph-level
dedup — the "salted-hash entity canonicalization (URI normalization
per RFC 3986, as in serd_uri_resolve)" stage of
``BASELINE.json:north_star`` (reference algorithm surface: ref:
src/uri.c#serd_uri_resolve / serd_uri_serialise).

Vectorized: one pandas UDF over IRI columns with a per-batch memo —
web-scale IRI columns are extremely repetitive (hosts, vocabulary
IRIs), so the memo turns ~millions of normalize calls per batch into
~thousands.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from serd_spark.rdf.model import IRI
from serd_spark.rdf.uri import normalize

TRIPLE_KEY = ["g", "s", "s_kind", "p", "o", "o_kind", "o_dt", "o_lang"]


# StringType() (not the DDL string "string") keeps this importable
# without an active SparkSession
@pandas_udf(StringType())
def normalize_iri(col: pd.Series) -> pd.Series:
    memo: dict[str, str] = {}

    def norm(v):
        if v is None or v == "":
            return v
        out = memo.get(v)
        if out is None:
            try:
                out = normalize(v)
            except Exception:
                out = v  # never fail the batch on one weird IRI
            memo[v] = out
        return out

    return col.map(norm)


def canonicalize_triples(triples: DataFrame) -> DataFrame:
    """Normalize every IRI-kind column; literals pass through
    untouched (lexical forms are never reinterpreted — SURVEY.md
    §1.2)."""
    iri_kind = F.lit(IRI)
    return (
        triples.withColumn(
            "s",
            F.when(F.col("s_kind") == iri_kind, normalize_iri("s")).otherwise(
                F.col("s")
            ),
        )
        .withColumn("p", normalize_iri("p"))
        .withColumn(
            "o",
            F.when(F.col("o_kind") == iri_kind, normalize_iri("o")).otherwise(
                F.col("o")
            ),
        )
        .withColumn(
            "g",
            F.when(F.col("g") != "", normalize_iri("g")).otherwise(F.col("g")),
        )
    )


def dedup_triples(triples: DataFrame) -> DataFrame:
    """Graph-level exact dedup on the full quad key. One shuffle;
    map-side partial aggregation makes it cheap when duplicates are
    local (they are: duplicates come from re-crawls and repeated
    islands)."""
    return triples.dropDuplicates(TRIPLE_KEY + ["url"])
