"""VoID dataset description (W3C Vocabulary of Interlinked Datasets)
— the self-describing metadata graph a published KG ships alongside
its triples: dataset-level statistics (void:triples,
void:distinctSubjects/Objects, void:properties, void:classes) plus
one void:propertyPartition per predicate. serd-world flavor: the
output IS RDF (an (s, p, o) DataFrame in canonical encoding), so it
feeds the NT/Turtle writers and the SPARQL compiler directly.

100 TB shape: three aggregates over the triple table (one full-table
roll-up, one bounded-key per-predicate roll-up, one rdf:type-filtered
distinct) — all map-side-combining hash aggs; the output graph is
vocabulary-sized (tens of rows). Counts are canonical xsd:integer
lexical forms, so the whole description is a pure deterministic
function of the graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
VOID = "http://rdfs.org/ns/void#"


def void_describe(triples: DataFrame, dataset_iri: str) -> DataFrame:
    """Triple table → the VoID description graph (s, p, o strings;
    counts as canonical integer literals). Partition IRIs are
    ``dataset_iri + '/prop/' + md5(predicate)`` — deterministic and
    collision-safe for any predicate string."""
    d = F.lit(dataset_iri)

    def lit_count(c):
        return c.cast("long").cast("string")

    totals = triples.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("s").alias("ns"),
        F.count_distinct("o").alias("no"),
        F.count_distinct("p").alias("np"),
    ).select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(VOID + "triples").alias("p"),
                    lit_count(F.col("n")).alias("o"),
                ),
                F.struct(
                    F.lit(VOID + "distinctSubjects").alias("p"),
                    lit_count(F.col("ns")).alias("o"),
                ),
                F.struct(
                    F.lit(VOID + "distinctObjects").alias("p"),
                    lit_count(F.col("no")).alias("o"),
                ),
                F.struct(
                    F.lit(VOID + "properties").alias("p"),
                    lit_count(F.col("np")).alias("o"),
                ),
            )
        ).alias("e")
    ).select(d.alias("s"), F.col("e.p").alias("p"), F.col("e.o").alias("o"))

    classes = (
        triples.filter(F.col("p") == RDF_TYPE)
        .agg(F.count_distinct("o").alias("nc"))
        .select(
            d.alias("s"),
            F.lit(VOID + "classes").alias("p"),
            lit_count(F.col("nc")).alias("o"),
        )
    )

    type_row = triples.limit(1).select(
        d.alias("s"),
        F.lit(RDF_TYPE).alias("p"),
        F.lit(VOID + "Dataset").alias("o"),
    )

    part_iri = F.concat(d, F.lit("/prop/"), F.md5("p"))
    per_prop = triples.groupBy("p").agg(
        F.count(F.lit(1)).alias("n")
    )
    partitions = per_prop.select(
        F.explode(
            F.array(
                F.struct(
                    d.alias("s"),
                    F.lit(VOID + "propertyPartition").alias("p"),
                    part_iri.alias("o"),
                ),
                F.struct(
                    part_iri.alias("s"),
                    F.lit(VOID + "property").alias("p"),
                    F.col("p").alias("o"),
                ),
                F.struct(
                    part_iri.alias("s"),
                    F.lit(VOID + "triples").alias("p"),
                    lit_count(F.col("n")).alias("o"),
                ),
            )
        ).alias("e")
    ).select("e.s", "e.p", "e.o")

    return type_row.unionByName(totals).unionByName(classes).unionByName(
        partitions
    )
