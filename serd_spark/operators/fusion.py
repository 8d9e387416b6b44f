"""Truth discovery / fact fusion over multi-source claims — the KG
construction step that resolves CONFLICTING extractions ("source A
says Berlin, source B says Bonn") into one asserted object per
(subject, predicate), in the TruthFinder / Knowledge-Vault family:
source reliability and claim confidence reinforce each other over a
few fixed-point rounds, then the highest-confidence object wins.

Upstream serd has no fusion stage (it is a single-document
serializer); this is part of the pipeline layer the brief adds on
top — the step between extraction (many pages asserting triples)
and the published KG (one value per functional attribute).

Determinism across engines: the classic formulation is a float
fixpoint (cosine-ish trust scores), which no two engines sum in the
same order. Everything here is INTEGER MICROS with floor division
(DIV in Spark SQL, // in DuckDB), so every round is a pure integer
function of the claim table and the DuckDB oracle replays all
rounds bit-for-bit as chained CTEs:

  vote(s,p,o)   = SUM(trust(src)) over sources asserting (s,p,o)
  conf(s,p,o)   = vote * 1e6 DIV SUM(vote) over the (s,p) group
  trust(src)    = SUM(conf of src's claims) DIV n_claims(src)

with trust initialised to 500000 (0.5) for every source. Winner per
(s,p) = max conf, ties by min obj string (a distributed engine must
pin the tie; documented).

Scale shape (100 TB): the trust table is #sources rows — broadcast
on every round; the claim table shuffles on (s,p,o) for the vote
aggregate and on source for the trust update, both partial-combined
map-side. Rounds are a small constant (3 by default — TruthFinder
converges in a handful), and trust is localCheckpointed per round so
the lineage and the broadcast plan stay bounded. No driver collect
anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TRUST_UNIT = 1_000_000  # full confidence, in micros
INIT_TRUST = TRUST_UNIT // 2


def _clean_claims(
    claims: DataFrame, subj: str, pred: str, obj: str, source: str
) -> DataFrame:
    """Project to canonical names, drop NULL components, and dedup —
    a source asserting the same fact twice counts once."""
    return (
        claims.select(
            F.col(source).alias("src"),
            F.col(subj).alias("subj"),
            F.col(pred).alias("pred"),
            F.col(obj).alias("obj"),
        )
        .where(
            F.col("src").isNotNull()
            & F.col("subj").isNotNull()
            & F.col("pred").isNotNull()
            & F.col("obj").isNotNull()
        )
        .distinct()
        .localCheckpoint(eager=False)
    )


def _rounds(c: DataFrame, n_iter: int):
    """Run the trust/confidence fixpoint; returns (conf, trust) after
    ``n_iter`` rounds. ``conf`` is (subj, pred, obj, conf_micros),
    ``trust`` is (src, trust_micros). A (s,p) group whose asserting
    sources have all decayed to trust 0 keeps a total of at least 1
    micro (GREATEST(tot, 1)) so the division is defined; confidences
    are then 0 and the caller's tie-break decides."""
    src_n = c.groupBy("src").agg(F.count("*").cast("long").alias("n_claims"))
    trust = src_n.select(
        "src", F.lit(INIT_TRUST).cast("long").alias("trust_micros")
    )
    conf = None
    for _ in range(n_iter):
        vote = (
            c.join(F.broadcast(trust), "src")
            .groupBy("subj", "pred", "obj")
            .agg(F.sum("trust_micros").cast("long").alias("vote"))
        )
        tot = vote.groupBy("subj", "pred").agg(
            F.greatest(F.sum("vote").cast("long"), F.lit(1).cast("long")).alias(
                "tot"
            )
        )
        conf = vote.join(tot, ["subj", "pred"]).select(
            "subj",
            "pred",
            "obj",
            F.expr(f"(vote * {TRUST_UNIT}) DIV tot")
            .cast("long")
            .alias("conf_micros"),
        )
        trust = (
            c.join(conf, ["subj", "pred", "obj"])
            .groupBy("src")
            .agg(F.sum("conf_micros").cast("long").alias("s"))
            .join(F.broadcast(src_n), "src")
            .select(
                "src",
                F.expr("s DIV n_claims").cast("long").alias("trust_micros"),
            )
            .localCheckpoint(eager=False)
        )
    return conf, trust


def fact_fusion(
    claims: DataFrame,
    n_iter: int = 3,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    source: str = "source",
) -> DataFrame:
    """Resolve conflicting claims; returns one row per (subj, pred):
    ``(subj, pred, obj, conf_micros, n_src)`` — the winning object,
    its confidence in micros, and how many sources asserted it."""
    c = _clean_claims(claims, subj, pred, obj, source)
    conf, _ = _rounds(c, n_iter)
    n_src = c.groupBy("subj", "pred", "obj").agg(
        F.count("*").cast("long").alias("n_src")
    )
    ranked = conf.join(n_src, ["subj", "pred", "obj"]).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("subj", "pred").orderBy(
                F.col("conf_micros").desc(), F.col("obj").asc()
            )
        ),
    )
    return ranked.where(F.col("rn") == 1).select(
        "subj", "pred", "obj", "conf_micros", "n_src"
    )


def source_trust(
    claims: DataFrame,
    n_iter: int = 3,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    source: str = "source",
) -> DataFrame:
    """The converged per-source reliability table from the same
    rounds — (src, trust_micros). Pure function of the claim table;
    shares every arithmetic step with ``fact_fusion``."""
    c = _clean_claims(claims, subj, pred, obj, source)
    _, trust = _rounds(c, n_iter)
    return trust
