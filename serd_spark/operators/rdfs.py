"""RDFS forward-chaining entailment over the extracted triple table —
the schema-inference step of KG construction (serd itself stops at
syntax; every downstream KG store materializes or query-rewrites the
RDFS closure). Implements the four rules that matter for instance
data: rdfs2 (domain), rdfs3 (range), rdfs9 (type propagation up the
class hierarchy) and rdfs11 (subClassOf transitivity).

Ontology vs instance data — the asymmetry IS the design: the ontology
(subClassOf / domain / range axioms) is driver-side literal data, a
few hundred rows for real vocabularies (schema.org ships ~800
classes), while the instance triples are the 100 TB side. So the
subclass closure is computed driver-side in pure Python over the
axiom list (fixed linear rounds — the identical loop the SQL mirror
replays as chained CTEs), and every ontology join on the Spark side
is an explicit ``F.broadcast``: the triple table is scanned ONCE per
rule, never shuffled on anything but the final (node, cls) distinct —
one shuffle total, with map-side partial dedup for free.

Determinism: pure set algebra on strings — no floats, no ids, no
iteration-order dependence anywhere; the DuckDB mirror replays rules
and closure rounds from the same materialized triples bit-for-bit.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def subclass_closure(
    axioms: Iterable[tuple[str, str]], n_rounds: int = 4
) -> list[tuple[str, str]]:
    """Transitive closure of (sub, sup) axioms by ``n_rounds``
    DOUBLING rounds — closure_r = closure_{r-1} ∪ (closure_{r-1} ⨝
    closure_{r-1}), the pointer-jumping shape from kg_linking's CC:
    round r covers paths up to 2^r edges, so 4 rounds close any
    hierarchy 16 deep (schema.org's is ~6). Fixed rounds (not
    while-changed) so the SQL mirror can replay the identical
    computation; extra rounds are no-ops. Irreflexive: (c, c) pairs
    are never emitted (rdfs9 with a reflexive pair would just re-add
    the asserted type)."""
    closure = {(a, b) for a, b in axioms if a != b}
    for _ in range(n_rounds):
        closure |= {
            (a, d)
            for (a, b) in closure
            for (c, d) in closure
            if b == c and a != d
        }
    return sorted(closure)


def rdfs_entail(
    triples: DataFrame,
    subclass: Sequence[tuple[str, str]],
    domains: Sequence[tuple[str, str]] = (),
    ranges: Sequence[tuple[str, str]] = (),
    n_rounds: int = 4,
    s: str = "s",
    p: str = "p",
    o: str = "o",
) -> DataFrame:
    """Materialize the RDFS type closure of ``triples`` under the
    given ontology. Returns (node, cls, asserted) — every entailed
    rdf:type fact, with asserted = 1 iff the fact was already stated
    in the input (so inferred-only facts are the asserted = 0 rows).

    Scale shape: three base scans of the triple table (type filter,
    domain join, range join — Catalyst merges the pushed p-filters
    into one parquet scan per rule), every ontology join broadcast,
    ONE shuffle at the final (node, cls) distinct. No iteration over
    the big table: rdfs9/rdfs11 collapse into a single broadcast join
    against the precomputed driver-side closure.
    """
    spark = triples.sparkSession
    t = triples.select(
        F.col(s).alias("s"), F.col(p).alias("p"), F.col(o).alias("o")
    )

    asserted = t.filter(F.col("p") == RDF_TYPE).select(
        F.col("s").alias("node"), F.col("o").alias("cls")
    )
    base = asserted
    if domains:
        dom = spark.createDataFrame(list(domains), "pred string, cls string")
        base = base.unionByName(
            t.join(F.broadcast(dom), t.p == dom.pred).select(
                F.col("s").alias("node"), "cls"
            )
        )
    if ranges:
        rng = spark.createDataFrame(list(ranges), "pred string, cls string")
        base = base.unionByName(
            t.join(F.broadcast(rng), t.p == rng.pred).select(
                F.col("o").alias("node"), "cls"
            )
        )
    # no distinct here: the closure join tolerates duplicates and the
    # single (node, cls) distinct below dedups base and up together —
    # one shuffle, not two (the dedup-fusion rule from kg_linking)
    closure = subclass_closure(subclass, n_rounds=n_rounds)
    if closure:
        cl = spark.createDataFrame(closure, "sub string, sup string")
        up = base.join(F.broadcast(cl), base.cls == cl.sub).select(
            "node", F.col("sup").alias("cls")
        )
        base = base.unionByName(up)
    base = base.distinct()

    return base.join(
        asserted.withColumn("asserted", F.lit(1)),
        ["node", "cls"],
        "left",
    ).select(
        "node",
        "cls",
        F.coalesce(F.col("asserted"), F.lit(0)).cast("int").alias("asserted"),
    )


OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"


def sameas_canonicalize(
    triples: DataFrame,
    driver_threshold: int = 2_000_000,
    project_graph: bool = False,
):
    """owl:sameAs canonicalization — the DECLARED-identity complement
    to minhash entity linking (linking.py INFERS identity from surface
    similarity; sameAs ASSERTS it in the data — the one OWL rule every
    real KG store materializes). Equivalence classes are the connected
    components of the sameAs graph (sameAs is symmetric+transitive, so
    its closure IS the component relation); each class collapses to
    its min-string-id member — the same deterministic canon rule as
    entity linking, so the two rewrites compose.

    Returns ``(canonical_triples, entities)``: the triple table with
    every IRI subject/object rewritten through the component map and
    the sameAs triples themselves dropped (identity is now implicit),
    plus the (entity, canon) assignment. ``project_graph=True``
    additionally projects provenance columns away and dedups to the
    canonical GRAPH — an RDF graph is a set, and merging aliases can
    make previously-distinct triples equal.

    100 TB shape: declared identities are structured-data-sized —
    orders of magnitude smaller than the triple corpus — so the
    component step reuses connected_components' hybrid (driver
    union-find under the threshold, O(log d) pointer jumping above),
    and the rewrite is apply_canonical's two BROADCAST joins: the
    corpus never shuffles. The only wide operation is the optional
    graph-projection distinct, keyed by the same subject the
    materializer buckets on. Blank nodes and literals pass through
    untouched (kind-guarded); sameAs statements whose subject or
    object is not an IRI are invalid OWL and contribute no edge.
    """
    from serd_spark.operators.linking import (
        apply_canonical,
        connected_components,
    )

    edges = triples.filter(
        (F.col("p") == OWL_SAMEAS)
        & (F.col("s_kind") == 0)
        & (F.col("o_kind") == 0)
    ).select(F.col("s").alias("entity_a"), F.col("o").alias("entity_b"))
    entities = connected_components(edges, driver_threshold=driver_threshold)
    rest = triples.filter(F.col("p") != OWL_SAMEAS)
    out = apply_canonical(rest, entities)
    if project_graph:
        out = out.select(
            "g", "s", "s_kind", "p", "o", "o_kind", "o_dt", "o_lang"
        ).distinct()
    return out, entities


def owl_property_entail(
    triples: DataFrame,
    inverse_of: Sequence[tuple[str, str]] = (),
    symmetric: Sequence[str] = (),
    transitive: Sequence[str] = (),
    max_rounds: int = 8,
    s: str = "s",
    p: str = "p",
    o: str = "o",
) -> DataFrame:
    """OWL RL property-characteristic closure — the rules that act on
    the instance edges themselves (where RDFS entailment above only
    produces rdf:type facts): prp-inv1/2 (owl:inverseOf, BOTH
    directions), prp-symp (owl:SymmetricProperty) and prp-trp
    (owl:TransitiveProperty). Declared axioms only: the inverse of a
    declared-transitive property is NOT auto-transitive unless the
    caller declares it (real OWL RL derives that via the schema
    vocabulary; here axioms are the driver-side literal lists, same
    asymmetry argument as ``rdfs_entail``).

    Returns (s, p, o, asserted) — the full closure with asserted = 1
    iff the edge was in the (deduped) input.

    Scale shape: the axiom tables are tiny — the inverse map is an
    explicit broadcast join, symmetric/transitive are literal IN
    filters (pure pushed predicates, no join at all). Each round
    unions {current, inverse-swapped, symmetric-swapped, transitive
    self-join} and dedups: the self-join DOUBLES covered path length
    per round (iterated squaring, the _compile_path / kg_linking CC
    shape), so convergence is O(log diameter) rounds, each
    localCheckpointed with a fixpoint count check. The DuckDB mirror
    replays a FIXED number of rounds ≥ the convergence round —
    post-fixpoint rounds are no-ops under union+distinct, so the two
    computations agree bit-for-bit.
    """
    spark = triples.sparkSession
    cur = (
        triples.select(
            F.col(s).alias("s"), F.col(p).alias("p"), F.col(o).alias("o")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    base = cur
    invmap = None
    if inverse_of:
        both = sorted(
            {(a, b) for a, b in inverse_of} | {(b, a) for a, b in inverse_of}
        )
        invmap = spark.createDataFrame(both, "p string, q string")
    sym = sorted(set(symmetric))
    trn = sorted(set(transitive))

    prev = cur.count()
    for _ in range(max_rounds):
        parts = [cur]
        if invmap is not None:
            parts.append(
                cur.join(F.broadcast(invmap), "p").select(
                    F.col("o").alias("s"),
                    F.col("q").alias("p"),
                    F.col("s").alias("o"),
                )
            )
        if sym:
            parts.append(
                cur.filter(F.col("p").isin(sym)).select(
                    F.col("o").alias("s"), "p", F.col("s").alias("o")
                )
            )
        if trn:
            a, b = cur.alias("a"), cur.alias("b")
            parts.append(
                a.join(
                    b,
                    (F.col("a.p") == F.col("b.p"))
                    & (F.col("a.o") == F.col("b.s")),
                )
                .filter(F.col("a.p").isin(trn))
                .select(
                    F.col("a.s").alias("s"),
                    F.col("a.p").alias("p"),
                    F.col("b.o").alias("o"),
                )
            )
        nxt = parts[0]
        for part in parts[1:]:
            nxt = nxt.unionByName(part)
        cur = nxt.distinct().localCheckpoint(eager=False)
        n = cur.count()
        if n == prev:
            break
        prev = n
    else:
        raise ValueError(
            f"owl closure did not converge within depth 2^{max_rounds}"
        )

    return cur.join(
        base.withColumn("asserted", F.lit(1)), ["s", "p", "o"], "left"
    ).select(
        "s",
        "p",
        "o",
        F.coalesce(F.col("asserted"), F.lit(0)).cast("int").alias("asserted"),
    )
