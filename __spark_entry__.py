"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction pipeline on a
deterministic synthesized pages corpus; ``queries()`` exposes every
operator family from SURVEY.md §2 (plus the training-data ops) as
(spark, sf_dir) → DataFrame callables; ``oracle_sql()`` gives the
DuckDB-checkable ANSI-SQL mirror for every SQL-expressible one.

Cross-engine determinism rules used throughout (so the driver's
value-hash compare is exact, not approximate):

- money aggregates go through integer cents
  (``cast(round(x*100) as bigint)`` per row, summed exactly) —
  float summation order never matters;
- per-row float arithmetic (ratios, cosines) is identical IEEE ops
  in both engines on identical inputs, rounded to 6 dp in BOTH;
- timestamps are emitted as formatted strings (no session-TZ or
  type-mapping ambiguity);
- every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# The implementation lives in serd_spark/contract/ (helpers, per-family
# query modules, oracle mirrors); this root module is the driver's stable
# import surface and re-exports every query callable by its original name.
from serd_spark.contract.helpers import *  # noqa: F401,F403,E402
from serd_spark.contract.q_core import *  # noqa: F401,F403,E402
from serd_spark.contract.q_batch1 import *  # noqa: F401,F403,E402
from serd_spark.contract.q_sparql import *  # noqa: F401,F403,E402
from serd_spark.contract.q_corpus1 import *  # noqa: F401,F403,E402
from serd_spark.contract.q_batch2 import *  # noqa: F401,F403,E402
from serd_spark.contract.q_streams2 import *  # noqa: F401,F403,E402
from serd_spark.contract.oracles import oracle_sql  # noqa: F401,E402

# ---------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthesize pages → extract RDF islands → canonicalize
    → dedup → per-predicate triple counts (the KG-construction core,
    end to end)."""
    triples = _kg_triples(spark, "/root/testdata/sf0.001")
    return (
        triples.groupBy("p")
        .agg(F.count(F.lit(1)).alias("n_triples"))
        .orderBy(F.desc("n_triples"), F.col("p"))
    )


# ---------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # KG-construction pipeline (rows-only: non-SQL-expressible)
        "kg_extract": kg_extract,
        "kg_predicates": kg_predicates,
        "kg_roundtrip": kg_roundtrip,
        "kg_linking": kg_linking,
        "kg_linking_dist": kg_linking_dist,
        "kg_bad_docs": kg_bad_docs,
        "kg_turtle": kg_turtle,
        "kg_hub_salting": kg_hub_salting,
        "dedup_simhash": dedup_simhash,
        "dedup_minhash_lsh": dedup_minhash_lsh,
        "dedup_embedding": dedup_embedding,
        "ann_ivf": ann_ivf,
        "curate_metrics": curate_metrics,
        "curate_metrics_full": curate_metrics_full,
        "stream_extract_counts": stream_extract_counts,
        "stream_dedup_pages": stream_dedup_pages,
        "stream_near_dups": stream_near_dups,
        "kg_node_ctors": kg_node_ctors,
        "mm_features": mm_features,
        "mm_probe": mm_probe,
        "mm_frames": mm_frames,
        "mm_frame_decode": mm_frame_decode,
        "q_sniff": q_sniff,
        "q_fuzzy_join": q_fuzzy_join,
        "q_phrase": q_phrase,
        "q_setsim": q_setsim,
        "q_sssp": q_sssp,
        "q_transcode": q_transcode,
        "q_funnel": q_funnel,
        "q_skyline": q_skyline,
        "q_kg_diff": q_kg_diff,
        "q_hll_rollup": q_hll_rollup,
        "q_tables": q_tables,
        "q_bitext": q_bitext,
        "q_wet": q_wet,
        "q_readability": q_readability,
        "q_c4_filters": q_c4_filters,
        "q_length_batches": q_length_batches,
        "stream_funnel": stream_funnel,
        "q_assortativity": q_assortativity,
        "q_wat": q_wat,
        "q_sparql_update": q_sparql_update,
        "stream_upsert": stream_upsert,
        # SQL-oracled relational + training-data ops
        "q_filter_project": q_filter_project,
        "q_agg_pricing": q_agg_pricing,
        "q_join_agg": q_join_agg,
        "q_multi_join": q_multi_join,
        "q_window_toporder": q_window_toporder,
        "q_topk_orders": q_topk_orders,
        "q_set_ops": q_set_ops,
        "q_rollup": q_rollup,
        "q_events_hourly": q_events_hourly,
        "q_events_latest": q_events_latest,
        "q_sessionize": q_sessionize,
        "q_dedup_exact": q_dedup_exact,
        "q_token_stats": q_token_stats,
        "q_lang_id": q_lang_id,
        "q_quality": q_quality,
        "q_fingerprint": q_fingerprint,
        "q_repetition": q_repetition,
        "q_pii": q_pii,
        "q_ngram_jaccard": q_ngram_jaccard,
        "q_minhash_md5": q_minhash_md5,
        "q_cosine_topk": q_cosine_topk,
        "q_embedding_dups": q_embedding_dups,
        "q_knn_join": q_knn_join,
        "q_span_dedup": q_span_dedup,
        "q_span_strip": q_span_strip,
        "q_unigram_lm": q_unigram_lm,
        "q_bigram_lm": q_bigram_lm,
        "q_url_canon": q_url_canon,
        "q_winnow": q_winnow,
        "q_winnow_pairs": q_winnow_pairs,
        "q_domain_stats": q_domain_stats,
        "q_bucketed_join": q_bucketed_join,
        "q_zorder": q_zorder,
        "q_stratified_sample": q_stratified_sample,
        "q_sql_q5": q_sql_q5,
        "q_sql_q3": q_sql_q3,
        "q_crawl_delta": q_crawl_delta,
        "q_profile": q_profile,
        "stream_enrich": stream_enrich,
        "stream_join": stream_join,
        "q_upsert": q_upsert,
        "q_compact": q_compact,
        "q_boilerplate": q_boilerplate,
        "q_transitions": q_transitions,
        "q_mojibake": q_mojibake,
        "q_chunking": q_chunking,
        "q_leakage_split": q_leakage_split,
        "q_tfidf": q_tfidf,
        "q_keyword_search": q_keyword_search,
        "q_bm25": q_bm25,
        "q_decontaminate": q_decontaminate,
        "q_asof_join": q_asof_join,
        "q_pagerank": q_pagerank,
        "q_trustrank": q_trustrank,
        "q_anf": q_anf,
        "q_triangles": q_triangles,
        "q_pca": q_pca,
        "q_kcore": q_kcore,
        "q_label_prop": q_label_prop,
        "q_bfs_hops": q_bfs_hops,
        "q_walks": q_walks,
        "q_link_predict": q_link_predict,
        "q_kmeans": q_kmeans,
        "q_semdedup": q_semdedup,
        "q_pq_search": q_pq_search,
        "q_sq8": q_sq8,
        "q_dedup_incremental": q_dedup_incremental,
        "q_line_dedup": q_line_dedup,
        "q_host_graph": q_host_graph,
        "q_scc": q_scc,
        "q_anchor_text": q_anchor_text,
        "q_nfc": q_nfc,
        "q_rdfxml": q_rdfxml,
        "q_shacl": q_shacl,
        "q_host_rank": q_host_rank,
        "q_hits": q_hits,
        "q_domain_cap": q_domain_cap,
        "q_range_join": q_range_join,
        "q_quantiles": q_quantiles,
        "q_distinct_sketch": q_distinct_sketch,
        "q_hll": q_hll,
        "q_mix": q_mix,
        "q_bpe_train": q_bpe_train,
        "q_bpe_tokenize": q_bpe_tokenize,
        "q_pack_sequences": q_pack_sequences,
        "q_session_window": q_session_window,
        "stream_sessions": stream_sessions,
        "q_dsir": q_dsir,
        "q_sketch_quantiles": q_sketch_quantiles,
        "q_wminhash": q_wminhash,
        "q_bloom_decon": q_bloom_decon,
        "q_countmin": q_countmin,
        "q_rrf_fusion": q_rrf_fusion,
        "q_shard": q_shard,
        "q_nb_quality": q_nb_quality,
        "q_gazetteer": q_gazetteer,
        "q_collocations": q_collocations,
        "q_sem_decon": q_sem_decon,
        "q_ccnet": q_ccnet,
        "q_dup_clusters": q_dup_clusters,
        "q_mm_dhash": q_mm_dhash,
        "q_mm_vp8": q_mm_vp8,
        "q_mm_audio": q_mm_audio,
        "q_mm_exif": q_mm_exif,
        "q_pdf_text": q_pdf_text,
        "q_heavy_hitters": q_heavy_hitters,
        "q_pair_mining": q_pair_mining,
        "q_crawl": q_crawl,
        "q_rare_mask": q_rare_mask,
        "q_blocklist": q_blocklist,
        "q_entropy": q_entropy,
        "q_kg_twohop": q_kg_twohop,
        "q_kg_negatives": q_kg_negatives,
        "q_rdfs_entail": q_rdfs_entail,
        "q_sparql": q_sparql,
        "q_sparql_opt": q_sparql_opt,
        "q_sparql_path": q_sparql_path,
        "q_sparql_star": q_sparql_star,
        "q_sparql_agg": q_sparql_agg,
        "q_sparql_having": q_sparql_having,
        "q_sparql_exists": q_sparql_exists,
        "q_sparql_construct": q_sparql_construct,
        "q_sameas": q_sameas,
        "q_robots": q_robots,
        "q_sparql_filter": q_sparql_filter,
        "q_sparql_minus": q_sparql_minus,
        "q_sparql_bind": q_sparql_bind,
        "q_sparql_describe": q_sparql_describe,
        "q_skolem": q_skolem,
        "q_c14n": q_c14n,
        "q_void": q_void,
        "q_frontier": q_frontier,
        "q_sitemap": q_sitemap,
        "q_feeds": q_feeds,
        "q_apportion": q_apportion,
        "q_url_templates": q_url_templates,
        "q_priority_sample": q_priority_sample,
        "q_rollup_cascade": q_rollup_cascade,
        "q_snippets": q_snippets,
        "q_page_directives": q_page_directives,
        "q_graphs": q_graphs,
        "q_warc_roundtrip": q_warc_roundtrip,
        "q_json_props": q_json_props,
        "stream_countmin": stream_countmin,
        "stream_hll": stream_hll,
        "stream_quantiles": stream_quantiles,
        "q_fact_fusion": q_fact_fusion,
        "q_source_trust": q_source_trust,
        "q_owl_entail": q_owl_entail,
        "q_sparql_npath": q_sparql_npath,
        "q_sparql_subselect": q_sparql_subselect,
        "q_surt": q_surt,
        "q_cdx": q_cdx,
        "q_redirects": q_redirects,
    }


