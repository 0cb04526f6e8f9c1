"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: end-to-end inverted-index build + BM25 top-10
                 over the sf0.001 documents table.
queries()      — one entry per implemented operator (SURVEY.md §2 +
                 the training-data pipeline ops).
oracle_sql()   — DuckDB-equivalent SQL for EVERY entry
                 (terrier_spark/plans/oracles.py).  emb_ivf_topk —
                 formerly the one rows-only entry — publishes its
                 seeded-k-means centroids as parquet and its oracle
                 recomputes cluster assignment, nprobe selection, and
                 the cosine top-k from them independently; only the
                 centroid values (ANN structure parameters) come from
                 the engine.  The hash-seeded dedup/LSH entries are
                 sized for recall 1.0 at test scale and verified
                 against exact brute-force oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from terrier_spark.plans import relational as R
from terrier_spark.plans import textqueries as T
from terrier_spark.plans.oracles import ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return T.ir_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # relational operator inventory (SURVEY.md §2)
        "q1_pricing_summary": R.q1_pricing_summary,
        "q3_shipping_priority": R.q3_shipping_priority,
        "q4_order_priority": R.q4_order_priority,
        "q5_local_supplier": R.q5_local_supplier,
        "q6_revenue": R.q6_revenue,
        "q7_volume_shipping": R.q7_volume_shipping,
        "q11_important_suppliers": R.q11_important_suppliers,
        "q16_supplier_parts": R.q16_supplier_parts,
        "q18_large_orders": R.q18_large_orders,
        "q19_disjunctive_revenue": R.q19_disjunctive_revenue,
        "q_topk_limit_offset": R.q_topk_limit_offset,
        "q_semi_anti_join": R.q_semi_anti_join,
        "q_outer_joins": R.q_outer_joins,
        "q_having": R.q_having,
        "q_window_rank": R.q_window_rank,
        "q_sessionize": R.q_sessionize,
        "q_setops": R.q_setops,
        "q_case_string": R.q_case_string,
        "q_date_extract": R.q_date_extract,
        "q_rollup": R.q_rollup,
        "q_subqueries": R.q_subqueries,
        "q_events_tumbling": R.q_events_tumbling,
        "q_theta_band_join": R.q_theta_band_join,
        "q_scalar_funcs": R.q_scalar_funcs,
        "q_index_lookup": R.q_index_lookup,
        # carries the CSVScan round-trip + constant-tuple Result legs
        # (consolidated r4 to free the slot for ir_proximity)
        "q_dml_roundtrip": R.q_dml_roundtrip,
        "q_prepared": R.q_prepared,
        # ANALYZE / sketch statistics (§2.9)
        "q_approx_stats": R.q_approx_stats,
        "q_salted_agg": R.q_salted_agg,
        "q_sketch_stats": T.q_sketch_stats,
        # IR engine (north rule)
        "ir_term_stats": T.ir_term_stats,
        "ir_collection_stats": T.ir_collection_stats,
        "ir_bm25_topk": T.ir_bm25_topk,
        "ir_bm25_topk_wand": T.ir_bm25_topk_wand,
        "ir_bm25_topk_and": T.ir_bm25_topk_and,
        "ir_bm25_batch": T.ir_bm25_batch,
        "ir_phrase": T.ir_phrase,
        "ir_proximity": T.ir_proximity,
        # text analysis
        "text_stats": T.text_stats,
        "text_fingerprints": T.text_fingerprints,
        # dedup
        "dedup_exact_docs": T.dedup_exact_docs,
        "dedup_ngram_pairs": T.dedup_ngram_pairs,
        "dedup_minhash_pairs": T.dedup_minhash_pairs,
        "dedup_simhash_pairs": T.dedup_simhash_pairs,
        # similarity search
        "emb_cosine_topk": T.emb_cosine_topk,
        "emb_knn_per_label": T.emb_knn_per_label,
        "emb_ivf_topk": T.emb_ivf_topk,
        "emb_ivf_full": T.emb_ivf_full,
        "emb_neardup_pairs": T.emb_neardup_pairs,
        # multimodal plumbing (mm_features also carries byte stats)
        "mm_features": T.mm_features,
    }


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
