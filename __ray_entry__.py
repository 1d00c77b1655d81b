"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship per-turn PDF-extraction pipeline on a
deterministic transcripts corpus (BASELINE.json input_hint shape) derived
from sf0.001.  ``queries()`` exposes every pipeline/operator family;
``oracle_sql()`` gives DuckDB equivalents for the SQL-expressible ones.

Value-equality engineering (driver hashes values): both sides use
identical integer arithmetic and the shared half-up rounding formula
``floor(x*10^d + 0.5)/10^d`` (see engine/ops/common.py) — never the
engines' differing native ``round``.

Ray is initialised by the driver before import; nothing here calls
ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_Q1_CUTOFF = "TIMESTAMP '1998-09-02 00:00:00'"


def _transcripts_dir(sf_dir: str) -> str:
    from engine.ops.common import sf_from_dir
    from engine.rayjob.transcripts import ensure_corpus
    return ensure_corpus(sf_from_dir(sf_dir))


def entry() -> Any:
    """Flagship: transcripts(sf0.001) → per-turn PDF text extraction."""
    from engine.rayjob.pipeline import build_extract_dataset
    return build_extract_dataset(_transcripts_dir('/root/testdata/sf0.001'))


def _extract_fulltext(sf_dir: str) -> Any:
    from engine.rayjob.pipeline import build_extract_dataset
    ds = build_extract_dataset(_transcripts_dir(sf_dir))
    # 'error' stays in the pipeline output but not the oracle-compared
    # query: the expected tables carry the reference's SEMANTIC surface
    # (text/spans/pages/decode_ok); error strings are engine diagnostics
    # with engine-specific wording.
    return ds.drop_columns(['error'])


def _extract_spans(sf_dir: str) -> Any:
    from engine.rayjob.pipeline import build_spans_dataset
    return build_spans_dataset(_transcripts_dir(sf_dir))


def _dedup_payloads(sf_dir: str) -> Any:
    from engine.ops.dedup import dedup_exact_payloads
    return dedup_exact_payloads(_transcripts_dir(sf_dir))


def _conv_stats(sf_dir: str) -> Any:
    from engine.ops.convstats import conv_stats
    return conv_stats(_transcripts_dir(sf_dir))


def _conv_text_md5(sf_dir: str) -> Any:
    from engine.ops.convstats import conv_text_md5
    return conv_text_md5(_transcripts_dir(sf_dir))


def _conv_role_transitions(sf_dir: str) -> Any:
    from engine.ops.convstats import conv_role_transitions
    return conv_role_transitions(_transcripts_dir(sf_dir))


def _conv_tool_usage(sf_dir: str) -> Any:
    from engine.ops.convstats import conv_tool_usage
    return conv_tool_usage(_transcripts_dir(sf_dir))


def _conv_turn_gaps(sf_dir: str) -> Any:
    from engine.ops.convstats import conv_turn_gaps
    return conv_turn_gaps(_transcripts_dir(sf_dir))


def _conv_split_manifest(sf_dir: str) -> Any:
    from engine.ops.convstats import conv_split_manifest
    return conv_split_manifest(_transcripts_dir(sf_dir))


def _conv_first_tool(sf_dir: str) -> Any:
    from engine.ops.convstats import conv_first_tool
    return conv_first_tool(_transcripts_dir(sf_dir))


def _conv_pack_manifest(sf_dir: str) -> Any:
    from engine.ops.convstats import conv_pack_manifest
    return conv_pack_manifest(_transcripts_dir(sf_dir))


def _conv_near_dup(sf_dir: str) -> Any:
    from engine.ops.convstats import conv_near_dup
    return conv_near_dup(_transcripts_dir(sf_dir))


def _conv_near_dup_lsh(sf_dir: str) -> Any:
    from engine.ops.convstats import conv_near_dup_lsh
    return conv_near_dup_lsh(_transcripts_dir(sf_dir))


def _conv_context_growth(sf_dir: str) -> Any:
    from engine.ops.convstats import conv_context_growth
    return conv_context_growth(_transcripts_dir(sf_dir))


def _tool_transition_matrix(sf_dir: str) -> Any:
    from engine.ops.convstats import tool_transition_matrix
    return tool_transition_matrix(_transcripts_dir(sf_dir))


def _conv_role_token_stats(sf_dir: str) -> Any:
    from engine.ops.convstats import conv_role_token_stats
    return conv_role_token_stats(_transcripts_dir(sf_dir))


def _conv_boilerplate_turns(sf_dir: str) -> Any:
    from engine.ops.convstats import conv_boilerplate_turns
    return conv_boilerplate_turns(_transcripts_dir(sf_dir))


def _conv_dedup_clusters(sf_dir: str) -> Any:
    from engine.ops.convstats import conv_dedup_clusters
    return conv_dedup_clusters(_transcripts_dir(sf_dir))


def _engine_fingerprint() -> str:
    """md5 over the extraction-relevant source files: a resume dir is
    only trusted for output produced by the SAME engine code, so a code
    change can never serve stale sink results (the corpus version is
    carried separately in the corpus dir basename)."""
    import glob
    import hashlib
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    h = hashlib.md5()
    for pat in ('engine/pdfcore/*.py', 'engine/rayjob/*.py'):
        for p in sorted(glob.glob(os.path.join(here, pat))):
            with open(p, 'rb') as f:
                h.update(f.read())
    return h.hexdigest()[:10]


def _extract_to_parquet(sf_dir: str) -> Any:
    """The resumable SINK as a first-class query: run the full flagship
    pipeline (extract → external-spill shuffle → per-bucket ordered
    parquet + manifest) and return the per-bucket manifest (rows-only:
    bucket assignment is crc32, not SQL-expressible — the write path is
    oracle-adjacent via extract_fulltext, whose rows these files hold,
    and byte-tested in tests/test_pipeline.py).  Re-running resumes; the
    out dir is keyed by (corpus version, engine fingerprint) so resume
    can never return output of different code or a different corpus."""
    import os

    import pyarrow as pa

    from engine.rayjob import checkpoint
    from engine.rayjob.pipeline import run_extraction

    corpus = _transcripts_dir(sf_dir)
    out_dir = '/tmp/graft_extract_out/%s-%s' % (
        os.path.basename(os.path.normpath(corpus)), _engine_fingerprint())
    run_extraction(corpus, out_dir, resume=True)
    rows = sorted(checkpoint.load_done_buckets(out_dir).values(),
                  key=lambda r: r['bucket'])
    return pa.table({
        'bucket': pa.array([r['bucket'] for r in rows], pa.int64()),
        'rows': pa.array([r['rows'] for r in rows], pa.int64()),
        'decode_failures': pa.array([r['decode_failures'] for r in rows],
                                    pa.int64()),
        'span_count': pa.array([r['span_count'] for r in rows], pa.int64()),
    })


def _extract_metrics(sf_dir: str) -> Any:
    """SINGLE-PASS metrics: one combiner map_batches emits per-batch
    partial counters, one tiny .sum() folds them — the read→extract DAG
    executes exactly once (three separate ds.count()/sum()/filter() calls
    would each re-run the full extraction)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    from engine.rayjob.pipeline import build_extract_dataset
    ds = build_extract_dataset(_transcripts_dir(sf_dir))

    def partial(batch: pa.Table) -> pa.Table:
        fails = pc.sum(pc.cast(pc.invert(batch.column('decode_ok')),
                               pa.int64())).as_py() or 0
        return pa.table({
            'n_turns': pa.array([batch.num_rows], pa.int64()),
            'decode_failures': pa.array([fails], pa.int64()),
            'total_spans': pa.array([pc.sum(batch.column('n_spans')).as_py() or 0],
                                    pa.int64()),
            'total_pages': pa.array([pc.sum(batch.column('n_pages')).as_py() or 0],
                                    pa.int64()),
        })

    agg = ds.map_batches(partial, batch_format='pyarrow',
                         zero_copy_batch=True).sum(
        ['n_turns', 'decode_failures', 'total_spans', 'total_pages'])
    return pd.DataFrame([{
        'n_turns': agg['sum(n_turns)'],
        'decode_failures': agg['sum(decode_failures)'],
        'total_spans': agg['sum(total_spans)'],
        'total_pages': agg['sum(total_pages)'],
    }])


def queries() -> dict[str, Callable[[str], Any]]:
    from engine.ops import (dedup, relational, similarity, textstats,
                            multimodal, sampling, clusters, sketches, ingest,
                            bloomjoin, checksum, graph, modelscore, decontam,
                            evals, sharding, quality, tpch)

    # ORDERING CONTRACT: the driver's correctness check caps at the
    # FIRST 50 entries, so the dict front-loads (a) queries with no
    # green row in any CORRECTNESS_r*.json yet, (b) queries whose code
    # changed this round, (c) the flagship.  Round 5 executes the
    # ROUND-5 TODO left at this spot in round 4: the 46 "r4-late"
    # entries ('part_assoc_rules' … 'source_quality_funnel' — none have
    # a driver CORRECTNESS row; all are tools/verify_queries.py +
    # pytest green, and most round-5 code changes land inside them)
    # plus the 4 flagship entries fill the 50-row window exactly.  The
    # r4-front block (also never driver-checked, r04 came back empty)
    # follows immediately after, then the long-green r1-r3 entries.
    return {
        # -- r4-late block, front-loaded per the ROUND-5 TODO ----------
        'part_assoc_rules': graph.part_assoc_rules,
        'events_funnel_windowed': relational.events_funnel_windowed,
        'lang_confusion': textstats.lang_confusion,
        'events_dau_wau': relational.events_dau_wau,
        'daily_revenue_running': relational.daily_revenue_running,
        'decontaminate_split': decontam.decontaminate_split,
        'dedup_simhash_eval': evals.dedup_simhash_eval,
        'ann_recall_eval': evals.ann_recall_eval,
        'tdigest_error_eval': evals.tdigest_error_eval,
        'conv_role_transitions': _conv_role_transitions,
        'events_anomaly_days': relational.events_anomaly_days,
        'doc_shard_assign': sharding.doc_shard_assign,
        'embedding_norm_stats': similarity.embedding_norm_stats,
        'lang_fertility': textstats.lang_fertility,
        'events_late_arrivals': relational.events_late_arrivals,
        'dedup_cluster_sizes': clusters.dedup_cluster_sizes,
        'clean_token_budget': clusters.clean_token_budget,
        'doc_surprisal': textstats.doc_surprisal,
        'split_manifest': sampling.split_manifest,
        'session_durations': relational.session_durations,
        'shard_balance': sharding.shard_balance,
        'part_triangles': graph.part_triangles,
        'purchase_view_lag': relational.purchase_view_lag,
        'conv_tool_usage': _conv_tool_usage,
        'embedding_project2d': similarity.embedding_project2d,
        'customer_ltv_deciles': relational.customer_ltv_deciles,
        'events_type_drift': relational.events_type_drift,
        'doc_ngram_novelty': decontam.doc_ngram_novelty,
        'dedup_keep_best': clusters.dedup_keep_best,
        'dedup_normalized': dedup.dedup_normalized,
        'vocab_coverage': textstats.vocab_coverage,
        'source_token_drift': textstats.source_token_drift,
        'embedding_kmeans': similarity.embedding_kmeans,
        'score_calibration': modelscore.score_calibration,
        'conv_turn_gaps': _conv_turn_gaps,
        'doc_ttr': textstats.doc_ttr,
        'events_hourly_profile': relational.events_hourly_profile,
        'source_dup_rate': dedup.source_dup_rate,
        'conv_split_manifest': _conv_split_manifest,
        'conv_first_tool': _conv_first_tool,
        'conv_pack_manifest': _conv_pack_manifest,
        'conv_near_dup': _conv_near_dup,
        'conv_near_dup_lsh': _conv_near_dup_lsh,
        'conv_context_growth': _conv_context_growth,
        'tool_transition_matrix': _tool_transition_matrix,
        'conv_role_token_stats': _conv_role_token_stats,
        'fk_integrity_audit': quality.fk_integrity_audit,
        'table_profile': quality.table_profile,
        'embedding_label_centroids': similarity.embedding_label_centroids,
        'embedding_label_outliers': similarity.embedding_label_outliers,
        'training_manifest': clusters.training_manifest,
        # ---- 50-entry driver window ends here: the r4-late block is 51
        # entries (the TODO's count of 46 was off), so exactly the 50
        # never-driver-checked entries above fill the window; the one
        # spillover plus the flagship (green in CORRECTNESS_r1-r3 on
        # unchanged code) sit immediately after -----------------------
        'source_quality_funnel': clusters.source_quality_funnel,
        # -- flagship extraction — oracle-checked via the
        # reference-derived expected tables (oracles.extract_oracle_sqls)
        'extract_fulltext': _extract_fulltext,
        'extract_spans': _extract_spans,
        'extract_metrics': _extract_metrics,
        'extract_to_parquet': _extract_to_parquet,   # rows-only (sink)
        # -- r4-front block (never driver-checked: CORRECTNESS_r04 came
        # back empty; all tools/verify_queries.py + pytest green) ------
        'user_event_pivot': relational.user_event_pivot,
        'events_user_rolling': relational.events_user_rolling,
        'customer_order_counts': relational.customer_order_counts,
        'events_latest_per_user': relational.events_latest_per_user,
        'returnflag_priority_counts': relational.returnflag_priority_counts,
        'events_rollup': relational.events_rollup,
        'events_funnel': relational.events_funnel,
        'users_view_and_purchase': relational.users_view_and_purchase,
        'users_purchase_not_view': relational.users_purchase_not_view,
        'urgent_order_lineitems': bloomjoin.urgent_order_lineitems,
        'doc_repetition': textstats.doc_repetition,
        'doc_chunks': textstats.doc_chunks,
        'conv_stats': _conv_stats,
        'events_time_rolling': relational.events_time_rolling,
        'events_value_zscore': relational.events_value_zscore,
        'events_value_deciles': relational.events_value_deciles,
        'events_hour_value_corr': relational.events_hour_value_corr,
        'events_debounced': relational.events_debounced,
        'user_event_paths': relational.user_event_paths,
        'orders_price_percentile': relational.orders_price_percentile,
        'daily_activity': relational.daily_activity,
        'conv_text_md5': _conv_text_md5,
        'lineitem_checksum': checksum.lineitem_checksum,
        'distinct_users_kmv': sketches.distinct_users_kmv,
        'docs_from_jsonl': ingest.docs_from_jsonl,
        'docs_from_csv': ingest.docs_from_csv,
        'multimodal_resize_blobs': multimodal.resized_blob_md5,
        'multimodal_frame_blobs': multimodal.frame_blob_md5,
        'events_value_tdigest': relational.events_value_tdigest,
        'distinct_users_hll': sketches.distinct_users_hll,
        'token_heavy_hitters': textstats.token_heavy_hitters,
        'token_postings': textstats.token_postings,
        'events_windowed_distinct_users':
            relational.events_windowed_distinct_users,
        'events_value_mad_outliers': relational.events_value_mad_outliers,
        'orders_cohort_retention': relational.orders_cohort_retention,
        'embedding_dedup_clusters': clusters.embedding_dedup_clusters,
        'part_pagerank': graph.part_pagerank,
        'token_cooccur_topk': textstats.token_cooccur_topk,
        'source_token_topk': textstats.source_token_topk,
        'user_decay_score': relational.user_decay_score,
        'doc_model_score': modelscore.doc_model_score,
        'ann_topk_pq': similarity.ann_topk_pq,
        'events_user_gini': relational.events_user_gini,
        'embedding_norms': similarity.embedding_norms,
        'minhash_near_dup': dedup.minhash_near_dup,
        'corpus_clean': clusters.corpus_clean,
        # -- r5 additions (after the driver window by design: the 50
        # never-driver-checked r4-late entries keep the window; these
        # are tools/verify_queries.py + pytest green) ------------------
        'q5_local_supplier_volume': tpch.q5_local_supplier_volume,
        'q6_forecast_revenue': tpch.q6_forecast_revenue,
        'q9_product_profit': tpch.q9_product_profit,
        'q10_returned_item': tpch.q10_returned_item,
        'q14_promo_revenue': tpch.q14_promo_revenue,
        'q17_small_quantity_revenue': tpch.q17_small_quantity_revenue,
        'q18_large_volume_customer': tpch.q18_large_volume_customer,
        'q4_order_priority': tpch.q4_order_priority,
        'q7_volume_shipping': tpch.q7_volume_shipping,
        'q8_market_share': tpch.q8_market_share,
        'q13_order_count_distribution': tpch.q13_order_count_distribution,
        'q15_top_supplier': tpch.q15_top_supplier,
        'q19_discounted_revenue': tpch.q19_discounted_revenue,
        'q22_global_sales_opportunity': tpch.q22_global_sales_opportunity,
        'conv_boilerplate_turns': _conv_boilerplate_turns,
        'conv_dedup_clusters': _conv_dedup_clusters,
        'doc_curriculum': modelscore.doc_curriculum,
        'doc_length_outliers': textstats.doc_length_outliers,
        # -- long-green (hash-green in CORRECTNESS_r1-r3) -------------
        # text analysis
        'doc_token_stats': textstats.doc_token_stats,
        'doc_token_bpe': textstats.doc_token_bpe,
        'doc_quality': textstats.doc_quality,
        'lang_id': textstats.lang_id,
        'fingerprint_md5': textstats.fingerprint_md5,
        'fingerprint_winnow': textstats.fingerprint_winnow,
        'token_frequencies': textstats.token_frequencies,
        'doc_tfidf_topk': textstats.doc_tfidf_topk,
        'doc_scrub': textstats.doc_scrub,
        'bigram_pmi_topk': textstats.bigram_pmi_topk,
        'sample_stratified': sampling.sample_stratified,
        'sample_uniform': sampling.sample_uniform,
        'sample_weighted_mix': sampling.sample_weighted_mix,
        # dedup
        'dedup_exact': dedup.dedup_exact,
        'dedup_exact_payloads': _dedup_payloads,      # rows-only (transcripts)
        'ngram_jaccard_pairs': dedup.ngram_jaccard_pairs,
        'ngram_containment_pairs': dedup.ngram_containment_pairs,
        'simhash_near_dup': dedup.simhash_near_dup,
        'shared_span_pairs': dedup.shared_span_pairs,
        'dedup_clusters': clusters.dedup_clusters,
        # similarity search
        'embedding_dup_pairs': similarity.embedding_dup_pairs,
        'embedding_dup_pairs_blocked': similarity.embedding_dup_pairs_blocked,
        'embedding_dup_lsh': similarity.embedding_dup_lsh,
        'ann_topk': similarity.ann_topk,
        'ann_topk_lsh': similarity.ann_topk_lsh,
        'ann_topk_ivf': similarity.ann_topk_ivf,
        # relational / plan-op layer
        'q1_pricing': relational.q1_pricing,
        'top_orders_revenue': relational.top_orders_revenue,
        'customers_per_region': relational.customers_per_region,
        'supplier_balance_by_nation': relational.supplier_balance_by_nation,
        'events_by_type': relational.events_by_type,
        'events_sessionize': relational.events_sessionize,
        'events_windowed': relational.events_windowed,
        'events_windowed_sliding': relational.events_windowed_sliding,
        'events_asof_orders': relational.events_asof_orders,
        'events_range_orders': relational.events_range_orders,
        'top_parts': relational.top_parts,
        'customers_inactive': relational.customers_inactive,
        'top_orders_per_customer': relational.top_orders_per_customer,
        'events_value_quantiles': relational.events_value_quantiles,
        'shipping_priority': relational.shipping_priority,
        'events_user_running': relational.events_user_running,
        'events_props_stats': relational.events_props_stats,
        'events_value_hist_quantiles': relational.events_value_hist_quantiles,
        # multimodal plumbing (stub codecs; features oracle-checked)
        'multimodal_features': multimodal.decode_media_features,
        'multimodal_resize': multimodal.resize_media,       # rows-only (blobs)
        'multimodal_frames': multimodal.sample_frames,      # rows-only (blobs)
        # oracle-checkable summaries of the resize / frame-sample math
        'multimodal_resize_stats': multimodal.resized_features,
        'multimodal_frame_stats': multimodal.frame_features,
    }


def oracle_sql() -> dict[str, str]:
    from engine.ops import oracles

    from engine.ops import sketches
    generated = {
        # generated oracles (hash constants / plane literals / trained
        # centroids) — see engine/ops/oracles.py for the parity rules
        'distinct_users_kmv': sketches.kmv_oracle_sql(),
        'distinct_users_hll': sketches.hll_oracle_sql(),
        'fingerprint_winnow': oracles.winnow_oracle_sql(),
        'multimodal_features': oracles.multimodal_features_oracle_sql(),
        'minhash_near_dup': oracles.minhash_oracle_sql(),
        'simhash_near_dup': oracles.simhash_oracle_sql(),
        'shared_span_pairs': oracles.shared_span_oracle_sql(),
        'dedup_clusters': oracles.clusters_oracle_sql(),
        'corpus_clean': oracles.corpus_clean_oracle_sql(),
        'training_manifest': oracles.training_manifest_oracle_sql(),
        'source_quality_funnel': oracles.source_funnel_oracle_sql(),
        'embedding_dedup_clusters': oracles.embedding_clusters_oracle_sql(),
        'multimodal_resize_stats': oracles.multimodal_resized_oracle_sql(),
        'multimodal_frame_stats': oracles.multimodal_frames_oracle_sql(),
        'events_value_tdigest': oracles.tdigest_oracle_sql(),
    }
    # Data-dependent oracles (trained centroids/codebooks, corpus-derived
    # constants) are generated with PER-ORACLE isolation: one failing
    # generator drops only ITS entry to rows-only and logs loudly —
    # round 4's bare try/except around this whole block could silently
    # strip ~40 oracles on a single failure (VERDICT r4 item 3).
    import logging
    _olog = logging.getLogger('graft.oracles')

    def _gen(name, fn):
        try:
            generated[name] = fn()
        except Exception:
            _olog.warning('oracle generator for %r failed; the query '
                          'falls back to a rows-only check', name,
                          exc_info=True)

    def _gen_multi(label, fn):
        try:
            generated.update(fn())
        except Exception:
            _olog.warning('oracle generator batch %r failed; those '
                          'queries fall back to rows-only checks', label,
                          exc_info=True)

    _gen('ann_topk_lsh', lambda: oracles.lsh_oracle_sql(oracles.embedding_dim()))
    from engine.ops.similarity import project2d_oracle_sql
    _gen('embedding_project2d',
         lambda: project2d_oracle_sql(oracles.embedding_dim()))
    _gen('ann_topk_ivf', oracles.ivf_oracle_sql)
    _gen('ann_topk_pq', oracles.pq_oracle_sql)
    _gen('embedding_dup_lsh', oracles.dup_lsh_oracle_sql)
    _gen('dedup_exact_payloads', oracles.payload_dedup_oracle_sql)
    from engine.ops import ingest
    _gen('docs_from_jsonl', ingest.jsonl_oracle_sql)
    _gen('docs_from_csv', ingest.csv_oracle_sql)
    try:
        from engine.ops.common import sf_from_dir as _sfd
        from engine.rayjob.transcripts import ensure_corpus as _ec
        _corpus = _ec(_sfd(oracles._oracle_sf_dir()))
    except Exception:
        _corpus = None
        _olog.warning('transcripts corpus synthesis failed; every conv_* '
                      'and extraction oracle falls back to rows-only',
                      exc_info=True)
    if _corpus is not None:
        from engine.ops import convstats as _cs
        for _name, _fn in (
                ('conv_stats', _cs.conv_stats_oracle_sql),
                ('conv_text_md5', _cs.conv_text_oracle_sql),
                ('conv_role_transitions', _cs.conv_role_transitions_oracle_sql),
                ('conv_tool_usage', _cs.conv_tool_usage_oracle_sql),
                ('conv_turn_gaps', _cs.conv_turn_gaps_oracle_sql),
                ('conv_split_manifest', _cs.conv_split_oracle_sql),
                ('conv_first_tool', _cs.conv_first_tool_oracle_sql),
                ('conv_pack_manifest', _cs.conv_pack_oracle_sql),
                ('conv_near_dup', _cs.conv_near_dup_oracle_sql),
                ('conv_near_dup_lsh', _cs.conv_near_dup_lsh_oracle_sql),
                ('conv_context_growth', _cs.conv_context_growth_oracle_sql),
                ('tool_transition_matrix', _cs.tool_transition_oracle_sql),
                ('conv_role_token_stats', _cs.conv_role_token_oracle_sql),
                ('conv_boilerplate_turns', _cs.conv_boilerplate_oracle_sql),
                ('conv_dedup_clusters', _cs.conv_dedup_clusters_oracle_sql)):
            _gen(_name, (lambda f=_fn: f(_corpus)))
        # flagship extraction: reference-derived expected tables → SQL joins
        _gen_multi('extract', oracles.extract_oracle_sqls)
        # multimodal blob md5s vs fixture-time independent recompute
        _gen_multi('mm_blobs', oracles.mm_blob_oracle_sqls)
    from engine.ops import sampling as _sampling
    from engine.ops import relational as _relational_mod
    from engine.ops import checksum as _checksum
    from engine.ops import similarity as _similarity
    generated['lineitem_checksum'] = _checksum.CHECKSUM_SQL
    generated['embedding_norms'] = _similarity.EMBEDDING_NORMS_SQL
    generated['events_anomaly_days'] = _relational_mod.EVENTS_ANOMALY_SQL
    from engine.ops import sharding as _sharding
    generated['doc_shard_assign'] = _sharding.shard_assign_oracle_sql()
    generated['embedding_norm_stats'] = _similarity.EMBEDDING_NORM_STATS_SQL
    generated['events_late_arrivals'] = _relational_mod.EVENTS_LATE_SQL
    from engine.ops import clusters as _clusters_mod
    generated['dedup_cluster_sizes'] = _clusters_mod.cluster_sizes_oracle_sql()
    generated['clean_token_budget'] = _clusters_mod.token_budget_oracle_sql()
    generated['sample_weighted_mix'] = _sampling.weighted_mix_oracle_sql()
    from engine.ops import textstats as _textstats
    generated['token_heavy_hitters'] = _textstats.heavy_hitters_oracle_sql()
    generated['lang_fertility'] = _textstats.LANG_FERTILITY_SQL
    generated['doc_surprisal'] = _textstats.DOC_SURPRISAL_SQL
    generated['split_manifest'] = _sampling.split_manifest_oracle_sql()
    generated['session_durations'] = _relational_mod.SESSION_DURATIONS_SQL
    generated['shard_balance'] = _sharding.shard_balance_oracle_sql()
    from engine.ops import graph as _graph_mod
    generated['part_triangles'] = _graph_mod.TRIANGLES_SQL
    generated['purchase_view_lag'] = _relational_mod.PURCHASE_VIEW_LAG_SQL
    generated['customer_ltv_deciles'] = _relational_mod.LTV_DECILES_SQL
    generated['events_type_drift'] = _relational_mod.EVENTS_TYPE_DRIFT_SQL
    from engine.ops import dedup as _dedup_mod
    generated['dedup_keep_best'] = oracles.keep_best_oracle_sql()
    generated['dedup_normalized'] = _dedup_mod.DEDUP_NORMALIZED_SQL
    generated['vocab_coverage'] = _textstats.vocab_coverage_oracle_sql()
    generated['source_token_drift'] = _textstats.SOURCE_TOKEN_DRIFT_SQL
    generated['doc_ttr'] = _textstats.DOC_TTR_SQL
    generated['doc_length_outliers'] = _textstats.DOC_LENGTH_OUTLIERS_SQL
    from engine.ops import modelscore as _modelscore
    generated['doc_curriculum'] = _modelscore.curriculum_oracle_sql()
    generated['source_dup_rate'] = _dedup_mod.SOURCE_DUP_RATE_SQL
    generated['events_hourly_profile'] = \
        _relational_mod.EVENTS_HOURLY_PROFILE_SQL
    from engine.ops import quality as _quality_mod
    generated['fk_integrity_audit'] = _quality_mod.FK_INTEGRITY_SQL
    generated['table_profile'] = _quality_mod.TABLE_PROFILE_SQL
    from engine.ops import similarity as _similarity_mod
    _gen('embedding_label_centroids',
         _similarity_mod.label_centroids_oracle_sql)
    _gen('embedding_label_outliers',
         _similarity_mod.label_outliers_oracle_sql)
    generated['embedding_kmeans'] = _similarity_mod.kmeans_oracle_sql()
    from engine.ops import modelscore as _modelscore_mod
    generated['score_calibration'] = _modelscore_mod.calibration_oracle_sql()
    generated['token_postings'] = _textstats.postings_oracle_sql()
    generated['token_cooccur_topk'] = _textstats.cooccur_oracle_sql()
    generated['source_token_topk'] = _textstats.source_topk_oracle_sql()
    from engine.ops import graph as _graph
    generated['part_pagerank'] = _graph.pagerank_oracle_sql()
    generated['part_assoc_rules'] = _graph.assoc_rules_oracle_sql()
    from engine.ops import modelscore as _modelscore
    generated['doc_model_score'] = _modelscore.model_score_oracle_sql()
    generated['events_windowed_distinct_users'] = """
SELECT event_type, date_trunc('day', ts) AS window_start,
       count(*)::BIGINT AS n_events,
       count(DISTINCT user_id)::BIGINT AS distinct_users
FROM events GROUP BY event_type, date_trunc('day', ts)
"""
    from engine.ops import relational as _relational
    generated['events_value_mad_outliers'] = _relational.MAD_OUTLIERS_SQL
    generated['user_decay_score'] = _relational.DECAY_SCORE_SQL
    generated['events_user_gini'] = _relational.USER_GINI_SQL
    generated['events_funnel_windowed'] = \
        _relational.funnel_windowed_oracle_sql()
    generated['lang_confusion'] = _textstats.lang_confusion_oracle_sql()
    generated['events_dau_wau'] = _relational.DAU_WAU_SQL
    generated['daily_revenue_running'] = _relational.REVENUE_RUNNING_SQL
    generated['orders_cohort_retention'] = _relational.COHORT_RETENTION_SQL
    generated['sample_uniform'] = """
SELECT doc_id, lang,
       (md5_number_lower(doc_id::VARCHAR) & 9223372036854775807)::BIGINT AS skey
FROM documents
WHERE (md5_number_lower(doc_id::VARCHAR) & 9223372036854775807)::BIGINT < %d
""" % _sampling.uniform_threshold()
    static = {
        'events_user_running': """
SELECT event_id, user_id,
       CAST(row_number() OVER w AS BIGINT) AS seq,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w AS BIGINT)
         AS running_cents,
       CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER w AS BIGINT) AS gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
        'customer_order_counts': """
SELECT c_custkey,
       count(o.o_orderkey)::BIGINT AS n_orders,
       coalesce(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)), 0)::BIGINT
         AS spend_cents
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c_custkey
""",
        'user_event_pivot': """
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click')::BIGINT AS n_click,
       count(*) FILTER (WHERE event_type = 'error')::BIGINT AS n_error,
       count(*) FILTER (WHERE event_type = 'purchase')::BIGINT AS n_purchase,
       count(*) FILTER (WHERE event_type = 'signup')::BIGINT AS n_signup,
       count(*) FILTER (WHERE event_type = 'view')::BIGINT AS n_view,
       count(*)::BIGINT AS n_total
FROM events GROUP BY user_id
""",
        'events_user_rolling': """
SELECT event_id, user_id,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w AS BIGINT)
         AS roll_cents,
       CAST(count(*) OVER w AS BIGINT) AS n_in_frame
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
        'events_latest_per_user': """
WITH r AS (
  SELECT user_id, event_id, event_type, ts, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_id, event_type, ts, value FROM r WHERE rn = 1
""",
        'returnflag_priority_counts': """
SELECT l.l_returnflag,
       count(*) FILTER (WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH'))::BIGINT
         AS n_high,
       count(*) FILTER (WHERE o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))::BIGINT
         AS n_low
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY l.l_returnflag
""",
        'events_rollup': """
SELECT event_type, date_trunc('day', ts) AS day,
       count(*)::BIGINT AS n_events,
       sum(CAST(floor(value * 100 + 0.5) AS BIGINT))::BIGINT AS sum_cents,
       (GROUPING(event_type) * 2 + GROUPING(date_trunc('day', ts)))::BIGINT AS lvl
FROM events
GROUP BY ROLLUP (event_type, date_trunc('day', ts))
""",
        'events_funnel': """
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e
  JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS t3 FROM events e
  JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id
)
SELECT 'view' AS stage, 1::BIGINT AS seq,
       (SELECT count(*) FROM v)::BIGINT AS n_users
UNION ALL SELECT 'click', 2::BIGINT, (SELECT count(*) FROM c)::BIGINT
UNION ALL SELECT 'purchase', 3::BIGINT, (SELECT count(*) FROM p)::BIGINT
""",
        'users_view_and_purchase': """
SELECT user_id FROM events WHERE event_type = 'view' AND value >= 95.0
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase' AND value >= 95.0
""",
        'users_purchase_not_view': """
SELECT user_id FROM events WHERE event_type = 'purchase' AND value >= 95.0
EXCEPT
SELECT user_id FROM events WHERE event_type = 'view' AND value >= 95.0
""",
        'urgent_order_lineitems': """
SELECT l.l_orderkey AS o_orderkey, count(*)::BIGINT AS n_items,
       sum(CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT))::BIGINT
         AS qty_cents
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY l.l_orderkey
""",
        'doc_repetition': """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), c AS (
  SELECT doc_id, word, count(*)::BIGINT AS cnt FROM w GROUP BY doc_id, word
)
SELECT doc_id,
       sum(cnt)::BIGINT AS n_words,
       count(*)::BIGINT AS n_distinct,
       max(cnt)::BIGINT AS top_cnt,
       floor((1.0 - count(*)::DOUBLE / sum(cnt)) * 1000000 + 0.5) / 1000000
         AS dup_frac
FROM c GROUP BY doc_id
""",
        'doc_chunks': """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
     s AS (SELECT doc_id, toks,
                  unnest(generate_series(0, greatest(len(toks) - 1, 0), 25))
                    AS start
           FROM t)
SELECT doc_id, (start // 25)::BIGINT AS chunk_idx,
       least(50, len(toks) - start)::BIGINT AS n_tokens,
       array_to_string(toks[start + 1 : start + 50], ' ') AS chunk_text
FROM s
""",
        'events_time_rolling': """
WITH e AS (SELECT event_id, user_id, ts,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
           FROM events)
SELECT event_id, user_id,
       count(*) OVER w::BIGINT AS n_win,
       sum(cents) OVER w::BIGINT AS win_cents
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
""",
        'events_value_zscore': """
WITH e AS (SELECT event_id, event_type,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
           FROM events),
     m AS (SELECT event_type, sum(cents)::BIGINT AS s,
                  sum(cents * cents)::BIGINT AS s2, count(*)::BIGINT AS n
           FROM e GROUP BY event_type)
SELECT e.event_id, e.event_type,
       floor(((e.cents - m.s::DOUBLE / m.n)
              / sqrt(m.s2::DOUBLE / m.n
                     - (m.s::DOUBLE / m.n) * (m.s::DOUBLE / m.n)))
             * 1000000 + 0.5) / 1000000 AS z
FROM e JOIN m ON m.event_type = e.event_type
""",
        'events_value_deciles': """
WITH ed AS (
  SELECT percentile_disc(0.1) WITHIN GROUP (ORDER BY value) AS e1, percentile_disc(0.2) WITHIN GROUP (ORDER BY value) AS e2, percentile_disc(0.3) WITHIN GROUP (ORDER BY value) AS e3, percentile_disc(0.4) WITHIN GROUP (ORDER BY value) AS e4, percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS e5, percentile_disc(0.6) WITHIN GROUP (ORDER BY value) AS e6, percentile_disc(0.7) WITHIN GROUP (ORDER BY value) AS e7, percentile_disc(0.8) WITHIN GROUP (ORDER BY value) AS e8, percentile_disc(0.9) WITHIN GROUP (ORDER BY value) AS e9
  FROM events
)
SELECT e.event_id, e.value,
       (1 + CASE WHEN e.value > ed.e1 THEN 1 ELSE 0 END + CASE WHEN e.value > ed.e2 THEN 1 ELSE 0 END + CASE WHEN e.value > ed.e3 THEN 1 ELSE 0 END + CASE WHEN e.value > ed.e4 THEN 1 ELSE 0 END + CASE WHEN e.value > ed.e5 THEN 1 ELSE 0 END + CASE WHEN e.value > ed.e6 THEN 1 ELSE 0 END + CASE WHEN e.value > ed.e7 THEN 1 ELSE 0 END + CASE WHEN e.value > ed.e8 THEN 1 ELSE 0 END + CASE WHEN e.value > ed.e9 THEN 1 ELSE 0 END)::BIGINT AS decile
FROM events e, ed
""",
        'events_hour_value_corr': """
WITH e AS (SELECT event_type,
                  ((epoch_us(ts) // 3600000000) % 24)::BIGINT AS x,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS y FROM events),
     m AS (SELECT event_type, count(*)::BIGINT n, sum(x)::BIGINT sx,
                  sum(y)::BIGINT sy, sum(x*x)::BIGINT sxx,
                  sum(y*y)::BIGINT syy, sum(x*y)::BIGINT sxy
           FROM e GROUP BY event_type)
SELECT event_type,
       floor(((n::DOUBLE * sxy - sx::DOUBLE * sy)
              / (sqrt(n::DOUBLE * sxx - sx::DOUBLE * sx)
                 * sqrt(n::DOUBLE * syy - sy::DOUBLE * sy)))
             * 1000000 + 0.5) / 1000000 AS corr_hv,
       n AS n_events
FROM m
""",
        'events_debounced': """
WITH l AS (
  SELECT event_id, user_id, event_type, ts,
         lag(ts) OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS prev_ts
  FROM events)
SELECT event_id, user_id, event_type, ts
FROM l WHERE prev_ts IS NULL OR ts - prev_ts > INTERVAL 5 MINUTE
""",
        'user_event_paths': """
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events)
SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path,
       count(*)::BIGINT AS n_steps
FROM r WHERE rn <= 10 GROUP BY user_id
""",
        'orders_price_percentile': """
WITH e AS (SELECT o_orderkey, o_orderpriority,
                  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
           FROM orders)
SELECT o_orderkey, o_orderpriority,
       floor(percent_rank() OVER (PARTITION BY o_orderpriority
                                  ORDER BY cents) * 1000000 + 0.5)
         / 1000000 AS pr
FROM e
""",
        'daily_activity': """
WITH o AS (SELECT date_trunc('day', o_orderdate) AS day,
                  count(*)::BIGINT AS n_orders FROM orders GROUP BY 1),
     e AS (SELECT date_trunc('day', ts) AS day,
                  count(*)::BIGINT AS n_events FROM events GROUP BY 1)
SELECT coalesce(o.day, e.day) AS day,
       coalesce(o.n_orders, 0)::BIGINT AS n_orders,
       coalesce(e.n_events, 0)::BIGINT AS n_events
FROM o FULL OUTER JOIN e ON e.day = o.day
""",
        'events_props_stats': """
WITH e AS (
  SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type, count(*)::BIGINT AS n_events, sum(k)::BIGINT AS sum_k,
       max(k)::BIGINT AS max_k, count(DISTINCT k)::BIGINT AS n_distinct_k,
       floor(sum(k)::DOUBLE / count(*) * 1000000 + 0.5) / 1000000 AS avg_k
FROM e GROUP BY event_type
""",
        'events_value_hist_quantiles': """
WITH b AS (
  SELECT event_type, CAST(floor(value / 0.5) AS BIGINT) AS bin,
         count(*)::BIGINT AS cnt
  FROM events GROUP BY 1, 2
), c AS (
  SELECT event_type, bin, cnt,
         CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS BIGINT) AS cum,
         CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM b
)
SELECT event_type,
       min(CASE WHEN cum >= ceil(0.50 * n) THEN (bin + 1) * 0.5 END) AS p50_est,
       min(CASE WHEN cum >= ceil(0.90 * n) THEN (bin + 1) * 0.5 END) AS p90_est,
       min(CASE WHEN cum >= ceil(0.99 * n) THEN (bin + 1) * 0.5 END) AS p99_est,
       max(n)::BIGINT AS n_events,
       count(*)::BIGINT AS n_bins
FROM c GROUP BY event_type
""",
        'doc_scrub': r"""
WITH s AS (
  SELECT doc_id,
         trim(regexp_replace(text, '\b(the|a|of|to|and|in|is|it|that|for|on|as|with|by)\b ?', '', 'g'), ' ') AS clean,
         len(regexp_extract_all(text, '\b(the|a|of|to|and|in|is|it|that|for|on|as|with|by)\b'))::BIGINT AS n_removed
  FROM documents
)
SELECT doc_id, md5(clean) AS clean_md5, length(clean)::BIGINT AS clean_len,
       n_removed
FROM s
""",
        'sample_stratified': """
WITH s AS (
  SELECT doc_id, lang,
         (md5_number_lower(doc_id::VARCHAR) & 9223372036854775807)::BIGINT AS skey
  FROM documents
), r AS (
  SELECT doc_id, lang, skey,
         row_number() OVER (PARTITION BY lang ORDER BY skey, doc_id)::BIGINT AS sample_rank
  FROM s
)
SELECT doc_id, lang, sample_rank FROM r WHERE sample_rank <= 50
""",
        'doc_token_stats': r"""
SELECT doc_id,
       len(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens,
       length(text)::BIGINT AS n_chars_calc,
       CASE WHEN len(regexp_extract_all(text, '\S+')) > 0
            THEN floor(len(regexp_extract_all(text, '\S'))::DOUBLE
                       / len(regexp_extract_all(text, '\S+')) * 10000 + 0.5) / 10000
            ELSE 0.0 END AS avg_token_len
FROM documents
""",
        'doc_token_bpe': r"""
SELECT doc_id,
       len(regexp_extract_all(text, ' ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'))::BIGINT AS n_bpe_tokens,
       CASE WHEN len(regexp_extract_all(text, ' ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+')) > 0
            THEN floor(length(text)::DOUBLE
                       / len(regexp_extract_all(text, ' ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'))
                       * 10000 + 0.5) / 10000
            ELSE 0.0 END AS chars_per_token
FROM documents
""",
        'doc_quality': r"""
WITH c AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens,
         len(regexp_extract_all(text, '\b(the|a|of|to|and|in|is|it|that|for|on|as|with|by)\b'))::BIGINT AS n_stopwords,
         len(regexp_extract_all(text, '[.,;:!?]'))::BIGINT AS n_punct,
         len(regexp_extract_all(text, '[0-9]'))::BIGINT AS n_digits
  FROM documents
), r AS (
  SELECT *, CASE WHEN n_tokens > 0
                 THEN floor(n_stopwords::DOUBLE / n_tokens * 1000000 + 0.5) / 1000000
                 ELSE 0.0 END AS stopword_ratio
  FROM c
)
SELECT doc_id, n_tokens, n_stopwords, n_punct, n_digits, stopword_ratio,
       (n_tokens >= 5 AND n_tokens <= 2000 AND stopword_ratio > 0.01) AS is_quality
FROM r
""",
        'lang_id': r"""
WITH s AS (
  SELECT doc_id, lang,
         len(regexp_extract_all(text, '\b(the|a|and|of|to)\b')) AS s_en,
         len(regexp_extract_all(text, '\b(der|die|das|und|ist)\b')) AS s_de,
         len(regexp_extract_all(text, '\b(le|la|les|et|est)\b')) AS s_fr,
         len(regexp_extract_all(text, '\b(el|los|las|y|es)\b')) AS s_es,
         len(regexp_extract_all(text, '[一-鿿]')) AS s_zh
  FROM documents
), p AS (
  SELECT doc_id, lang,
         CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_zh THEN 'en'
              WHEN s_de >= s_fr AND s_de >= s_es AND s_de >= s_zh THEN 'de'
              WHEN s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
              WHEN s_es >= s_zh THEN 'es'
              ELSE 'zh' END AS pred_lang
  FROM s
)
SELECT doc_id, pred_lang, lang, (pred_lang = lang) AS is_match FROM p
""",
        'fingerprint_md5': "SELECT doc_id, md5(text) AS fp FROM documents",
        'token_frequencies': r"""
WITH t AS (
  SELECT unnest(regexp_extract_all(text, '\S+')) AS token FROM documents
), g AS (
  SELECT token, count(*)::BIGINT AS n_occurrences FROM t GROUP BY token
), r AS (
  SELECT token, n_occurrences,
         row_number() OVER (ORDER BY n_occurrences DESC, token ASC)::BIGINT AS rank
  FROM g
)
SELECT token, n_occurrences, rank FROM r WHERE rank <= 100
""",
        'dedup_exact': """
SELECT min(doc_id) AS doc_id, count(*)::BIGINT AS n_copies
FROM documents GROUP BY md5(text)
""",
        'ngram_containment_pairs': r"""
WITH toks AS (
  SELECT doc_id, lang, regexp_extract_all(text, '\S+') AS tk FROM documents
), g AS (
  SELECT doc_id, lang,
         list_distinct(list_transform(generate_series(1, greatest(len(tk) - 2, 0)),
                                      i -> array_to_string(tk[i:i+2], ' '))) AS s
  FROM toks
)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       floor(len(list_intersect(a.s, b.s))::DOUBLE / len(a.s)
             * 1000000 + 0.5) / 1000000 AS containment
FROM g a JOIN g b ON a.lang = b.lang AND a.doc_id <> b.doc_id
WHERE len(a.s) > 0 AND len(b.s) > 0
  AND len(list_intersect(a.s, b.s))::DOUBLE / len(a.s) >= 0.5
""",
        'ngram_jaccard_pairs': r"""
WITH toks AS (
  SELECT doc_id, lang, regexp_extract_all(text, '\S+') AS tk FROM documents
), g AS (
  SELECT doc_id, lang,
         list_distinct(list_transform(generate_series(1, greatest(len(tk) - 2, 0)),
                                      i -> array_to_string(tk[i:i+2], ' '))) AS s
  FROM toks
)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       floor(len(list_intersect(a.s, b.s))::DOUBLE
             / len(list_distinct(list_concat(a.s, b.s))) * 1000000 + 0.5) / 1000000 AS jac
FROM g a JOIN g b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE len(a.s) > 0 AND len(b.s) > 0
  AND len(list_intersect(a.s, b.s))::DOUBLE
      / len(list_distinct(list_concat(a.s, b.s))) >= 0.8
""",
        'embedding_dup_pairs': """
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
       floor(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
             * 10000 + 0.5) / 10000 AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.42
""",
        # exact-equivalent by construction (same pairs, same float math),
        # so the blocked variant shares the all-pairs oracle verbatim
        'embedding_dup_pairs_blocked': """
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
       floor(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
             * 10000 + 0.5) / 10000 AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.42
""",
        'ann_topk': """
WITH q AS (
  SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < 16
), s AS (
  SELECT q.qid, e.vec_id AS nid,
         list_cosine_similarity(q.qe, e.embedding::DOUBLE[]) AS sc
  FROM q, embeddings e WHERE e.vec_id <> q.qid
), r AS (
  SELECT qid, nid, sc,
         row_number() OVER (PARTITION BY qid ORDER BY sc DESC, nid ASC)::BIGINT AS rank
  FROM s
)
SELECT qid AS query_id, nid AS neighbor_id,
       floor(sc * 10000 + 0.5) / 10000 AS score, rank
FROM r WHERE rank <= 5
""",
        'q1_pricing': """
SELECT l_returnflag, l_linestatus,
       floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty,
       floor(sum(l_extendedprice) * 100 + 0.5) / 100 AS sum_base_price,
       floor(sum(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100 AS sum_disc_price,
       floor(sum(l_quantity) / count(*) * 1000000 + 0.5) / 1000000 AS avg_qty,
       count(*)::BIGINT AS count_order
FROM lineitem WHERE l_shipdate <= %s
GROUP BY l_returnflag, l_linestatus
""" % _Q1_CUTOFF,
        'top_orders_revenue': """
SELECT l.l_orderkey AS o_orderkey,
       floor(sum(l.l_extendedprice * (1 - l.l_discount)) * 100 + 0.5) / 100 AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY l.l_orderkey
ORDER BY sum(l.l_extendedprice * (1 - l.l_discount)) DESC, l.l_orderkey ASC
LIMIT 10
""",
        'q4_order_priority': """
SELECT o.o_orderpriority, count(*)::BIGINT AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
  AND o.o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o.o_orderpriority
""",
        'q7_volume_shipping': """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l.l_shipdate)::BIGINT AS l_year,
       sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE n1.n_name IN ('NATION_13', 'NATION_19')
  AND n2.n_name IN ('NATION_13', 'NATION_19')
  AND n1.n_name <> n2.n_name
GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
""",
        'q8_market_share': """
WITH base AS (
  SELECT year(o.o_orderdate)::BIGINT AS o_year,
         CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT) AS cents,
         n.n_name AS supp_nation
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation nc ON nc.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = nc.n_regionkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'AMERICA'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate < TIMESTAMP '1998-01-01'
)
SELECT o_year,
       floor(sum(CASE WHEN supp_nation = 'NATION_6' THEN cents ELSE 0 END)::DOUBLE
             / sum(cents)::DOUBLE * 1000000 + 0.5) / 1000000 AS mkt_share
FROM base GROUP BY o_year
""",
        'q13_order_count_distribution': """
SELECT c_count, count(*)::BIGINT AS custdist FROM (
  SELECT c.c_custkey, count(o.o_orderkey)::BIGINT AS c_count
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey)
GROUP BY c_count
""",
        'q15_top_supplier': """
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS total_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, r.total_cents / 100.0 AS total_revenue
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_cents = (SELECT max(total_cents) FROM rev)
""",
        'q19_discounted_revenue': """
SELECT coalesce(sum(cents), 0) / 100.0 AS revenue, count(*)::BIGINT AS n_items
FROM (
  SELECT CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 11
         AND p.p_size BETWEEN 1 AND 5)
     OR (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10 AND 20
         AND p.p_size BETWEEN 1 AND 10)
     OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20 AND 30
         AND p.p_size BETWEEN 1 AND 15))
""",
        'q22_global_sales_opportunity': """
WITH t AS (
  SELECT sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS s,
         count(*)::BIGINT AS c
  FROM customer WHERE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) > 0)
SELECT n.n_name, count(*)::BIGINT AS numcust,
       sum(CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT)) / 100.0 AS totacctbal
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) * (SELECT c FROM t)
        > (SELECT s FROM t)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY n.n_name
""",
        'q5_local_supplier_volume': """
SELECT n.n_name,
       sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
  AND s.s_nationkey = c.c_nationkey
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
""",
        'q6_forecast_revenue': """
SELECT coalesce(sum(CAST(floor(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT)), 0) / 100.0 AS revenue,
       count(*)::BIGINT AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 - 1e-9 AND 0.07 + 1e-9
  AND l_quantity < 24
""",
        'q9_product_profit': """
SELECT n.n_name, year(l.l_shipdate)::BIGINT AS o_year,
       sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) / 100.0 AS profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_type = 'PROMO'
GROUP BY n.n_name, year(l.l_shipdate)
""",
        'q10_returned_item': """
SELECT c.c_custkey, c.c_name,
       sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue,
       c.c_acctbal, n.n_name
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) DESC, c.c_custkey
LIMIT 20
""",
        'q14_promo_revenue': """
SELECT floor(100.0 * coalesce(sum(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT) END), 0)
       / sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) * 1000000 + 0.5) / 1000000
       AS promo_revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
  AND l.l_shipdate < TIMESTAMP '1996-04-01'
""",
        'q17_small_quantity_revenue': """
SELECT floor(coalesce(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)), 0)
             / 100.0 / 7.0 * 100 + 0.5) / 100 AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#13'
  AND l.l_quantity < 0.2 * (SELECT avg(l2.l_quantity) FROM lineitem l2
                            WHERE l2.l_partkey = l.l_partkey)
""",
        'q18_large_volume_customer': """
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       floor(o.o_totalprice * 100 + 0.5) / 100 AS o_totalprice,
       o.o_orderdate,
       floor(sum(l.l_quantity) * 100 + 0.5) / 100 AS sum_qty
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_totalprice, o.o_orderdate
HAVING sum(l.l_quantity) > 250
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
""",
        'customers_per_region': """
SELECT r.r_name, count(*)::BIGINT AS n_customers
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY r.r_name
""",
        'supplier_balance_by_nation': """
SELECT n.n_name,
       floor(sum(s.s_acctbal) * 100 + 0.5) / 100 AS total_acctbal,
       count(*)::BIGINT AS n_suppliers
FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
GROUP BY n.n_name
""",
        'events_by_type': """
SELECT event_type, count(*)::BIGINT AS n_events,
       floor(sum(value) * 100 + 0.5) / 100 AS sum_value,
       floor(sum(value) / count(*) * 1000000 + 0.5) / 1000000 AS avg_value,
       count(DISTINCT user_id)::BIGINT AS n_users
FROM events GROUP BY event_type
""",
        'events_sessionize': """
WITH d AS (
  SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts
  FROM events
)
SELECT user_id, count(*)::BIGINT AS n_events,
       (1 + sum(CASE WHEN pts IS NOT NULL
                      AND epoch_us(ts) - epoch_us(pts) > 1800000000
                     THEN 1 ELSE 0 END))::BIGINT AS n_sessions
FROM d GROUP BY user_id
""",
        'events_windowed': """
SELECT event_type, date_trunc('day', ts) AS window_start,
       count(*)::BIGINT AS n_events,
       floor(sum(value) * 100 + 0.5) / 100 AS sum_value
FROM events GROUP BY event_type, date_trunc('day', ts)
""",
        # hopping 3-day/1-day windows: an event belongs to the 3 windows
        # starting at day, day-1, day-2 (same replication the map stage does)
        'events_windowed_sliding': """
SELECT event_type,
       date_trunc('day', ts) - k * INTERVAL 1 DAY AS window_start,
       count(*)::BIGINT AS n_events,
       floor(sum(value) * 100 + 0.5) / 100 AS sum_value
FROM events CROSS JOIN range(0, 3) t(k)
GROUP BY event_type, date_trunc('day', ts) - k * INTERVAL 1 DAY
""",
        'events_range_orders': """
SELECT o.o_orderkey, o.o_custkey, count(e.ts)::BIGINT AS n_events
FROM orders o LEFT JOIN events e
  ON e.user_id = o.o_custkey
 AND e.ts >= o.o_orderdate
 AND e.ts < o.o_orderdate + INTERVAL 7 DAY
GROUP BY o.o_orderkey, o.o_custkey
""",
        'events_asof_orders': """
SELECT e.event_id, e.user_id, o.o_orderdate AS asof_orderdate
FROM events e
ASOF LEFT JOIN orders o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
""",
        'top_parts': """
SELECT p_partkey, p_name, p_retailprice FROM part
ORDER BY p_retailprice DESC, p_partkey ASC LIMIT 10
""",
        'customers_inactive': """
SELECT c_mktsegment, count(*)::BIGINT AS n_customers
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
GROUP BY c_mktsegment
""",
        'top_orders_per_customer': """
WITH r AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC)::BIGINT AS rank
  FROM orders
)
SELECT o_custkey, o_orderkey, o_totalprice, rank FROM r WHERE rank <= 3
""",
        'events_value_quantiles': """
SELECT event_type,
       percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS p50,
       percentile_disc(0.9) WITHIN GROUP (ORDER BY value) AS p90,
       percentile_disc(0.99) WITHIN GROUP (ORDER BY value) AS p99,
       count(*)::BIGINT AS n_events
FROM events GROUP BY event_type
""",
        'shipping_priority': """
SELECT l.l_orderkey AS o_orderkey,
       floor(sum(l.l_extendedprice * (1 - l.l_discount)) * 100 + 0.5) / 100 AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1997-06-30 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1997-06-30 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY sum(l.l_extendedprice * (1 - l.l_discount)) DESC, l.l_orderkey ASC
LIMIT 10
""",
        'doc_tfidf_topk': r"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS token FROM documents
), tf AS (
  SELECT doc_id, token, count(*)::DOUBLE AS tf FROM tok GROUP BY doc_id, token
), df AS (
  SELECT token, count(DISTINCT doc_id)::DOUBLE AS df FROM tok GROUP BY token
), n AS (
  SELECT count(*)::DOUBLE AS n FROM documents
), s AS (
  SELECT tf.doc_id, tf.token, ln(n.n / df.df) * tf.tf AS score
  FROM tf, df, n WHERE tf.token = df.token
), r AS (
  SELECT doc_id, token, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, token ASC)::BIGINT AS rank
  FROM s
)
SELECT doc_id, token,
       floor(score * 1000000 + 0.5) / 1000000 AS score, rank
FROM r WHERE rank <= 3
""",
        'bigram_pmi_topk': r"""
WITH toks AS (
  SELECT regexp_extract_all(text, '\S+') AS tk FROM documents
), bi AS (
  SELECT unnest(list_transform(generate_series(1, greatest(len(tk) - 1, 0)),
                               i -> tk[i] || ' ' || tk[i+1])) AS bg
  FROM toks
), uni AS (
  SELECT unnest(tk) AS t FROM toks
), uc AS (
  SELECT t, count(*)::BIGINT AS c FROM uni GROUP BY t
), bc AS (
  SELECT bg, count(*)::BIGINT AS c FROM bi GROUP BY bg
), n AS (
  SELECT (SELECT count(*) FROM uni)::DOUBLE AS nu,
         (SELECT count(*) FROM bi)::DOUBLE AS nb
), s AS (
  SELECT bg, bc.c AS c,
         ln((bc.c::DOUBLE * n.nu) * n.nu / ((n.nb * a.c) * b.c)) AS pmi
  FROM bc, n, uc a, uc b
  WHERE a.t = split_part(bg, ' ', 1) AND b.t = split_part(bg, ' ', 2)
    AND bc.c >= 5
), r AS (
  SELECT bg, c, pmi,
         row_number() OVER (ORDER BY pmi DESC, bg ASC)::BIGINT AS rank
  FROM s
)
SELECT bg AS bigram, c AS n_occurrences,
       floor(pmi * 1000000 + 0.5) / 1000000 AS pmi, rank
FROM r WHERE rank <= 50
""",
    }
    full = generated | static
    # eval / decontamination oracles compose the production oracles
    from engine.ops import decontam as _decontam
    from engine.ops import evals as _evals
    full['decontaminate_split'] = _decontam.decontam_oracle_sql()
    full['doc_ngram_novelty'] = _decontam.novelty_oracle_sql()
    full['dedup_simhash_eval'] = _evals.simhash_eval_oracle_sql(
        full['ngram_jaccard_pairs'], full['simhash_near_dup'])
    if 'events_value_tdigest' in full:
        full['tdigest_error_eval'] = _evals.tdigest_error_oracle_sql(
            full['events_value_tdigest'])
    if 'ann_topk_ivf' in full:
        full['ann_recall_eval'] = _evals.ann_recall_oracle_sql(
            full['ann_topk'], full['ann_topk_ivf'])
    return full
