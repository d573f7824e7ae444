"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator from SURVEY.md
section 2 (+ the training-data ops); ``oracle_sql()`` gives the DuckDB
equivalent for the value-hash correctness gate. Implementation lives in
``data_exchange_hl7_spark/queries*.py``.

ORDERING CONTRACT: the driver's correctness harness certifies the FIRST 50
entries of ``queries()`` each round. The dict is therefore ordered by
certification need, not by topic. ROUND-4 ORDER (executing the rotation
plan written at the end of r3):
  1. never-green queries (purge_read; domain_mix_plan whose r3 row was red
     on a dtype-only hash miss, oracle fixed in commit ad93595),
  2. queries new this round,
  3. the r3-touched lake/streaming tail whose only green rows predate the
     r3 code (hl7_debatch, nist_report_counts, change_data_feed,
     rebucket_read, schema_evolution_read, time_travel_as_of,
     tumbling/sliding_window_counts, streaming_dedup_batch),
  4. queries whose implementing modules changed DURING r4 after their r3
     green rows (lake/table.py lookup + bloom writer + 'in' pruning;
     engine.py rebuild_derived; the checkpoint-id tracking in
     _component_labels): filtered_snapshot_read, derived_file_stats,
     aggregate_repo_stats, incremental_minhash_index, index_dup_candidates,
     dup_clusters, minhash_dup_pairs,
  5. the last-green-in-r2 cohort, except eight whose green r2 rows remain
     valid because their wrapper bodies are byte-unchanged since (q3, q5,
     errors_by_path, token_stats, lang_id_heuristic, doc_fingerprint,
     quality_score, repetition_quality_flags — rotated to the tail to make
     room for the groups above),
  6. tail (51+): r3-green queries + the eight above (q1 likewise).

ROUND-5 ROTATION PLAN (written during r4): rotate INTO the window first
any never-green or red query from CORRECTNESS_r04 — note that the
post-window additions 53+ (edit_pairs through ivf_index_replica_read,
including stream_stream_left_join, cdf_replica_read and the CDF-tail
replicator family, plus the continuation-session additions
constraint_gate_read + quarantine_read (write-time CHECK constraints,
which also touched lake/table.py merge and engine.py apply_epoch — the
queries riding those modules rotate too), bitemporal_read, txn_read
(lake/txn.py MultiTableTransaction — atomic multi-table commit with
crash-window + conflict-compensation property tests; Engine.apply_epoch
atomic=True publishes main + deriveds from one transaction),
temperature_mixing (tau=1/2 via IEEE-exact sqrt), cdf_preimages_read
(Delta readChangeFeed-parity pre-image classification), and
knn_graph_clusters (mutual-kNN graph -> certified CC labels), and
merge_multi_read (LakeTable.merge_into — generalized multi-clause
MERGE INTO with Delta clause semantics, which also touched
lake/table.py), and txn_gate_read (streaming/txn_gate.py — Debezium
transaction-metadata semantics: only committed producer transactions
apply, each in its commit-position epoch; also touched
streaming/runner.py via MicroBatchRunner(txn_boundaries=True)), and
column_default_read (Iceberg-v3 initial-defaults on add_column — the
field-id projection fills the default for pre-addition files; touched
lake/table.py + streaming/cdf_tail.py), and shard_plan (deterministic
WebDataset-style training shard + global-order assignment; the
sub-sharded rank rebase is certified against the oracle's plain
per-shard ROW_NUMBER via an order checksum), merge_cascade_read
(Engine.merge_into's derived-table cascade — the purge_cascade contract
generalized to arbitrary merge clauses), and count_meta_read
(metadata-only COUNT(*) — both counts AND which path answered are part
of the hashed frame), and commit_summary_read (per-commit
added_records summaries — manifest metadata vs DuckDB's per-epoch
change-volume recomputation), and stream_txn_gate_read (the STREAMING
transaction holdback — two rate-limited availableNow drains with
cross-poll pending sidecar vs DuckDB's committed-subset algebra)) are
never-green BY CONSTRUCTION and lead this group —
then queries added or module-touched during r5, then the six r4-touched-module queries the
temporal-CDC family displaced (derived_file_stats, aggregate_repo_stats,
incremental_minhash_index, index_dup_candidates, dup_clusters,
minhash_dup_pairs), then the remaining LSH family whose persist
registry changed in late r3/r4 but whose r3 greens predate it
(simhash_dup_pairs, simhash_dup_pairs_wide, embedding_cosine_dups[_wide],
minhash_dup_pairs_capped, minhash_dup_pairs_wide, chunk_minhash_dups,
repo_level_neardup, corpus_prep_neardup, corpus_release_report), then the
oldest-green tail. NOTE (late r4): the single-split fan-out (`_spread` /
the `_t` round-robin repartition) touched EVERY wrapper in queries.py and
queries_text.py after the r4 gate ran, so by the byte-unchanged rule all
tail greens are stale; the change is plan-level only (no expression
changed) and the full oracle-parity suite re-verified all queries at
sf0.01 the same session, but r5 should still prefer rotating the heavy
LSH family plus a sample of the spread-touched wrappers. The sixteen
late-r4 queries (license_detect, import_graph, normalized_clone_dedup,
repo_context_pack, repo_license_rollup, zorder_read,
code_release_report, bpe_train_merges, bpe_tokenize_apply,
source_overlap_matrix, neardup_editdist_verify, session_window_counts,
snapshot_diff, module_pagerank, cms_heavy_hitters,
content_defined_chunks) sit inside the r4 window; the window boundary
now falls inside the r2 cohort (errors_by_category onward displaced to
51+, still locally parity-tested every pytest run). FINAL r4 additions:
branch_read (LakeTable.branch + fast_forward write-audit-publish) and
publish_read (Engine.publish lineage maintenance incl. the multi-epoch
folded-commit double-count gate), both in-window; the branch work also
touched lake/table.py, engine.py (publish, rebuild_derived FF recovery,
sidecar adoption), and streaming/stream_ingest.py (epoch-base offset) —
the queries riding those modules are already inside this round's window,
so the r4 gate certifies the post-change code. LAST r4 additions: the
temporal-CDC family (operators/temporal.py — scd2_build, asof_join_state,
changelog_normalize_feed, cdf_net_changes, epoch_drift_report) +
unimax_mixing, all six in-window, plus scd2_history_read (the
Engine.scd2_table incremental version-history maintenance); together they
displace six of the seven r4-touched-module re-certifications
(derived_file_stats, aggregate_repo_stats, incremental_minhash_index,
index_dup_candidates, dup_clusters, minhash_dup_pairs — r3-green, locally
parity-tested every pytest run) and sliding_window_counts (r2-green with
streaming/windowed.py byte-unchanged since r2, so its cert is current;
tumbling_window_counts represents the module in-window) past the
boundary, keeping filtered_snapshot_read as the lake read-path
representative; late_data_audit (REAL watermarked append stream: emitted
windows + observed drop mass balance vs the DuckDB watermark algebra)
likewise displaces tumbling_window_counts (r2-green, byte-unchanged
module, and late_data_audit certifies the same windowed_counts operator
more strongly); the displaced eight lead the r5 rotation below. POST-WINDOW r4 additions: edit_pairs
(temporal.edit_pairs — CommitPack-style code-edit pair mining),
co_change_graph (capped commit co-change graph), stream_stream_join
(watermarked symmetric-hash interval join, streamed-vs-batch exactness
vs the DuckDB interval join), and join_view_read (Engine.join_table —
incrementally-maintained JOIN materialized view across two changing
keyed tables, per-parent-namespaced epoch manifests; the join-view work
also touched engine.py's apply/purge/publish/rebuild/rollback
maintenance loops, so the queries riding engine.py should rotate too)
landed after the 50-slot window was spent on the mandated rotation;
they sit at 53-56, are locally parity-certified every pytest run, and
are FIRST in the r5 rotation — together with the five final-r4-session
additions: fim_transform (fill-in-the-middle PSM/SPM training
transform, deterministic hash-derived cut points, replay-stable),
intradoc_line_dedup (RefinedWeb-style within-document repeat removal
with sha256 replay invariant), contamination_overlap_score (per-doc
fractional eval-overlap permille + release verdict), files_inspect_read
(manifest-stats integrity: metadata-only table stats vs the oracle's
semantic recomputation), purge_cascade_read (Engine.purge_where's
derived-table sweep under the oracle), stream_stream_left_join
(the LEFT OUTER half of the stream-join contract: watermark-eviction-
driven null emission, flushed by a far-future sentinel, streamed rows
equal DuckDB's batch LEFT JOIN exactly), constraint_gate_read +
quarantine_read (LakeTable.add_check_constraint — write-time CHECK
constraints with DLT-expectation quarantine semantics; violating upserts
divert to a per-epoch idempotent sidecar instead of merging, tombstones
exempt, NULL passes per SQL-standard CHECK), and cdf_replica_read
(streaming/cdf_tail.py — table-to-table incremental replication by
tailing the change feed, offset = the replica's own epoch ledger,
exactly-once re-polls, layout-independent across bucket counts) plus
ivf_index_replica_read (incremental IVF index as a TRANSFORMED CDF-tail
replica: O(changed vectors) per-epoch cell re-derivation, the vector
sibling of incremental_minhash_index). NOTE:
tests/test_oracle_parity.py replicates the gate
for ALL queries at sf0.01 in every pytest run, so tail queries are never
unchecked — only externally un-refreshed. COVERAGE.md carries the
per-query last-green ledger (python ledger.py).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from data_exchange_hl7_spark import queries as q  # noqa: E402
from data_exchange_hl7_spark import queries_text as qt  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC latest-state apply (A1 window dedup) on sf0.001."""
    return q.cdc_latest_state(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # --- never oracle-certified (purge_read new end-of-r3; domain_mix's
        # r3 row was red on a dtype-only hash miss, oracle fixed in ad93595)
        "purge_read": q.purge_read,
        "domain_mix_plan": qt.domain_mix_plan,
        # --- new this round: the last two un-oracled SURVEY transforms ----
        "json_lake_flat": q.json_lake_flat,
        "gold_wide_projection": q.gold_wide_projection,
        "hard_negatives_ivf": qt.hard_negatives_ivf,
        "hard_negatives_recall": qt.hard_negatives_recall,
        "length_percentiles_sketch": qt.length_percentiles_sketch,
        "semantic_dedup": qt.semantic_dedup,
        "dsir_importance": qt.dsir_importance,
        "dup_clusters_incremental": qt.dup_clusters_incremental,
        "license_detect": qt.license_detect,
        "import_graph": qt.import_graph,
        "normalized_clone_dedup": qt.normalized_clone_dedup,
        "repo_context_pack": qt.repo_context_pack,
        "repo_license_rollup": qt.repo_license_rollup,
        "zorder_read": q.zorder_read,
        "code_release_report": qt.code_release_report,
        "bpe_train_merges": qt.bpe_train_merges,
        "bpe_tokenize_apply": qt.bpe_tokenize_apply,
        "source_overlap_matrix": qt.source_overlap_matrix,
        "neardup_editdist_verify": qt.neardup_editdist_verify,
        "session_window_counts": q.session_window_counts,
        "snapshot_diff": q.snapshot_diff,
        "module_pagerank": qt.module_pagerank,
        "cms_heavy_hitters": qt.cms_heavy_hitters,
        "content_defined_chunks": qt.content_defined_chunks,
        "bigram_lm_fluency": qt.bigram_lm_fluency,
        "bloom_decontaminate": qt.bloom_decontaminate,
        "rollback_read": q.rollback_read,
        "branch_read": q.branch_read,
        "publish_read": q.publish_read,
        "redrive_read": q.redrive_read,
        "stream_ingest_read": q.stream_ingest_read,
        "replay_read": q.replay_read,
        # --- new this session: temporal CDC family (operators/temporal.py —
        # SCD2 history, two-table as-of join vs DuckDB's NATIVE ASOF JOIN,
        # Flink-style changelog normalization, Delta-CDF net-change folding,
        # per-epoch drift gate) + UniMax mixing ----------------------------
        "scd2_build": q.scd2_build,
        "asof_join_state": q.asof_join_state,
        "changelog_normalize_feed": q.changelog_normalize_feed,
        "cdf_net_changes": q.cdf_net_changes,
        "epoch_drift_report": q.epoch_drift_report,
        "scd2_history_read": q.scd2_history_read,
        "late_data_audit": q.late_data_audit,
        "unimax_mixing": qt.unimax_mixing,
        # --- r3-touched modules (lake/table.py, engine.py, query wrappers)
        # whose only green rows predate the r3 code — re-certify ----------
        "hl7_debatch": q.hl7_debatch,
        "nist_report_counts": q.nist_report_counts,
        "change_data_feed": q.change_data_feed,
        "rebucket_read": q.rebucket_read,
        "schema_evolution_read": q.schema_evolution_read,
        "time_travel_as_of": q.time_travel_as_of,
        "streaming_dedup_batch": q.streaming_dedup_batch,
        # --- r4-touched modules (lake/table.py: lookup + bloom writer +
        # 'in' pruning; engine.py: rebuild_derived; queries_text.py:
        # checkpoint-id tracking in _component_labels / persist registry)
        # whose r3 green rows predate the r4 code. The six temporal-CDC
        # additions above displaced all but the lake read-path
        # representative (filtered_snapshot_read) past the window boundary;
        # the displaced six keep r3 greens + every-pytest local parity and
        # lead the r5 rotation plan ----------------------------------------
        "filtered_snapshot_read": q.filtered_snapshot_read,
        # sliding_window_counts displaced to 51 by scd2_history_read: its r2
        # green stays valid (streaming/windowed.py byte-unchanged since r2,
        # and tumbling_window_counts represents the same module in-window)
        "sliding_window_counts": q.sliding_window_counts,
        # tumbling_window_counts displaced to 52 by late_data_audit, which
        # certifies the SAME windowed_counts operator under a real
        # watermarked stream (r2 green stays valid: windowed.py unchanged)
        "tumbling_window_counts": q.tumbling_window_counts,
        # --- added after the r4 window filled (the first 50 slots are spent
        # on the VERDICT-mandated rotation): certified locally by
        # tests/test_oracle_parity.py every pytest run; they LEAD the r5
        # rotation plan ------------------------------------------------------
        "edit_pairs": q.edit_pairs,
        "co_change_graph": q.co_change_graph,
        "stream_stream_join": q.stream_stream_join,
        "stream_stream_left_join": q.stream_stream_left_join,
        "cdf_replica_read": q.cdf_replica_read,
        "ivf_index_replica_read": q.ivf_index_replica_read,
        "join_view_read": q.join_view_read,
        "fim_transform": qt.fim_transform,
        "intradoc_line_dedup": qt.intradoc_line_dedup,
        "contamination_overlap_score": qt.contamination_overlap_score,
        "files_inspect_read": q.files_inspect_read,
        "purge_cascade_read": q.purge_cascade_read,
        "constraint_gate_read": q.constraint_gate_read,
        "quarantine_read": q.quarantine_read,
        "bitemporal_read": q.bitemporal_read,
        "txn_read": q.txn_read,
        "temperature_mixing": qt.temperature_mixing,
        "cdf_preimages_read": q.cdf_preimages_read,
        "knn_graph_clusters": qt.knn_graph_clusters,
        "knn_graph_clusters_lsh": qt.knn_graph_clusters_lsh,
        "merge_multi_read": q.merge_multi_read,
        "txn_gate_read": q.txn_gate_read,
        "column_default_read": q.column_default_read,
        "shard_plan": qt.shard_plan,
        "merge_cascade_read": q.merge_cascade_read,
        "count_meta_read": q.count_meta_read,
        "commit_summary_read": q.commit_summary_read,
        "stream_txn_gate_read": q.stream_txn_gate_read,
        "derived_file_stats": q.derived_file_stats,
        "aggregate_repo_stats": q.aggregate_repo_stats,
        "incremental_minhash_index": q.incremental_minhash_index,
        "index_dup_candidates": q.index_dup_candidates,
        "dup_clusters": qt.dup_clusters,
        "minhash_dup_pairs": qt.minhash_dup_pairs,
        # --- rest of the last-green-in-r2 cohort: rotate the WHOLE cohort
        # through the window so no query's newest green row ages past one
        # round ------------------------------------------------------------
        "exact_dup_groups": qt.exact_dup_groups,
        "sessionize": q.sessionize,
        "interval_range_join": q.interval_range_join,
        "minhash_signatures": qt.minhash_signatures,
        "ngram_jaccard_pairs": qt.ngram_jaccard_pairs,
        "tfidf_top_terms": qt.tfidf_top_terms,
        "case_id_derivation": q.case_id_derivation,
        "error_summary": q.error_summary,
        "errors_by_category": q.errors_by_category,
        "receiver_file_report": q.receiver_file_report,
        "branch_router": q.branch_router,
        "distinct_profiles": q.distinct_profiles,
        "scalar_functions": q.scalar_functions,
        # --- 51+: the rest of the r2 cohort (name_normalization onward) +
        # the A1 dedup family, all green r1+r2 with their operator modules
        # byte-unchanged since (cdc_latest_state is also exercised by
        # entry() every driver smoke run) + q1 — displaced when the ten
        # late-r4 queries (license_detect, import_graph,
        # normalized_clone_dedup, repo_context_pack, repo_license_rollup,
        # zorder_read, code_release_report, bpe_train_merges,
        # bpe_tokenize_apply, source_overlap_matrix,
        # neardup_editdist_verify) overflowed the window — then the 49
        # r3-greens ---------------------------------------------------------
        "name_normalization": q.name_normalization,
        "debatch_documents": q.debatch_documents,
        "segment_rows": q.segment_rows,
        "embedded_binary_strip": q.embedded_binary_strip,
        "profile_resolution": q.profile_resolution,
        "redaction": q.redaction,
        "mmg_content_validation": q.mmg_content_validation,
        "dup_detection": q.dup_detection,
        "latest_state_salted": q.latest_state_salted,
        "latest_flag_sequencing": q.latest_flag_sequencing,
        "cdc_latest_state": q.cdc_latest_state,
        "q1_pricing_summary": q.q1_pricing_summary,
        "q3_shipping_priority": q.q3_shipping_priority,
        "q5_region_revenue": q.q5_region_revenue,
        "errors_by_path": q.errors_by_path,
        "token_stats": qt.token_stats,
        "lang_id_heuristic": qt.lang_id_heuristic,
        "doc_fingerprint": qt.doc_fingerprint,
        "quality_score": qt.quality_score,
        "repetition_quality_flags": qt.repetition_quality_flags,
        "simhash_dup_pairs": qt.simhash_dup_pairs,
        "decontamination": qt.decontamination,
        "c4_line_dedup": qt.c4_line_dedup,
        "ivf_train_kmeans": qt.ivf_train_kmeans,
        "ivf_topk_trained": qt.ivf_topk_trained,
        "ann_recall_at_k": qt.ann_recall_at_k,
        "pii_scrub": qt.pii_scrub,
        "sequence_packing": qt.sequence_packing,
        "stratified_sample": qt.stratified_sample,
        "corpus_prep_neardup": qt.corpus_prep_neardup,
        "simhash_signatures": qt.simhash_signatures,
        "ann_bruteforce_topk": qt.ann_bruteforce_topk,
        "ivf_partition_assign": qt.ivf_partition_assign,
        "ivf_topk": qt.ivf_topk,
        "embedding_cosine_dups": qt.embedding_cosine_dups,
        "corpus_prep_pipeline": qt.corpus_prep_pipeline,
        "multimodal_binary_meta": qt.multimodal_binary_meta,
        "errors_by_message": q.errors_by_message,
        "sql_model_vocab_enriched": q.sql_model_vocab_enriched,
        "obx_epi_split": q.obx_epi_split,
        "multimodal_extract_features": qt.multimodal_extract_features,
        "simhash_dup_pairs_wide": qt.simhash_dup_pairs_wide,
        "length_percentiles": qt.length_percentiles,
        "minhash_dup_pairs_capped": qt.minhash_dup_pairs_capped,
        "fixed_chunking": qt.fixed_chunking,
        "code_quality_flags": qt.code_quality_flags,
        "rare_token_filter": qt.rare_token_filter,
        "hard_negative_mining": qt.hard_negative_mining,
        "secret_scan": qt.secret_scan,
        "repo_level_neardup": qt.repo_level_neardup,
        "bpe_pair_counts": qt.bpe_pair_counts,
        "substring_span_dedup": qt.substring_span_dedup,
        "embedding_cosine_dups_wide": qt.embedding_cosine_dups_wide,
        "chunk_minhash_dups": qt.chunk_minhash_dups,
        "dataset_split_assign": qt.dataset_split_assign,
        "minhash_dup_pairs_wide": qt.minhash_dup_pairs_wide,
        "corpus_release_report": qt.corpus_release_report,
        "kmv_distinct_sketch": qt.kmv_distinct_sketch,
        "vocab_validation": q.vocab_validation,
        "sql_model_child": q.sql_model_child,
        "hl7_segments": q.hl7_segments,
        "nearest_preceding_anchor": q.nearest_preceding_anchor,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": q.ORACLE_Q1,
        "q3_shipping_priority": q.ORACLE_Q3,
        "q5_region_revenue": q.ORACLE_Q5,
        "cdc_latest_state": q.ORACLE_CDC_LATEST,
        "latest_flag_sequencing": q.ORACLE_LATEST_FLAG,
        "latest_state_salted": q.ORACLE_CDC_LATEST,  # salted == plain, by design
        "case_id_derivation": q.ORACLE_CASE_ID,
        "dup_detection": q.ORACLE_DUP,
        "error_summary": q.ORACLE_ERROR_SUMMARY,
        "errors_by_category": q.ORACLE_ERR_BY_CAT,
        "errors_by_path": q.ORACLE_ERR_BY_PATH,
        "errors_by_message": q.ORACLE_ERR_BY_MESSAGE,
        "receiver_file_report": q.ORACLE_RECEIVER,
        "branch_router": q.ORACLE_BRANCH,
        "distinct_profiles": q.ORACLE_DISTINCT,
        "vocab_validation": q.ORACLE_VOCAB,
        "nist_report_counts": q.ORACLE_NIST_COUNTS,
        "profile_resolution": q.ORACLE_PROFILE_RESOLUTION,
        "embedded_binary_strip": q.ORACLE_EMBEDDED_STRIP,
        "sql_model_child": q.ORACLE_SQL_MODEL_CHILD,
        "sql_model_vocab_enriched": q.ORACLE_SQL_MODEL_ENRICHED,
        "obx_epi_split": q.ORACLE_OBX_EPI_SPLIT,
        "hl7_debatch": q.ORACLE_HL7_DEBATCH,
        "hl7_segments": q.ORACLE_HL7_SEGMENTS,
        "redaction": q.ORACLE_REDACTION,
        "mmg_content_validation": q.ORACLE_MMG_CONTENT,
        "scalar_functions": q.ORACLE_SCALARS,
        "name_normalization": q.ORACLE_NAME_NORM,
        "nearest_preceding_anchor": q.ORACLE_ASOF,
        "sessionize": q.ORACLE_SESSIONIZE,
        "interval_range_join": q.ORACLE_RANGE_JOIN,
        "debatch_documents": q.ORACLE_DEBATCH,
        "segment_rows": q.ORACLE_SEGMENTS,
        "time_travel_as_of": q.ORACLE_TIME_TRAVEL,
        "change_data_feed": q.ORACLE_CDF,
        "filtered_snapshot_read": q.ORACLE_FILTERED_READ,
        "schema_evolution_read": q.ORACLE_SCHEMA_EVOLUTION,
        "rebucket_read": q.ORACLE_REBUCKET,
        "tumbling_window_counts": q.ORACLE_WINDOW_COUNTS,
        "sliding_window_counts": q.ORACLE_SLIDING_WINDOWS,
        "streaming_dedup_batch": q.ORACLE_STREAM_DEDUP,
        "token_stats": qt.ORACLE_TOKEN_STATS,
        "lang_id_heuristic": qt.ORACLE_LANG_ID,
        "quality_score": qt.ORACLE_QUALITY,
        "repetition_quality_flags": qt.ORACLE_REPETITION,
        "doc_fingerprint": qt.ORACLE_FINGERPRINT,
        "tfidf_top_terms": qt.ORACLE_TFIDF,
        "kmv_distinct_sketch": qt.ORACLE_KMV,
        "exact_dup_groups": qt.ORACLE_EXACT_DUP,
        "minhash_signatures": qt.ORACLE_MINHASH,
        "minhash_dup_pairs": qt.ORACLE_MINHASH_PAIRS,
        "dup_clusters": qt.ORACLE_DUP_CLUSTERS,
        "ngram_jaccard_pairs": qt.ORACLE_JACCARD,
        "simhash_signatures": qt.ORACLE_SIMHASH,
        "simhash_dup_pairs": qt.ORACLE_SIMHASH_PAIRS,
        "simhash_dup_pairs_wide": qt.ORACLE_SIMHASH_PAIRS_WIDE,
        "decontamination": qt.ORACLE_DECON,
        "c4_line_dedup": qt.ORACLE_C4_LINES,
        "pii_scrub": qt.ORACLE_PII,
        "sequence_packing": qt.ORACLE_SEQ_PACK,
        "stratified_sample": qt.ORACLE_STRATIFIED,
        "ann_bruteforce_topk": qt.ORACLE_ANN,
        "ivf_partition_assign": qt.ORACLE_IVF,
        "ivf_train_kmeans": qt.ORACLE_KMEANS,
        "ivf_topk": qt.ORACLE_IVF_TOPK,
        "ivf_topk_trained": qt.ORACLE_IVF_TRAINED,
        "ann_recall_at_k": qt.ORACLE_ANN_RECALL,
        "embedding_cosine_dups": qt.ORACLE_COSINE_DUPS,
        "corpus_prep_pipeline": qt.ORACLE_CORPUS_PREP,
        "corpus_prep_neardup": qt.ORACLE_CORPUS_PREP_NEARDUP,
        "multimodal_binary_meta": qt.ORACLE_MULTIMODAL,
        "multimodal_extract_features": qt.ORACLE_MULTIMODAL_FEATURES,
        "derived_file_stats": q.ORACLE_DERIVED_FILE_STATS,
        "domain_mix_plan": qt.ORACLE_DOMAIN_MIX,
        "length_percentiles": qt.ORACLE_LENGTH_PERCENTILES,
        "aggregate_repo_stats": q.ORACLE_AGGREGATE_REPO_STATS,
        "minhash_dup_pairs_capped": qt.ORACLE_MINHASH_PAIRS_CAPPED,
        "fixed_chunking": qt.ORACLE_FIXED_CHUNKING,
        "code_quality_flags": qt.ORACLE_CODE_QUALITY,
        "rare_token_filter": qt.ORACLE_RARE_TOKEN,
        "incremental_minhash_index": q.ORACLE_MINHASH_INDEX,
        "index_dup_candidates": q.ORACLE_INDEX_DUP_CANDIDATES,
        "hard_negative_mining": qt.ORACLE_HARD_NEGATIVES,
        "secret_scan": qt.ORACLE_SECRET_SCAN,
        "repo_level_neardup": qt.ORACLE_REPO_NEARDUP,
        "bpe_pair_counts": qt.ORACLE_BPE_PAIRS,
        "substring_span_dedup": qt.ORACLE_SUBSTRING_DEDUP,
        "embedding_cosine_dups_wide": qt.ORACLE_COSINE_DUPS_WIDE,
        "chunk_minhash_dups": qt.ORACLE_CHUNK_MINHASH,
        "dataset_split_assign": qt.ORACLE_SPLIT_ASSIGN,
        "license_detect": qt.ORACLE_LICENSE,
        "import_graph": qt.ORACLE_IMPORT_GRAPH,
        "normalized_clone_dedup": qt.ORACLE_NORM_CLONES,
        "repo_context_pack": qt.ORACLE_REPO_CONTEXT,
        "repo_license_rollup": qt.ORACLE_REPO_LICENSE,
        "zorder_read": q.ORACLE_ZORDER_READ,
        "code_release_report": qt.ORACLE_CODE_RELEASE,
        "bpe_train_merges": qt.ORACLE_BPE_TRAIN,
        "bpe_tokenize_apply": qt.ORACLE_BPE_APPLY,
        "source_overlap_matrix": qt.ORACLE_SOURCE_OVERLAP,
        "neardup_editdist_verify": qt.ORACLE_EDITDIST_VERIFY,
        "session_window_counts": q.ORACLE_SESSION_WINDOWS,
        "snapshot_diff": q.ORACLE_SNAPSHOT_DIFF,
        "module_pagerank": qt.ORACLE_MODULE_PAGERANK,
        "cms_heavy_hitters": qt.ORACLE_CMS,
        "content_defined_chunks": qt.ORACLE_CD_CHUNKS,
        "bigram_lm_fluency": qt.ORACLE_BIGRAM_LM,
        "bloom_decontaminate": qt.ORACLE_BLOOM_DECON,
        "purge_read": q.ORACLE_PURGE_READ,
        "rollback_read": q.ORACLE_ROLLBACK_READ,
        "branch_read": q.ORACLE_BRANCH_READ,
        "publish_read": q.ORACLE_PUBLISH_READ,
        "redrive_read": q.ORACLE_REDRIVE_READ,
        "stream_ingest_read": q.ORACLE_STREAM_INGEST_READ,
        "replay_read": q.ORACLE_REPLAY_READ,
        "json_lake_flat": q.ORACLE_JSON_LAKE_FLAT,
        "gold_wide_projection": q.ORACLE_GOLD_WIDE,
        "hard_negatives_ivf": qt.ORACLE_HN_IVF,
        "hard_negatives_recall": qt.ORACLE_HN_RECALL,
        "length_percentiles_sketch": qt.ORACLE_PCTL_SKETCH,
        "semantic_dedup": qt.ORACLE_SEMDEDUP,
        "dsir_importance": qt.ORACLE_DSIR,
        "dup_clusters_incremental": qt.ORACLE_DUP_CLUSTERS_INCREMENTAL,
        "minhash_dup_pairs_wide": qt.ORACLE_MINHASH_PAIRS_WIDE,
        "corpus_release_report": qt.ORACLE_RELEASE_REPORT,
        "scd2_build": q.ORACLE_SCD2,
        "asof_join_state": q.ORACLE_ASOF_STATE,
        "changelog_normalize_feed": q.ORACLE_CHANGELOG,
        "cdf_net_changes": q.ORACLE_NET_CHANGES,
        "epoch_drift_report": q.ORACLE_EPOCH_DRIFT,
        "scd2_history_read": q.ORACLE_SCD2_HISTORY,
        "late_data_audit": q.ORACLE_LATE_AUDIT,
        "unimax_mixing": qt.ORACLE_UNIMAX,
        "edit_pairs": q.ORACLE_EDIT_PAIRS,
        "co_change_graph": q.ORACLE_CO_CHANGE,
        "stream_stream_join": q.ORACLE_SS_JOIN,
        "stream_stream_left_join": q.ORACLE_SSL_JOIN,
        "cdf_replica_read": q.ORACLE_CDF_REPLICA,
        "ivf_index_replica_read": q.ORACLE_IVF_INDEX_REPLICA,
        "join_view_read": q.ORACLE_JOIN_VIEW,
        "fim_transform": qt.ORACLE_FIM,
        "intradoc_line_dedup": qt.ORACLE_INTRADOC,
        "contamination_overlap_score": qt.ORACLE_CONTAM_SCORE,
        "files_inspect_read": q.ORACLE_FILES_INSPECT,
        "purge_cascade_read": q.ORACLE_PURGE_CASCADE,
        "constraint_gate_read": q.ORACLE_CONSTRAINT_GATE,
        "quarantine_read": q.ORACLE_QUARANTINE,
        "bitemporal_read": q.ORACLE_BITEMPORAL,
        "txn_read": q.ORACLE_TXN_READ,
        "temperature_mixing": qt.ORACLE_TEMP_MIX,
        "cdf_preimages_read": q.ORACLE_CDF_PREIMAGES,
        "knn_graph_clusters": qt.ORACLE_KNN_GRAPH,
        "knn_graph_clusters_lsh": qt.ORACLE_KNN_GRAPH_LSH,
        "merge_multi_read": q.ORACLE_MERGE_MULTI,
        "txn_gate_read": q.ORACLE_TXN_GATE,
        "column_default_read": q.ORACLE_COLUMN_DEFAULT,
        "shard_plan": qt.ORACLE_SHARD_PLAN,
        "merge_cascade_read": q.ORACLE_MERGE_CASCADE,
        "count_meta_read": q.ORACLE_COUNT_META,
        "commit_summary_read": q.ORACLE_COMMIT_SUMMARY,
        "stream_txn_gate_read": q.ORACLE_STREAM_TXN_GATE,
    }
