#!/usr/bin/env bash
# sf0.1 oracle spot-check tier (round-14 verdict #8): promote the
# scale-sensitive queries — store folds, the set-similarity join, the
# funnel family, quantile/bucket-cap machinery, the stream-stream joins
# and their composition, the watermark audit — to a DuckDB verify pass
# at 10x the driver's correctness scale. Catches bucket-cap and
# quantile-boundary bugs sf0.01 cannot see.
#
# Usage: dev/verify_sf01.sh [round-tag]
# Writes CORRECTNESS_SF01[_<tag>].json at the repo root.
set -euo pipefail
cd "$(dirname "$0")/.."

TAG="${1:-}"
OUT="/tmp/verify_sf01_out"
ARTIFACT="CORRECTNESS_SF01${TAG:+_$TAG}.json"

QUERIES=(
  # store folds / lifecycle / schema seam / time travel
  q126_quant_index_fold q147_ivfpq_index_fold q163_posting_index_fold
  q189_incremental_agg_view q206_store_widen_fold q207_time_travel_diff
  q180_streaming_merge_fold
  # exact set-similarity join (prefix-filter completeness at scale)
  q178_set_similarity_join
  # funnel family (state bounds, window boundaries)
  q137_funnel q144_streaming_funnel q145_windowed_funnel
  q148_streaming_windowed_funnel
  # quantile / histogram boundaries
  q61_length_quantiles q170_streaming_quantile_fold
  # bucket caps / skew machinery
  q32_minhash_pairs q34_ngram_jaccard q58_salted_hotkey q185_skew_audit
  # stream-stream joins + at-least-once composition + watermark audit
  q183_stream_stream_join q184_stream_stream_left_join
  q215_stream_stream_full_join
  q209_dedup_join_compose q208_watermark_audit
  # decorrelation + recursion at 10x (join-shaped rewrites whose cost
  # profile, not just answer, is scale-sensitive)
  q203_scalar_subquery q210_lateral_topk q211_recursive_bfs
  # ANN / search serving stack (round-15 verdict #7: the families whose
  # bucket caps and probe bounds are most scale-sensitive) + one media
  # row (payload-pass batching)
  q121_ivf_adc_serve q122_batch_ann_serve q142_ivfpq_serve
  q154_lexical_dense_hybrid q164_bm25_topk q116_media_meta_dispatch
  # round-16 additions: provider parity + state lifecycle at 10x
  q218_tws_attribution q226_ssjoin_state_audit q227_tws_bootstrap
  q229_dedup_state_audit q225_cbo_stats q228_partitioned_overwrite
  # round-17 additions: the RocksDB provider tier (round-16 verdict #8 —
  # the rows most state-size-sensitive belong at 10x) + every new row
  q219_rocksdb_ssjoin_parity q220_rocksdb_dedup_parity
  q221_rocksdb_session_parity
  q230_dynamic_partition_pruning q231_tws_state_audit
  q232_xml_quarantine q233_collated_dedup q234_metadata_audit
  q235_observe_metrics q236_state_metadata_audit
  q237_schema_evolution_read q238_writer_sizing_audit
  q239_join_agg_chain q240_dynamic_gap_sessions q241_compaction_audit
  q242_parameterized_sql q243_session_state_audit
  q244_dynamic_session_state_audit q245_streaming_observe
  q246_try_arithmetic q247_multi_sink_fanout q248_empty_relation
  q249_retention_vacuum
  # round-18 additions: the scale-sensitive TPC-H canon rows (the
  # decorrelated subquery shapes and the composite-key partsupp join
  # whose COST profile, not just answer, changes at 10x) + the
  # execution-fault gates (retry/spill/AQE engage on 10x volumes)
  q250_tpch01 q251_tpch02 q258_tpch09 q266_tpch17 q267_tpch18
  q269_tpch20 q270_tpch21
  q272_retry_determinism q273_spill_gate q274_aqe_gate
  q275_collated_dedup_lean q276_cbo_join_reorder q277_streaming_retry
  # round-19 additions: the plan-mechanism gates — layout/AQE/reuse
  # decisions are size-driven, so the booleans must hold at 10x too
  q278_bucketed_colocated_join q279_aqe_join_switch q280_exchange_reuse
  q281_codegen_parity q282_nullsafe_join q283_collation_key_dedup
  q284_nested_pruning q285_filter_pushdown
)

ONLY="$(IFS=,; echo "${QUERIES[*]}")"

# A stale $OUT would let compare.py grade a PREVIOUS run's dumps as
# this run's, and a swallowed Verify failure would commit a green
# artifact for code that no longer produces that output — clean first,
# fail loudly, and only then compare.
rm -rf "$OUT"
echo "[sf01] running Verify at sf0.1 for ${#QUERIES[@]} queries..."
LOG="$(mktemp)"
if ! SPARK_GRAFT_ONLY="$ONLY" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
    sbt -batch "runMain graft.Verify /root/testdata/sf0.1 $OUT" \
    > "$LOG" 2>&1; then
  echo "[sf01] Verify FAILED — no artifact written. Tail of log:"
  tail -30 "$LOG"
  exit 1
fi
grep -E "\[verify\].*failed" "$LOG" && {
  echo "[sf01] per-query failures above — no artifact written."; exit 1; }
rm -f "$LOG"

echo "[sf01] comparing against DuckDB..."
python3 dev/compare.py /root/testdata/sf0.1 "$OUT" --json "$ARTIFACT" \
  "${QUERIES[@]}"
