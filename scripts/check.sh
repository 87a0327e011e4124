#!/usr/bin/env bash
# Full verification recipe, one command. Mirrors what the grading driver
# does: smoke pytest, sf0.01 oracle pass, driver simulation (hostile
# foreign session + hash compare), bench JSON line.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== pytest (sf0.001, FULL battery incl. -m slow legs) =="
python -m pytest tests/ -q -m ""

echo "== pytest oracle pass @ sf0.01 =="
TRIREME_TEST_SF=/root/testdata/sf0.01 python -m pytest tests/test_oracle.py -q -m ""

echo "== driver simulation =="
python scripts/driver_sim.py 2>&1 | grep -vE "WARN|INFO" | tail -3

echo "== alternate-env driver simulation (UTC+14 process TZ, pinned hash seed, C locale) =="
# A SECOND hostile environment, different axis than driver_sim's own
# America/New_York session tz: the PROCESS timezone (plus hash seed and
# locale). Caught stream_stateful_timeout's process-TZ-dependent sentinel
# staging in r7 (fix a1f1190) where the standard sim could not — naive
# Python datetime round-trips and Arrow epoch handling only skew when the
# host TZ is extreme. Runs the TZ-sensitive surface: every streaming /
# staging / timestamp-bearing key family.
TZ=Pacific/Kiritimati PYTHONHASHSEED=0 LC_ALL=C python scripts/driver_sim.py \
  stream_tumbling stream_sliding stream_session stream_dedup \
  stream_stateful stream_watermark_late stream_foreachbatch_sink \
  stream_stateful_timeout stream_stream_join stream_static_join \
  stream_complete_mode stream_stream_left_outer stream_python_datasource \
  fn_date fn_timezone_convert fn_interval_arith fn_datetime_format_patterns \
  fn_business_days fn_fiscal_445 join_asof join_asof_tolerance \
  join_asof_nearest join_point_in_time ts_yoy_calendar_join \
  etl_early_arriving_facts events_funnel_windowed win_time_range_trailing \
  stream_session_dynamic_gap etl_bitemporal_as_of \
  orders_survival_nelson_aalen ts_cross_correlation_leadlag \
  2>&1 | grep -vE "WARN|INFO" | tail -3

echo "== ANSI-off driver simulation (legacy-session semantics) =="
# Spark 4 defaults spark.sql.ansi.enabled=true and every query is
# written ANSI-safe; a LEGACY session (ansi=false: silent integer wrap,
# NULL-on-bad-cast, NULL-on-div-zero) must produce the SAME rows — the
# arithmetic/cast/rounding surface is where the two modes can diverge.
# Full-registry ANSI-off sim ran green in r8 (428/428); this leg keeps
# the sensitive families pinned per-run. The three r14 post-closing
# rebuilds ride along: int64 GEMM fixed-point dots, the chord-band
# floor-tie prune, and the window-count repeat detection are exactly
# this leg's arithmetic/cast surface.
PYSPARK_SUBMIT_ARGS="--conf spark.sql.ansi.enabled=false pyspark-shell" \
python scripts/driver_sim.py \
  fn_math fn_try_arithmetic fn_rounding_semantics fn_bitwise fn_hash \
  project_cast project_compute fn_interval_arith ts_periodogram \
  agg_pricing_summary agg_stats agg_percentile agg_regression \
  orders_gini_coefficient lineitem_price_index fn_business_days \
  fn_luhn_checksum agg_weighted_median \
  agg_gini_split_gain agg_tukey_hsd lineitem_fe_within_regression \
  ts_pacf_durbin_levinson \
  sim_sparse_cosine_tfidf geo_nearest_facility text_dedup_repeated_spans \
  fn_json text_tfidf join_multiway dedup_fuzzy_minhash dedup_ngram_jaccard \
  2>&1 | grep -vE "WARN|INFO" | tail -3

echo "== bench @ sf0.1 =="
SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} python bench.py 2>/dev/null | tail -1

echo "== 10x scale sweep @ sf0.1 (noop sink, per-key budget) =="
python scripts/scale_sweep.py 2>/dev/null | tail -3
