#!/bin/bash
# sf1.0 correctness spot-check (r7 scale rehearsal): run a sample of the
# contract surface through Verify on the 10x replicated data and compare
# against DuckDB — the correctness half of the scale argument (bench is
# the speed half). Sample avoids the handful of queries whose DEFINITIONAL
# oracles are quadratic in DuckDB at this size (dedup_containment /
# dedup_jaccard / fuzzy_join / triangle family) — their semantics are
# already pinned at sf0.01/sf0.1 by the driver gate.
set -e
cd /root/repo
QUERIES="q1_agg q3_join q5_multijoin q18_large_orders q21_waiting rollup_agg \
window_topk events_bin sessionize_batch dedup_exact dedup_minhash \
decontaminate ann_topk ann_ivf bm25_score tf_cosine text_langid \
feature_hash target_encode seq_packing mixture_sample kmv_overlap \
assoc_rules basket_pairs histogram_equidepth pagerank sssp"
rm -rf /tmp/verify_sf1
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g sbt -batch \
  "runMain graft.Verify /tmp/sf1.0 /tmp/verify_sf1 $QUERIES" 2>&1 | \
  grep -E '\[verify\].*FAIL|Total time' | tail -3
python3 tools/compare_oracle.py /tmp/sf1.0 /tmp/verify_sf1
