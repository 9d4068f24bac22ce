#!/usr/bin/env bash
# The end-of-round closing gate, run serially at the final tree on a quiet
# box (see VERDICT r13 item 1: the builder's own correctness artifact is
# committed so an empty driver channel is adjudicable from the replica).
#
#   bash tools/closing_gate.sh <round-number>
#
# Steps (~55 min at 32 cpus):
#  1. sbt -batch test                       — check exit code AND the
#     combined "Passed: Total N, Failed 0" line (ScalaCheck reports apart).
#  2. Verify at sf0.01 + DuckDB compare     — writes the driver-shape
#     replica; copied to CORRECTNESS_builder_r<N>.json for commit.
#  3. Bench 1x twice with SPARK_GRAFT_BENCH_OUT set (the default
#     bench_full.json is clobbered by every run; floors need both details).
#  4. Whole-suite 10x blowup.
#  5. Regenerate tools/bench_floors.json = per-query min of the 1x runs.
#  6. Bench 1x a THIRD time against the FRESH floors, writing the repo's
#     committed bench_full.json — so every entry >2x its final floor in
#     the committed artifact carries the in-loop rerun and final-sweep
#     (other_cores/ambient) evidence measured against those floors, then
#     fold run C into the floors (VERDICT r14 item 3: the old sequence
#     swept against the PREVIOUS round's floors and regenerated after,
#     leaving >2x entries with no evidence). An entry in C above 2x the
#     final min(A,B,C) floor is necessarily above 2x the loaded min(A,B)
#     floor, so its sweep evidence is always attached.
set -euo pipefail
R="${1:?round number}"
cd "$(dirname "$0")/.."
sbt -batch test
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_gate"
python3 tools/compare_oracle.py /root/testdata/sf0.01 /tmp/verify_gate \
  --json "CORRECTNESS_builder_r${R}.json"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=/tmp/bench_gate_a.json \
  sbt -batch "runMain graft.Bench"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=/tmp/bench_gate_b.json \
  sbt -batch "runMain graft.Bench"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BLOWUP=10 \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_gate_10x.json sbt -batch "runMain graft.Bench"
python3 tools/regen_floors.py /tmp/bench_gate_a.json /tmp/bench_gate_b.json
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=bench_full.json \
  sbt -batch "runMain graft.Bench"
python3 tools/regen_floors.py /tmp/bench_gate_a.json /tmp/bench_gate_b.json \
  bench_full.json
#  7. Machine-checked floors census (VERDICT r15 item 4): the round note
#     quotes THIS tool's output verbatim; it fails the gate if any armed
#     (>2x floor AND >0.75s delta) entry survived into the final artifact.
python3 tools/floor_census.py bench_full.json tools/bench_floors.json
echo "closing gate done: commit CORRECTNESS_builder_r${R}.json +"
echo "tools/bench_floors.json (quote the census output above in the note)"
