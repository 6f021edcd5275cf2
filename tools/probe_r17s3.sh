#!/bin/bash
# Session-3 isolated probe: min-of-3 interleaved Bench passes over the
# named query set at the given SF dir. Usage:
#   tools/probe_r17s3.sh <sfdir> <out.json> <q1,q2,...>
set -e
SF="$1"; OUT="$2"; QS="$3"
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_ONLY="$QS" SPARK_GRAFT_BENCH_OUT="$OUT" \
sbt -batch "runMain graft.Bench" 2>/dev/null | tail -1
