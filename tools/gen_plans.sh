#!/bin/bash
# Regenerates PLANS.md (formatted physical plans of flagship queries).
# Usage: tools/gen_plans.sh   (requires compiled classes)
cd "$(dirname "$0")/.." || exit 1
sbt -batch compile >/dev/null
/opt/spark/bin/spark-shell --master 'local[4]' --conf spark.ui.enabled=false \
  --conf spark.sql.shuffle.partitions=4 \
  --driver-class-path target/scala-2.13/classes -I tools/plans.scala <<< 'sys.exit(0)'
