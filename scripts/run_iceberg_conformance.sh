#!/usr/bin/env bash
# One-command Iceberg conformance run (round-3 verdict "Next round" #2).
#
# This sandbox has no network and no iceberg-spark-runtime jar, so the
# `iceberg`-parametrized rows of tests/test_iceberg_backend.py skip here.
# On any machine with network (or a vendored jar), this script makes them
# real: it fetches the runtime jar matching the installed Spark, points a
# SparkCatalog at a throwaway local warehouse, and runs the identical
# backend-conformance assertions that the SnapshotTable backend passes.
#
#   bash scripts/run_iceberg_conformance.sh            # download + run
#   ICEBERG_JAR=/path/to.jar bash scripts/run_iceberg_conformance.sh
set -euo pipefail
cd "$(dirname "$0")/.."

SPARK_MINOR=$(python -c "import pyspark; print('.'.join(pyspark.__version__.split('.')[:2]))")
SCALA_VER=2.13
ICEBERG_VER="${ICEBERG_VER:-1.10.0}"
JAR_NAME="iceberg-spark-runtime-${SPARK_MINOR}_${SCALA_VER}-${ICEBERG_VER}.jar"

if [[ -z "${ICEBERG_JAR:-}" ]]; then
    ICEBERG_JAR="$PWD/.jars/${JAR_NAME}"
    if [[ ! -f "$ICEBERG_JAR" ]]; then
        mkdir -p .jars
        URL="https://repo1.maven.org/maven2/org/apache/iceberg/iceberg-spark-runtime-${SPARK_MINOR}_${SCALA_VER}/${ICEBERG_VER}/${JAR_NAME}"
        echo "fetching ${URL}"
        curl -fSL -o "$ICEBERG_JAR" "$URL"
    fi
fi

WAREHOUSE=$(mktemp -d /tmp/iceberg-warehouse-XXXX)
trap 'rm -rf "$WAREHOUSE"' EXIT

# GS_ICEBERG=1 un-skips the iceberg params in test_iceberg_backend.py; the
# jar + `local` catalog reach the session through PYSPARK_SUBMIT_ARGS (the
# conftest spark fixture builds via get_spark, which inherits them).
export GS_ICEBERG=1
export PYSPARK_SUBMIT_ARGS="--jars ${ICEBERG_JAR} \
  --conf spark.sql.catalog.local=org.apache.iceberg.spark.SparkCatalog \
  --conf spark.sql.catalog.local.type=hadoop \
  --conf spark.sql.catalog.local.warehouse=${WAREHOUSE} pyspark-shell"

python -m pytest tests/test_iceberg_backend.py -v
