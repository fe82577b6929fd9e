#!/bin/sh
# Compile the Catalyst optimizer extension (SURVEY §4) against the
# PySpark-bundled Spark + Scala jars and package it next to its source:
#   pyspark_deduplication_spark/plans/ext/similarity-rewrite.jar
# No network, no build tool — just the scala-compiler jar that ships
# inside the pyspark wheel and the JDK's `jar`.
set -eu

REPO="$(cd "$(dirname "$0")/.." && pwd)"
EXT="$REPO/pyspark_deduplication_spark/plans/ext"
JARS="$(python3 -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "jars"))')"

BUILD="$(mktemp -d)"
trap 'rm -rf "$BUILD"' EXIT

CP="$(find "$JARS" -name '*.jar' | paste -sd: -)"

# glob the scala toolchain jars so any PySpark/Scala patch version works
SCALAC_CP="$(find "$JARS" \( -name 'scala-compiler-*.jar' \
  -o -name 'scala-library-*.jar' -o -name 'scala-reflect-*.jar' \) \
  | paste -sd: -)"
[ -n "$SCALAC_CP" ] || { echo "no scala compiler jars under $JARS" >&2; exit 1; }

java -cp "$SCALAC_CP" \
  scala.tools.nsc.Main \
  -classpath "$CP" \
  -d "$BUILD" "$EXT/SimilarityJoinRewrite.scala"

jar cf "$EXT/similarity-rewrite.jar" -C "$BUILD" .
echo "built $EXT/similarity-rewrite.jar"
