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

java -cp "$JARS/scala-compiler-2.13.17.jar:$JARS/scala-library-2.13.17.jar:$JARS/scala-reflect-2.13.17.jar" \
  scala.tools.nsc.Main \
  -classpath "$CP" \
  -d "$BUILD" "$EXT/SimilarityJoinRewrite.scala"

jar cf "$EXT/similarity-rewrite.jar" -C "$BUILD" .
echo "built $EXT/similarity-rewrite.jar"
