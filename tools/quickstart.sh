#!/usr/bin/env bash
# Packaged-jar quickstart (r13 directive #7): build the library jar with
# `sbt package` and run the SURVEY §7 minimum slice (the flagship
# in_valueset flow, graft.Smoke) from the PACKAGED artifact on a plain
# JVM classpath — no sbt on the execution side, exactly how a Spark
# cluster would consume the jar (spark-submit --jars <jar>, or drop it
# on the executor classpath).
#
# Usage: tools/quickstart.sh            # builds + runs, expects rows=2
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 1/3 building the library jar (sbt package) =="
sbt -batch package | tail -2

JAR=$(ls target/scala-2.13/bunsenspark_2.13-*.jar | grep -v -- '-tests' | head -1)
echo "== 2/3 packaged artifact: $JAR =="
ls -la "$JAR"

# JDK 17 module opens: what spark-submit injects automatically
# (org.apache.spark.launcher.JavaModuleOptions); needed on a bare JVM.
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
         sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

echo "== 3/3 running the flagship slice from the packaged jar =="
# shellcheck disable=SC2086
OUT=$(java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$JAR:/opt/spark/jars/*" graft.Smoke 2>/dev/null | tail -8)
echo "$OUT"
echo "$OUT" | grep -q "rows=2" \
  && echo "QUICKSTART OK (flagship slice ran from the packaged jar)" \
  || { echo "QUICKSTART FAILED"; exit 1; }
