#!/usr/bin/env bash
# Run a graft main off the compiled classes WITHOUT sbt (no sbt-lock
# contention with a concurrent `sbt test`; see .claude/skills/verify —
# never overlap two sbt processes on this repo). Mirrors build.sbt's
# forked-JVM options (JDK-17 add-opens, 24g heap, 2g code cache, UTC).
#   tools/run_main.sh graft.Bench
#   SPARK_GRAFT_SF_DIR=target/sf10 tools/run_main.sh graft.Bench
#   tools/run_main.sh graft.tools.ScaleData /root/testdata/sf0.1 target/sf10 100
set -euo pipefail
cd "$(dirname "$0")/.."
OPENS=(java.lang java.lang.invoke java.lang.reflect java.io java.net \
  java.nio java.util java.util.concurrent java.util.concurrent.atomic)
FLAGS=()
for p in "${OPENS[@]}"; do FLAGS+=(--add-opens "java.base/$p=ALL-UNNAMED"); done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  FLAGS+=(--add-opens "java.base/$p=ALL-UNNAMED")
done
exec java "${FLAGS[@]}" \
  "-Xmx${SPARK_DRIVER_MEM:-24g}" -XX:ReservedCodeCacheSize=2g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@"
