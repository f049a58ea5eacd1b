#!/bin/bash
# Run a graft main directly on the compiled classes — no sbt lock, no sbt
# startup. Usage: tools/run_main.sh graft.Bench [args...]
# Env passthrough identical to `sbt runMain` (fork=true javaOptions).
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
# Glob the patch version (a Scala bump must not silently break the classpath)
SCALA_LIB="$(find /root/.cache/coursier -name 'scala-library-2.13.*.jar' | sort -V | tail -1)"
if [ -z "$SCALA_LIB" ]; then
  echo "run_main.sh: no scala-library-2.13.*.jar in /root/.cache/coursier" >&2
  exit 1
fi
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# 768m code cache (default 240m): a ~170-query bench session compiles
# thousands of codegen methods; at the default size the sweeper flushes a
# row's C2-compiled code between its own interleaved slots, so pin-free
# rows (whose prime pass is skipped) re-tier inside the timed pass —
# measured as monotonically-decreasing pass times on q146/q156 and a
# 1.3-2x bump on a dozen sub-second rows. Sized so the whole catalog's
# hot code stays resident.
exec java $ADD_OPENS \
  -XX:ReservedCodeCacheSize=768m \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$REPO/target/scala-2.13/classes:$SCALA_LIB:/opt/spark/jars/*" "$@"
