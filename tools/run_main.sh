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
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$REPO/target/scala-2.13/classes:$SCALA_LIB:/opt/spark/jars/*" "$@"
