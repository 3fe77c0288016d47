#!/bin/bash
# Per-query profile (see ProfileQueries.scala). Same JVM flags as
# tools/run_bench.sh. Usage: tools/run_profile.sh q253_curation_e2e ...
set -eu
CP_FILE=${GRAFT_CP_FILE:-/tmp/graft_cp.txt}
if [ ! -s "$CP_FILE" ]; then
  sbt -batch "export Runtime/fullClasspath" 2>/dev/null \
    | grep -E "^/" | tail -1 > "$CP_FILE"
fi
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
         sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx${SPARK_DRIVER_MEM:-8g} \
  -cp "$(cat "$CP_FILE")" graft.tools.ProfileQueries "$@"
