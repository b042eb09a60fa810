#!/bin/bash
# Run graft.Bench with the same JVM flags build.sbt injects for `sbt run`.
# REPO_DIR selects the build to run (default /root/repo) — the epoch
# reference recipe points it at a pinned-commit worktree.
REPO_DIR=${REPO_DIR:-/root/repo}
ADDOPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens $p=ALL-UNNAMED"
done
exec java $ADDOPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx${SPARK_DRIVER_MEM:-8g} \
  -cp "$REPO_DIR/target/scala-2.13/classes:/opt/spark/jars/*" \
  "${MAIN_CLASS:-graft.Bench}" "$@"
