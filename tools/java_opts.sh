# Shared JVM flags for standalone (non-sbt) drives of the graft classes.
# Mirrors build.sbt javaOptions — keep the three in sync via THIS file:
# build.sbt remains the sbt-side source; bench.sh/preflight.sh source this.
GRAFT_ADD_OPENS=""
for _p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
          java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  GRAFT_ADD_OPENS="$GRAFT_ADD_OPENS --add-opens java.base/$_p=ALL-UNNAMED"
done
for _p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  GRAFT_ADD_OPENS="$GRAFT_ADD_OPENS --add-opens java.base/$_p=ALL-UNNAMED"
done
GRAFT_JAVA_OPTS="$GRAFT_ADD_OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"
GRAFT_CLASSPATH="target/scala-2.13/classes:/opt/spark/jars/*"
