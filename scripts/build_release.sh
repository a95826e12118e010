#!/bin/bash
# Offline release-index builds from the PACKAGED jar (immutable snapshot),
# so sbt compile/test cycles can run concurrently without clobbering the
# classes the builds are executing.
set -e
JAR=/root/repo/target/scala-2.13/columbiaimagesearchspark_2.13-0.1.0.jar
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
MEM=${SPARK_DRIVER_MEM:-20g}
for shape in "$@"; do
  echo "=== building $shape ($(date +%H:%M:%S)) ==="
  java $ADD_OPENS -Xmx$MEM -XX:ReservedCodeCacheSize=512m \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$JAR:/opt/spark/jars/*" graft.BuildRelease "$shape"
done
echo "=== all done ($(date +%H:%M:%S)) ==="
