#!/usr/bin/env bash
# Over-heap state-store comparison (round-7 verdict item 4): run the
# StreamBench state-stress pipeline in a FORKED JVM with -Xmx pinned BELOW
# the state size, once per provider. The default HDFS-backed store keeps
# all state on-heap — it must degrade (GC thrash) or die (OOM); RocksDB
# keeps state in native memory + local SSTs and should complete. Records
# whatever actually happens, including the failure mode.
#
# Usage: tools/overheap_bench.sh [heap_mb=1200] [keys=12000000]
#                                [rows_per_batch=1000000] [batches=14]
set -u
HEAP_MB="${1:-1200}"
KEYS="${2:-12000000}"
ROWS="${3:-1000000}"
BATCHES="${4:-14}"
TIMEOUT="${OVERHEAP_TIMEOUT:-900}"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED
--add-opens=java.base/java.lang.invoke=ALL-UNNAMED
--add-opens=java.base/java.lang.reflect=ALL-UNNAMED
--add-opens=java.base/java.io=ALL-UNNAMED
--add-opens=java.base/java.net=ALL-UNNAMED
--add-opens=java.base/java.nio=ALL-UNNAMED
--add-opens=java.base/java.util=ALL-UNNAMED
--add-opens=java.base/java.util.concurrent=ALL-UNNAMED
--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED
--add-opens=java.base/jdk.internal.ref=ALL-UNNAMED
--add-opens=java.base/sun.nio.ch=ALL-UNNAMED
--add-opens=java.base/sun.nio.cs=ALL-UNNAMED
--add-opens=java.base/sun.security.action=ALL-UNNAMED
--add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

for STORE in default rocksdb; do
  echo "=== provider=$STORE heap=${HEAP_MB}m keys=$KEYS rows/batch=$ROWS batches=$BATCHES ==="
  SPARK_GRAFT_STATESTORE="$STORE" SPARK_GRAFT_STRESS_KEYS="$KEYS" \
    timeout "$TIMEOUT" java -Xmx"${HEAP_MB}m" $OPENS \
    -Djdk.reflect.useDirectMethodHandle=false \
    -cp "$CP" graft.tools.StreamBench "$ROWS" "$BATCHES" 2>"/tmp/overheap_$STORE.err" \
    | grep STREAMBENCH
  # the JVM/timeout status, not grep's — a missing STREAMBENCH line with a
  # clean JVM exit and a crashed JVM must be distinguishable
  rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    echo "provider=$STORE FAILED rc=$rc (124=timeout). Last stderr lines:"
    grep -E "OutOfMemoryError|GC overhead|Killed|ERROR" "/tmp/overheap_$STORE.err" | tail -5
  fi
done
