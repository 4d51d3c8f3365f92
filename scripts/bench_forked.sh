#!/bin/bash
# Forked-JVM-per-heavy-query bench (VERDICT r10 #5): the sf10 heavy
# tail varies up to 6x ACROSS sessions with identical bytecode because
# a long-lived JVM's heap/GC state (old-gen debt from object-agg-heavy
# predecessors like q17's percentile sketches) leaks into successor
# queries. Forking a FRESH JVM per query makes every measurement start
# from the same heap state, turning the heavy tail reproducible.
#
# Usage: bench_forked.sh <sfDir> <out.json> <query> [query...]
#
# Each query gets its own java process running graft.tools.TimeQuery
# with the query listed twice: the first TIMED line is the cold cost
# (includes codegen/JIT warmup), the second is the warm cost. out.json
# records both per query. Run the script twice back-to-back and
# compare warm costs: that is the two-cold-sessions reproducibility
# check the operational contract needs (target: within +/-20%).
set -euo pipefail
SF_DIR=$1; OUT=$2; shift 2
QUERIES=("$@")

OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

TMP=$(mktemp /tmp/bench_forked.XXXX.txt)
# FORK_REPS>1 = the median protocol: per query, REPS fresh JVMs each
# running the query ONCE (cold only); out.json reports the median —
# the reproducible operational number (a single cold run is bimodal
# for the JIT/GC-sensitive queries; a same-JVM warm rerun inherits
# the cold run's own heap debt, which is the cliff being dodged).
REPS=${FORK_REPS:-1}
for q in "${QUERIES[@]}"; do
  for ((r = 0; r < REPS; r++)); do
    # pin the page-cache variable: pre-touch every input file so each
    # fork measures compute against a warm cache, not the OS's mood
    cat "$SF_DIR"/*.parquet > /dev/null 2>&1 || true
    echo "[forked] $q (fresh JVM, rep $r)"
    if [ "$REPS" -gt 1 ]; then ARGS=("$q"); else ARGS=("$q" "$q"); fi
    java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -Xmx${SPARK_DRIVER_MEM:-100g} \
      -cp /root/repo/target/scala-2.13/classes:"/opt/spark/jars/*" \
      graft.tools.TimeQuery "$SF_DIR" "${ARGS[@]}" 2>/dev/null \
      | grep '^TIMED' | sed "s/^TIMED/FORKED $q/" | tee -a "$TMP"
  done
done

python3 - "$OUT" "$SF_DIR" "$TMP" <<'EOF'
import json, sys
out, sf, tmp = sys.argv[1], sys.argv[2], sys.argv[3]
runs = {}
for line in open(tmp):
    # FORKED <q> <q> <secs> s   (TimeQuery echoes the query name)
    parts = line.split()
    if parts and parts[0] == "FORKED":
        runs.setdefault(parts[1], []).append(float(parts[-2]))
import os, statistics
if int(os.environ.get("FORK_REPS", "1")) > 1:
    rec = {"sf": sf, "mode": "forked-jvm-median-of-colds",
           "queries": {q: {"median": round(statistics.median(v), 2),
                           "colds": v}
                       for q, v in runs.items()}}
else:
    rec = {"sf": sf, "mode": "forked-jvm-per-query",
           "queries": {q: {"cold": v[0], "warm": v[-1] if len(v) > 1 else None}
                       for q, v in runs.items()}}
with open(out, "w") as f:
    json.dump(rec, f, indent=1)
print(f"[forked] wrote {out}")
for q, v in rec["queries"].items():
    print(f"[forked] {q}: " +
          " ".join(f"{k}={x}" for k, x in v.items()))
EOF
