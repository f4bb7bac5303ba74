#!/usr/bin/env bash
# Profile one query's stage timeline: runs graft.Explain <q> <sf> run2 with
# the event log on, then prints stages >0.2s with task counts — the fast way
# to spot single-task straggler stages (AQE over-coalescing before a fan-out).
# Usage: tools/profile_stages.sh <query> [sfDir] [cpus]
set -euo pipefail
Q="$1"; SF="${2:-/root/testdata/sf0.1}"; CPUS="${3:-32}"
EV=$(mktemp -d /tmp/evprof_XXXX)
SPARK_GRAFT_EVENTLOG="$EV" SPARK_GRAFT_CPUS="$CPUS" \
  "$(dirname "$0")/runjvm.sh" graft.Explain "$Q" "$SF" run2 2>/dev/null | grep '\[explain\]' || true
for z in "$EV"/eventlog_v2_local-*/events_1_local-*.zstd; do
  zstd -d -c "$z" 2>/dev/null
done > "$EV/log.json" || true
python3 - "$EV/log.json" <<'EOF'
import json,sys
stages=[]
for line in open(sys.argv[1]):
    try: e=json.loads(line)
    except: continue
    if e.get('Event')=='SparkListenerStageCompleted':
        s=e['Stage Info']
        dur=(s.get('Completion Time',0)-s.get('Submission Time',0))/1000
        stages.append((s.get('Submission Time',0),dur,s['Stage ID'],s['Number of Tasks'],s['Stage Name'][:70]))
stages.sort()
t0=stages[0][0] if stages else 0
for sub,dur,sid,nt,name in stages:
    if dur>0.2: print(f'@{(sub-t0)/1000:7.1f}s  {dur:6.2f}s stage{sid:4d} tasks={nt:4d} {name}')
EOF
rm -rf "$EV"
