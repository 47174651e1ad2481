#!/bin/bash
# r17 session-2 delta: re-bench the three graph queries whose edge
# tables became pre-partitioned persisted frames (pagerank/hits — the
# per-iteration O(E) sort-merge re-exchange removed), override their
# rows in the merged tier dumps, re-gate, and re-commit the partial
# tiers. Mirrors run_scale.sh's tier conventions exactly (x1 min-of-2,
# x100 single-iteration, per-tier partitions env).
set -e
cd "$(dirname "$0")/.."
OUT=${1:-SCALE_r17.json}
SF=/root/testdata/sf0.1
D=q_pagerank,q_pagerank_redist,q_hits

run() { # outfile sfdir [env...]
  local out=$1 dir=$2; shift 2
  if [ ! -f "target/$out" ]; then
    echo "== bench -> $out ($dir $*)"
    rm -f target/bench_full.json
    env SPARK_GRAFT_SF_DIR="$dir" "$@" sbt -batch "runMain graft.Bench" \
      2>&1 | grep -E '^\[bench\]|"metric"' || true
    if [ -f target/bench_full.json ]; then mv target/bench_full.json "target/$out"
    else echo "!! $out: bench produced no dump (crashed?)"; fi
  fi
}

run graphdelta_x1.json "$SF" SPARK_GRAFT_ONLY=$D
run graphdelta_x10.json target/scale/x10 SPARK_GRAFT_ONLY=$D
run graphdelta_x32.json target/scale/x32 SPARK_GRAFT_ONLY=$D \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=64 SPARK_GRAFT_STREAM_PARTITIONS=16
run graphdelta_x100.json target/scale/x100 SPARK_GRAFT_ONLY=$D \
  SPARK_GRAFT_ITERS=1 \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=128 SPARK_GRAFT_STREAM_PARTITIONS=32

python3 - <<'EOF'
import json
for f in (1, 10, 32, 100):
    tier = f'target/scale_x{f}.json'
    d = json.load(open(tier))
    try:
        d['queries'].update(json.load(open(f'target/graphdelta_x{f}.json'))['queries'])
    except FileNotFoundError:
        print(f'!! graphdelta_x{f}.json missing; tier left as-was')
        continue
    json.dump(d, open(tier, 'w'))
    print(f'== merged graph delta into {tier}')
EOF

mkdir -p scale_partial
for f in 1 10 32 100; do
  cp target/scale_x$f.json scale_partial/scale_x$f.json
done
git add scale_partial/scale_x*.json
git diff --cached --quiet || \
  git commit -q -m "Scale campaign partial: graph-delta override (pre-partitioned edge persists)"

python3 tools/scale_report.py "$OUT"
stale=$(find target -maxdepth 1 -name '*.json' -newer "$OUT" | sort)
if [ -n "$stale" ]; then
  echo "!! $OUT is OLDER than these dumps it should fold:"; echo "$stale"
  exit 1
fi
echo "== $OUT re-assembled, gated — COMMIT IT"
