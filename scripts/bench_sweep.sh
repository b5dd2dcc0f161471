#!/bin/bash
# A/B throughput sweep on the real TPU chip (run only when no other TPU
# process is active). Writes one labelled JSON line per configuration.
set -e
OUT=${1:-results/bench_sweep.jsonl}
mkdir -p "$(dirname "$OUT")"
: > "$OUT"
run() {
  local label="$1"; shift
  echo -n "{\"config\": \"$label\", \"result\": " >> "$OUT"
  env "$@" python bench.py | tr -d '\n' >> "$OUT"
  echo "}" >> "$OUT"
  tail -1 "$OUT"
}
# bench.py defaults BENCH_FACTORED=1: pin it to 0 on the base rows so the
# A/B actually compares concat vs factored.
run n256_base      BENCH_N=256  BENCH_FACTORED=0
run n256_factored  BENCH_N=256  BENCH_FACTORED=1
run n256_bf16      BENCH_N=256  BENCH_FACTORED=0 BENCH_DTYPE=bfloat16
run n256_fact_bf16 BENCH_N=256  BENCH_FACTORED=1 BENCH_DTYPE=bfloat16
run n1024_base     BENCH_N=1024 BENCH_FACTORED=0
run n1024_factored BENCH_N=1024 BENCH_FACTORED=1
run n2048_base     BENCH_N=2048 BENCH_FACTORED=0
run n2048_factored BENCH_N=2048 BENCH_FACTORED=1
