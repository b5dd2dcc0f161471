#!/bin/bash
# Round-4 bigval ensemble, 4-member run — the protocol AS ORIGINALLY
# REGISTERED (scripts/round4_bigval_ensemble.sh): the first execution fired
# early with 3 members (the watcher's wait loop broke before the 64-dim
# member finished training), so the intended member set was never evaluated.
# This run waits for r4_bigval_big_s56's TRAINING PROCESS to exit, requires
# all 4 member checkpoints, and applies the identical selection rule
# (bootstrap argmax P(both bars) on the 4 bigval-val pose draws) and the
# identical two pre-registered frozen-test shots (selected + uniform).
# Multiplicity note for the record: this is the 2nd execution of the bigval
# protocol (plus the early-fire's 2 shots); all shots are reported.
set -u
cd /root/repo
Q=results/round4_queue
exec 8>$Q/bigval_ens4.lock
flock -n 8 || { echo "already running"; exit 1; }
log() { echo "[r4ens4] $(date '+%H:%M:%S') $*" >> $Q/queue.log; }
CPU_ENV="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu"
DB5_TEST=/root/reference/test_sets_pdb/db5_test_random_transformed

# wait (up to 2.5h) for the big member's trainer to exit AND its score row
for i in $(seq 1 300); do
  if ! ps -ef | grep -v grep | grep "cli.train" | grep -q "r4_bigval_big_s56"; then
    grep -q '"name": "r4_bigval_big_s56"' results/trial_table.jsonl && break
    # trainer gone but not scored yet (scoring in progress): wait a bit more
  fi
  sleep 30
done

MEMBERS=$(ls -d checkpts_r4/r4_bigval_s52/*/db5_model_best \
                checkpts_r4/r4_bigval_s53/*/db5_model_best \
                checkpts_r4/r4_bigval_l2_s55/*/db5_model_best \
                checkpts_r4/r4_bigval_big_s56/*/db5_model_best 2>/dev/null | paste -sd,)
N=$(echo "$MEMBERS" | tr ',' '\n' | grep -c db5_model_best || true)
if [ "$N" -lt 4 ]; then log "4-member run: only $N members — abort"; exit 1; fi
log "4-member run: $MEMBERS"

VAL_DIRS=results/valsets/bigval_transformed,results/valsets/bigval_s1,results/valsets/bigval_s2,results/valsets/bigval_s3
$CPU_ENV timeout 7200 python scripts/ensemble_weight_search.py \
  -members "$MEMBERS" -val_dirs "$VAL_DIRS" -step 8 \
  -cache results/ens_rigids_bigval4.npz -out results/ens_weight_search_bigval4.json \
  > $Q/ens_search_bigval4.log 2>&1
RC=$?
log "4-member weight search exit=$RC: $(tail -1 $Q/ens_search_bigval4.log)"
[ "$RC" -ne 0 ] && exit 1

W=$(python -c "
import json
d = json.load(open('results/ens_weight_search_bigval4.json'))
print(','.join(str(x) for x in d['top'][0]['w']))")
log "4-member selected weights: $W"

shot() {
  NAME=$1; WARG=$2
  OUT=results/db5_$NAME
  rm -rf "$OUT"; mkdir -p "$OUT"
  $CPU_ENV timeout 3000 python -m equidock_public_tpu.cli.ensemble_inference \
    -checkpoints "$MEMBERS" ${WARG:+-weights "$WARG"} \
    -input_dir $DB5_TEST/random_transformed \
    -ground_truth_dir $DB5_TEST/complexes \
    -output_dir "$OUT" -node_buckets 512,1024,2048,3072 -pocket_buckets 256 \
    > $Q/$NAME.log 2>&1
  RC=$?
  [ "$RC" -ne 0 ] && { log "$NAME inference exit=$RC"; return 1; }
  SCORE=$($CPU_ENV timeout 600 python -m equidock_public_tpu.cli.eval_outputs \
    -input_dir "$OUT" -ground_truth_dir $DB5_TEST/complexes \
    -method EQUIDOCK_TPU_ENS 2>>$Q/$NAME.log | grep num_files)
  [ -z "$SCORE" ] && { log "$NAME score FAILED"; return 1; }
  log "$NAME FROZEN TEST $SCORE"
  echo "{\"name\": \"$NAME\", \"stage\": \"r4ens_bigval4\", \"round\": 4, \"weights\": \"${WARG:-uniform}\", \"members\": \"$MEMBERS\", ${SCORE#\{}" >> results/trial_table.jsonl
}

shot ens_bigval4_selected "$W"
shot ens_bigval4_uniform ""
log "4-member bigval ensemble protocol complete"
