#!/bin/bash
# Round-4 bigval-ensemble selection + single frozen-test shot (CPU only).
#
# PRE-REGISTERED PROTOCOL (written before any member finished training):
#   * members: the cv_bigval-trained checkpoints r4_bigval_s52, r4_bigval_s53,
#     r4_bigval_l2_s55, r4_bigval_big_s56 — whichever exist, minimum 3. These
#     models never saw the 55 bigval-val complexes (train split = 173 pairs
#     disjoint from val), so weight selection on bigval-val is clean.
#   * selection: weight-simplex step 8 over the members, 4 bigval-val pose
#     draws, bootstrap 400 complex resamples; pick argmax P(both bars),
#     tie-break point bar (scripts/ensemble_weight_search.py).
#   * frozen test: TWO pre-registered shots, each run once and reported
#     regardless of outcome — (1) the selected weighting, (2) the UNIFORM
#     ensemble of the same members (no tuning; robustness control).
set -u
cd /root/repo
Q=results/round4_queue
exec 8>$Q/bigval_ens.lock
flock -n 8 || { echo "already running"; exit 1; }
log() { echo "[r4ens] $(date '+%H:%M:%S') $*" >> $Q/queue.log; }
CPU_ENV="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu"
DB5_TEST=/root/reference/test_sets_pdb/db5_test_random_transformed

# wait (up to 4h) for at least 3 members
for i in $(seq 1 480); do
  MEMBERS=$(ls -d checkpts_r4/r4_bigval_s52/*/db5_model_best \
                  checkpts_r4/r4_bigval_s53/*/db5_model_best \
                  checkpts_r4/r4_bigval_l2_s55/*/db5_model_best \
                  checkpts_r4/r4_bigval_big_s56/*/db5_model_best 2>/dev/null | paste -sd,)
  N=$(echo "$MEMBERS" | tr ',' '\n' | grep -c db5_model_best || true)
  [ "$N" -ge 4 ] && break
  # after 3 members exist, give the 4th 100 more minutes then proceed
  # (the bench block runs on the TPU between member M2 and member M3, so
  # the 4th checkpoint lands ~70-90 min after the 3rd; timing-only change,
  # made before any member scores were seen by this protocol)
  if [ "$N" -ge 3 ]; then
    WAITED3=$((${WAITED3:-0}+1)); [ "$WAITED3" -ge 200 ] && break
  fi
  sleep 30
done
N=$(echo "$MEMBERS" | tr ',' '\n' | grep -c db5_model_best || true)
if [ "$N" -lt 3 ]; then log "bigval ensemble: only $N members after wait — abort"; exit 1; fi
log "bigval ensemble: $N members: $MEMBERS"

VAL_DIRS=results/valsets/bigval_transformed,results/valsets/bigval_s1,results/valsets/bigval_s2,results/valsets/bigval_s3
$CPU_ENV timeout 7200 python scripts/ensemble_weight_search.py \
  -members "$MEMBERS" -val_dirs "$VAL_DIRS" -step 8 \
  -cache results/ens_rigids_bigval.npz -out results/ens_weight_search_bigval.json \
  > $Q/ens_search_bigval.log 2>&1
RC=$?
log "bigval weight search exit=$RC: $(tail -1 $Q/ens_search_bigval.log)"
[ "$RC" -ne 0 ] && exit 1

W=$(python -c "
import json
d = json.load(open('results/ens_weight_search_bigval.json'))
print(','.join(str(x) for x in d['top'][0]['w']))")
log "selected weights: $W"

shot() {  # shot NAME WEIGHTS(,-sep or empty for uniform)
  NAME=$1; WARG=$2
  OUT=results/db5_$NAME
  rm -rf "$OUT"; mkdir -p "$OUT"
  $CPU_ENV timeout 2400 python -m equidock_public_tpu.cli.ensemble_inference \
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
  echo "{\"name\": \"$NAME\", \"stage\": \"r4ens_bigval\", \"round\": 4, \"weights\": \"${WARG:-uniform}\", \"members\": \"$MEMBERS\", ${SCORE#\{}" >> results/trial_table.jsonl
}

shot ens_bigval_selected "$W"
shot ens_bigval_uniform ""
log "bigval ensemble protocol complete"
