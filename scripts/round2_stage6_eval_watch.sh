#!/bin/bash
# Waits for stage-6b (DB5 fine-tune from the real-DIPS-pretrained
# checkpoint) to finish, then scores the resulting best checkpoint on the
# frozen DB5.5 test set on CPU (the TPU chip stays free for stage 7+).
cd /root/repo
Q=results/round2_queue
while ! grep -q "6b exit=" $Q/queue.log; do sleep 120; done
sleep 15
bash scripts/eval_stage6.sh > $Q/stage6_eval.log 2>&1
echo "eval exit=$?" >> $Q/stage6_eval.log
