#!/bin/bash
# r5 post-training chip measurement queue — run AFTER the train_log_r5
# run finishes (the chip must be free; each stage compiles for minutes
# over the remote service).  Logs under /tmp/r5/.
set -x
mkdir -p /tmp/r5
cd "$(dirname "$0")/.."

# 1. Real-checkpoint qualification of every ladder rung (writes
#    train_log_r5/eval_protocol.json)
python -u tools/r4_eval_checkpoint.py train_log_r5 > /tmp/r5/eval.log 2>&1

# 2. Ladder timings at the headline config with the r5 checkpoint
#    (exact control + rungs 2/3; rung 1 re-measured for the table)
python -u tools/r5_exp1_ladder.py rife-exact rife-fast1 rife-fast2 rife-fast3 \
    > /tmp/r5/ladder.log 2>&1

# 3. H-stacked tile assembly full-graph A/B (layout-copy category)
python -u tools/r5_exp5_hstack.py > /tmp/r5/hstack.log 2>&1

echo QUEUE_DONE
