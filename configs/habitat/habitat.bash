#!/bin/bash
# Habitat multi-scene x 3-seed SLAM sweep (reference `configs/habitat/habitat.bash`)

for seed in 0 1 2
do
    SEED=${seed}
    export SEED
    for scene in 0
    do
        SCENE_NUM=${scene}
        export SCENE_NUM
        echo "Running scene number ${SCENE_NUM} with seed ${SEED}"
        python3 -u -m splatam_tpu.run.slam configs/habitat/habitat_eval.py
    done
done
