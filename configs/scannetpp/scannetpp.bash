#!/bin/bash
# ScanNet++ 2-scene x 3-seed SLAM sweep (reference `configs/scannetpp/scannetpp.bash`)

for seed in 0 1 2
do
    SEED=${seed}
    export SEED
    for scene in 0 1
    do
        SCENE_NUM=${scene}
        export SCENE_NUM
        echo "Running scene number ${SCENE_NUM} with seed ${SEED}"
        python3 -u -m splatam_tpu.run.slam configs/scannetpp/scannetpp_eval.py
    done
done
