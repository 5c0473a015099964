#!/bin/bash
# ScanNet multi-scene x 3-seed SLAM sweep (reference `configs/scannet/scannet.bash`)

for seed in 0 1 2
do
    SEED=${seed}
    export SEED
    for scene in 0 1 2 3 4 5
    do
        SCENE_NUM=${scene}
        export SCENE_NUM
        echo "Running scene number ${SCENE_NUM} with seed ${SEED}"
        python3 -u -m splatam_tpu.run.slam configs/scannet/scannet_eval.py
    done
done
