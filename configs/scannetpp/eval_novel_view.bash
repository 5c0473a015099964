#!/bin/bash
# ScanNet++ NVS eval for one scene (reference `configs/scannetpp/eval_novel_view.bash`)

SCENE=$1
export SCENE

echo "Evaluating scene number ${SCENE} with seed 0"
python3 -u -m splatam_tpu.run.eval_novel_view configs/scannetpp/eval_novel_view.py
