"""Replica eval-sweep config (reference `configs/replica/replica_eval.py`).

Same experiment as ./splatam.py; scene and seed come from the environment
(SCENE_NUM, SEED) so `replica.bash` can fan out the 8-scene x 3-seed sweep.
"""
import os
from importlib.machinery import SourceFileLoader

_base = SourceFileLoader(
    "replica_splatam_base",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "splatam.py"),
).load_module()

scenes = _base.scenes
seed = int(os.environ.get("SEED", 0))
scene_name = scenes[int(os.environ.get("SCENE_NUM", 0))]
run_name = f"{scene_name}_{seed}"

config = dict(_base.config)
config.update(seed=seed, run_name=run_name)
config["data"] = dict(_base.config["data"], sequence=scene_name)
