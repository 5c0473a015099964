"""Habitat eval-sweep config (reference `configs/habitat/habitat_eval.py`):
TUM-style heavy tracking (200 iters, window 20) on recorded habitat
sequences; scene and seed from the environment (SCENE_NUM, SEED)."""
import os
from importlib.machinery import SourceFileLoader

_base = SourceFileLoader(
    "habitat_splatam_base",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "splatam.py"),
).load_module()

scenes = ["seq2"]
seed = int(os.environ.get("SEED", 0))
scene_name = scenes[int(os.environ.get("SCENE_NUM", 0))]
run_name = f"{scene_name}_{seed}"

config = dict(_base.config)
config.update(
    seed=seed,
    run_name=run_name,
    mapping_window_size=20,
    report_global_progress_every=5,
    eval_every=5,
    checkpoint_interval=5,
)
config["data"] = dict(_base.config["data"], sequence=scene_name)
config["tracking"] = dict(_base.config["tracking"], num_iters=200)
