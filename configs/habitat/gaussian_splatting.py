"""Habitat offline 3DGS config
(reference `configs/habitat/gaussian_splatting.py`): GT-pose splatting on a
recorded habitat sequence with a low-res init pass (300x170) and 15 mapping
iters per frame."""
import os
from importlib.machinery import SourceFileLoader

_base = SourceFileLoader(
    "habitat_splatam_base",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "splatam.py"),
).load_module()

scenes = ["seq3"]
scene_name = scenes[0]
seed = 0
run_name = f"{scene_name}_{seed}"

config = dict(_base.config)
config.update(
    run_name=run_name,
    mapping_window_size=24,
    report_global_progress_every=5,
    eval_every=5,
    checkpoint_interval=5,
)
config["data"] = dict(
    _base.config["data"],
    sequence=scene_name,
    desired_image_height_init=170,
    desired_image_width_init=300,
)
config["mapping"] = dict(_base.config["mapping"], num_iters=15)
