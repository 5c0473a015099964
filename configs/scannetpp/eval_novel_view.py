"""ScanNet++ novel-view-synthesis eval config
(reference `configs/scannetpp/eval_novel_view.py`): loads a finished SLAM
run's params.npz (`scene_path`) and evaluates on the held-out NVS split
(`use_train_split=False`). Scene selected via the SCENE env var (see
eval_novel_view.bash)."""
import os
from importlib.machinery import SourceFileLoader

_base = SourceFileLoader(
    "scannetpp_splatam_base",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "splatam.py"),
).load_module()

scenes = _base.scenes
seed = 0
use_train_split = False
scene_num_frames = [-1, 360] if use_train_split else [-1, -1]
scene_idx = int(os.environ.get("SCENE", 0))
scene_name = scenes[scene_idx]
num_frames = scene_num_frames[scene_idx]
group_name = "ScanNet++"
run_name = f"{scene_name}_{seed}"

config = dict(_base.config)
config.update(
    scene_path=os.path.join(
        f"./experiments/{group_name}", run_name, "params.npz"
    ),
    run_name=run_name,
    seed=seed,
    report_global_progress_every=5,
    eval_every=1,
    checkpoint_interval=5,
)
config["data"] = dict(
    _base.config["data"],
    sequence=scene_name,
    use_train_split=use_train_split,
    num_frames=num_frames,
)
