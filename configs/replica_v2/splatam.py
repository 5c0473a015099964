"""Replica-V2 SplaTAM config (reference `configs/replica_v2/splatam.py`):
the Replica experiment on the imap-split Replica_V2 capture, running SLAM on
the train split (`use_train_split=True`)."""
import os
from importlib.machinery import SourceFileLoader

_base = SourceFileLoader(
    "replica_splatam_base",
    os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "replica",
        "splatam.py",
    ),
).load_module()

scenes = ["room_0", "room_1", "room_2",
          "office_0", "office_1", "office_2",
          "office_3", "office_4"]

seed = 0
scene_name = scenes[0]
use_train_split = True
group_name = "Replica_V2"
run_name = f"{scene_name}_{seed}"

config = dict(_base.config)
config.update(
    workdir=f"./experiments/{group_name}",
    run_name=run_name,
    seed=seed,
)
config["data"] = dict(
    _base.config["data"],
    basedir="./data/Replica_V2",
    gradslam_data_cfg="./configs/data/replica_v2.yaml",
    sequence=scene_name,
    use_train_split=use_train_split,
)
