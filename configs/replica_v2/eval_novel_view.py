"""Replica-V2 novel-view-synthesis eval config
(reference `configs/replica_v2/eval_novel_view.py`): loads the SLAM result
and evaluates on the held-out test split (`use_train_split=False`)."""
import os
from importlib.machinery import SourceFileLoader

_base = SourceFileLoader(
    "replica_v2_splatam_base",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "splatam.py"),
).load_module()

use_train_split = False

config = dict(_base.config)
config["data"] = dict(_base.config["data"], use_train_split=use_train_split)
