"""iPhone offline 3DGS config (identical to splatam.py in the reference)
(reference `configs/iphone/gaussian_splatting.py`): same experiment as ./splatam.py with
scene "splatam_demo"."""
import os
from importlib.machinery import SourceFileLoader

_base = SourceFileLoader(
    "iphone_splatam_base",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "splatam.py"),
).load_module()

scene_name = "splatam_demo"
base_dir = _base.base_dir

config = dict(_base.config)
config.update(workdir=f"{base_dir}/{scene_name}", overwrite=True)
config["data"] = dict(_base.config["data"], sequence=scene_name)
