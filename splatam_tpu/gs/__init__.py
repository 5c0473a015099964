from splatam_tpu.gs.offline import gs_step, offline_splatting
from splatam_tpu.gs.post_opt import initialize_from_checkpoint, post_splatam_opt

__all__ = [
    "gs_step",
    "offline_splatting",
    "post_splatam_opt",
    "initialize_from_checkpoint",
]
