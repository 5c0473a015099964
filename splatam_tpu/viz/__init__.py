from splatam_tpu.viz.recon import (
    interactive_recon,
    plot_trajectory,
    render_trajectory,
    rgbd2pcd,
)

__all__ = [
    "render_trajectory",
    "plot_trajectory",
    "rgbd2pcd",
    "interactive_recon",
]
