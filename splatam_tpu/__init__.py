"""splatam-tpu: TPU-native Gaussian-splatting SLAM (JAX/XLA/Pallas).

See README.md for the architecture map and SURVEY.md for the reference
analysis this framework was built against.
"""

__version__ = "0.1.0"

from splatam_tpu.render.binning import RasterConfig  # noqa: F401
from splatam_tpu.render.camera import Camera, setup_camera  # noqa: F401
from splatam_tpu.render.render_tiled import rasterize_tiled  # noqa: F401

__all__ = ["RasterConfig", "Camera", "setup_camera", "rasterize_tiled", "__version__"]
