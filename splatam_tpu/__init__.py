"""splatam-tpu: TPU-native Gaussian-splatting SLAM (JAX/XLA/Pallas).

See README.md for the architecture map and SURVEY.md for the reference
analysis this framework was built against.
"""

__version__ = "0.1.0"

import os as _os

if (
    _os.environ.get("SPLATAM_TPU_NO_COMPILATION_CACHE", "0") != "1"
    and "cpu" not in _os.environ.get("JAX_PLATFORMS", "")
):
    # Persistent compilation cache: TPU compiles of the SLAM programs cost
    # 20-120 s each (remote compile helper); the cache turns reruns into
    # ~3 s loads. CPU runs skip it: XLA:CPU caches machine-specialized AOT
    # executables whose (de)serialization can hard-abort the process on
    # feature mismatch, and CPU compiles are cheap anyway.
    try:
        import jax as _jax

        def _host_key() -> str:
            # XLA:CPU caches AOT-compiled executables specialized to the
            # compiling machine's CPU features; loading them on a different
            # machine hard-aborts the process ("Target machine feature ...
            # is not supported on the host machine"). Keying the cache dir
            # by the host's CPU flags keeps heterogeneous machines (e.g. a
            # shared NFS home) from ever sharing AOT artifacts.
            import hashlib
            import platform

            ident = platform.machine()
            try:
                with open("/proc/cpuinfo") as f:
                    for line in f:
                        if line.startswith("flags"):
                            ident += line
                            break
            except OSError:
                ident += platform.processor()
            return hashlib.sha1(ident.encode()).hexdigest()[:12]

        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get(
                "SPLATAM_TPU_COMPILATION_CACHE",
                _os.path.expanduser(f"~/.cache/splatam_tpu_jax/{_host_key()}"),
            ),
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from splatam_tpu.render.binning import RasterConfig  # noqa: F401
from splatam_tpu.render.camera import Camera, setup_camera  # noqa: F401
from splatam_tpu.render.render_tiled import rasterize_tiled  # noqa: F401

__all__ = ["RasterConfig", "Camera", "setup_camera", "rasterize_tiled", "__version__"]
