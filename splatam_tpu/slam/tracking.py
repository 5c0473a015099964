"""Per-frame camera tracking: pose-only Adam with best-candidate keeping.

Parity with the tracking block of `rgbd_slam` (`scripts/splatam.py:696-764`):
constant-velocity pose init, N Adam iterations on (cam_unnorm_rot, cam_trans)
against the silhouette-masked sum-L1 loss, keeping the post-step pose of the
iteration with the lowest pre-step loss.

The whole per-frame optimization runs as ONE jitted `lax.scan` — no
host<->device ping-pong per iteration (the reference pays a CUDA launch +
python step per iter; here XLA compiles the full 40-iteration loop).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from splatam_tpu.core.losses import slam_loss
from splatam_tpu.core.optim import adam_step, init_adam
from splatam_tpu.core.transforms import normalize
from splatam_tpu.render.binning import RasterConfig
from splatam_tpu.render.camera import Camera


class TrackResult(NamedTuple):
    best_rot: jax.Array  # (4,)
    best_tran: jax.Array  # (3,)
    best_loss: jax.Array  # ()
    last_losses: Dict[str, jax.Array]
    overflow: jax.Array  # () bool — any iteration overflowed capacity
    final_rot: jax.Array  # (4,) post-step pose of the LAST iteration
    final_tran: jax.Array  # (3,)
    opt: object  # AdamState — pass back via ``resume`` to continue
    nonfinite: jax.Array | int = 0  # iterations whose loss was NaN/inf
    # (their updates were skipped — see the guard in ``body``)

    @property
    def resume_state(self):
        """Carry for continuing this optimization (depth-loss-thres doubling
        continues the SAME Adam run, `scripts/splatam.py:745-758`)."""
        return (
            {"rot": self.final_rot, "tran": self.final_tran},
            self.opt,
            self.best_rot,
            self.best_tran,
            self.best_loss,
        )


@partial(jax.jit, static_argnames=("prop",))
def _init_pose_jit(cam_rots, cam_trans, t, prop):
    def at(arr, idx):
        return jax.lax.dynamic_slice_in_dim(arr, idx, 1, axis=2)[0, :, 0]

    if prop:
        prev_rot1 = normalize(at(cam_rots, t - 1))
        prev_rot2 = normalize(at(cam_rots, t - 2))
        new_rot = normalize(prev_rot1 + (prev_rot1 - prev_rot2))
        prev_t1 = at(cam_trans, t - 1)
        prev_t2 = at(cam_trans, t - 2)
        new_tran = prev_t1 + (prev_t1 - prev_t2)
    else:
        new_rot = at(cam_rots, t - 1)
        new_tran = at(cam_trans, t - 1)
    return new_rot, new_tran


def initialize_camera_pose(
    cam_rots: jax.Array, cam_trans: jax.Array, time_idx: int, forward_prop: bool
) -> Tuple[jax.Array, jax.Array]:
    """Constant-velocity initialization (`scripts/splatam.py:429-448`).

    The frame index is traced (see core.params.get_pose) so the program
    compiles once, not once per frame."""
    return _init_pose_jit(
        cam_rots, cam_trans, jnp.asarray(time_idx, jnp.int32),
        bool(time_idx > 1 and forward_prop),
    )


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "num_iters", "use_sil_for_loss", "sil_thres",
        "ignore_outlier_depth_loss", "loss_w_im", "loss_w_depth",
        "lr_rot", "lr_tran", "fixed_binning",
    ),
)
def track_frame(
    params: Dict[str, jax.Array],
    active: jax.Array,
    rot0: jax.Array,
    tran0: jax.Array,
    frame_im: jax.Array,
    frame_depth: jax.Array,
    cam: Camera,
    cfg: RasterConfig,
    num_iters: int,
    use_sil_for_loss: bool = True,
    sil_thres: float = 0.99,
    ignore_outlier_depth_loss: bool = False,
    loss_w_im: float = 0.5,
    loss_w_depth: float = 1.0,
    lr_rot: float = 0.0004,
    lr_tran: float = 0.002,
    fixed_binning: bool = False,
    resume=None,
    binned=None,
) -> TrackResult:
    """``resume`` (a previous result's ``.resume_state``) continues the same
    Adam optimization — pose, moments, step count, and running best candidate
    all carry over, matching the reference's `do_continue_slam` doubling
    (`scripts/splatam.py:745-758`) which extends the SAME optimizer run
    rather than restarting."""
    if resume is None:
        pose0 = {"rot": rot0, "tran": tran0}
        opt0 = init_adam(pose0)
        best0 = (rot0, tran0, jnp.float32(1e20))
    else:
        pose0, opt0, b_rot, b_tran, b_loss = resume
        best0 = (b_rot, b_tran, b_loss)

    if binned is None and fixed_binning:
        # Bin once at the initial pose and reuse the instance stream for
        # every iteration: tracking moves the camera millimeters per step,
        # so tile assignment and depth order are effectively constant while
        # the blend geometry (means2d/conic per iteration) stays exact.
        # The SLAM driver instead passes ``binned`` explicitly and re-bins
        # every rebin_every iterations (chunked via ``resume``).
        from splatam_tpu.core.losses import compute_binned

        binned = compute_binned(params, active, rot0, tran0, cam, cfg)

    def loss_fn(pose):
        out = slam_loss(
            params, active, pose["rot"], pose["tran"], frame_im, frame_depth,
            cam, cfg,
            tracking=True,
            loss_w_im=loss_w_im, loss_w_depth=loss_w_depth,
            use_sil_for_loss=use_sil_for_loss, sil_thres=sil_thres,
            ignore_outlier_depth_loss=ignore_outlier_depth_loss,
            binned=binned,
        )
        return out.loss, out

    def body(carry, _):
        pose, opt, best_rot, best_tran, best_loss, overflow, nonfinite = carry
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(pose)
        # NaN/inf-loss guard: a divergent iteration (bad frame data, a blown
        # pose) must not poison the pose or the Adam moments — skip its
        # update and keep optimizing from the last good state.
        finite = jnp.isfinite(loss)
        new_pose, new_opt = adam_step(
            pose, grads, opt, {"rot": lr_rot, "tran": lr_tran}, eps=1e-8
        )
        pose, opt = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old),
            (new_pose, new_opt), (pose, opt),
        )
        better = (loss < best_loss) & finite
        best_rot = jnp.where(better, pose["rot"], best_rot)
        best_tran = jnp.where(better, pose["tran"], best_tran)
        best_loss = jnp.where(better, loss, best_loss)
        overflow = overflow | out.overflow
        nonfinite = nonfinite + (~finite).astype(jnp.int32)
        carry = (pose, opt, best_rot, best_tran, best_loss, overflow, nonfinite)
        return carry, out.losses

    carry0 = (pose0, opt0, best0[0], best0[1], best0[2], jnp.bool_(False),
              jnp.int32(0))
    (
        (pose, opt, best_rot, best_tran, best_loss, overflow, nonfinite),
        losses_hist,
    ) = jax.lax.scan(body, carry0, None, length=num_iters)
    last_losses = jax.tree.map(lambda x: x[-1], losses_hist)
    return TrackResult(
        best_rot=best_rot,
        best_tran=best_tran,
        best_loss=best_loss,
        last_losses=last_losses,
        overflow=overflow,
        final_rot=pose["rot"],
        final_tran=pose["tran"],
        opt=opt,
        nonfinite=nonfinite,
    )
