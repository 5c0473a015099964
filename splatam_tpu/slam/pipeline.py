"""The SplaTAM SLAM driver: interleaved tracking, densification, mapping.

TPU-native re-expression of `rgbd_slam` (`scripts/splatam.py:461-1010`):
the frame stream is inherently sequential, so the driver is a host loop, but
each phase runs as a single jitted program — full-frame tracking is one
`lax.scan`, each mapping iteration one jitted step. Data-dependent map growth
happens host-side into capacity-padded arrays (recompiles only when capacity
doubles).

Config schema matches the reference's experiment dicts
(`configs/replica/splatam.py:21-136`) so configs port 1:1.
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from splatam_tpu.core.params import (
    GAUSSIAN_KEYS,
    Params,
    Variables,
    capacity_of,
    get_pose,
    grow_capacity,
    num_active,
    set_pose,
)
from splatam_tpu.core.losses import compute_binned
from splatam_tpu.core.transforms import matrix_to_quaternion, pose_to_w2c
from splatam_tpu.render.binning import RasterConfig, alignment_order
from splatam_tpu.slam.densify import add_new_gaussians
from splatam_tpu.slam.initialize import initialize_first_timestep
from splatam_tpu.slam.inria_densify import (
    accumulate_mean2d_gradient,
    densify as inria_densify,
)
from splatam_tpu.slam.keyframes import keyframe_selection_overlap
from splatam_tpu.slam.mapping import (
    init_mapping_optimizer,
    map_step,
    prune_gaussians,
)
from splatam_tpu.slam.tracking import initialize_camera_pose, track_frame


def _as_frame(color, depth):
    """(H,W,3) [0..255], (H,W,1) -> jnp (3,H,W) [0..1], (1,H,W)."""
    im = jnp.asarray(np.transpose(np.asarray(color), (2, 0, 1)) / 255.0, jnp.float32)
    d = jnp.asarray(np.transpose(np.asarray(depth), (2, 0, 1)), jnp.float32)
    return im, d


class _RasterSizer:
    """Quantized snug-capacity cache for `binning.shrink_binned`.

    The safe binning capacities (max_instances-derived) size every
    downstream static shape — kernel grid, stream gather, reduction sort —
    at the worst case, which at SLAM scale wastes ~2x device time per
    iteration (PROFILE.md round-3 SLAM section). `observe` host-fetches a
    fresh binning's real sizes (one ~35 ms sync, amortized over a rebin
    segment) and rounds them up to coarse quanta; `apply` slices binned
    results to the cached tier. Tiers move only on growth past the cap or
    a 2x shrink, so render programs compile a handful of times per run.
    Mid-phase overflow of a tier is flagged by shrink_binned and handled by
    the caller's existing overflow retry (which must `reset` the sizer).
    """

    STREAM_Q = 128 * 1024
    CHUNK_Q = 1024
    MARGIN = 1.15  # immediate safety margin over the observed sizes
    HEADROOM = 1.45  # growth headroom baked into a NEW tier

    def __init__(self, chunk: int):
        self.chunk = chunk
        self.ks: int | None = None
        self.nc: int | None = None
        self.nct: int | None = None  # split-layout tail-chunk tier

    def reset(self) -> None:
        self.ks = self.nc = self.nct = None

    def observe(self, binned) -> None:
        rows = getattr(binned, "stream_rows", None)
        rows = int(binned.num_instances) if rows is None else int(rows)

        def _rup(v, q):
            return max(((int(v) + q - 1) // q) * q, q)

        ks_need = _rup(rows * self.MARGIN + self.chunk, self.STREAM_Q)
        if getattr(binned, "tsl", None) is not None:  # split layout
            used = int(binned.used_interior)
            nct_need = _rup(int(binned.used_tail) * self.MARGIN + 2,
                            self.CHUNK_Q)
        else:
            used = int(binned.padded_total) // self.chunk
            nct_need = 0
        nc_need = _rup(used * self.MARGIN + 2, self.CHUNK_Q)
        if (
            self.ks is None
            or ks_need > self.ks or nc_need > self.nc
            or (self.nct or 0) < nct_need
            or ks_need * 3 < self.ks or nc_need * 3 < self.nc
        ):
            # every tier change recompiles the phase programs (60-120 s
            # each through the remote-compile tunnel), so new tiers carry
            # geometric growth headroom — O(log) changes per run, not one
            # per quantum crossing of a steadily densifying map
            self.ks = _rup(ks_need * self.HEADROOM, self.STREAM_Q)
            self.nc = _rup(nc_need * self.HEADROOM, self.CHUNK_Q)
            self.nct = _rup(nct_need * self.HEADROOM, self.CHUNK_Q)

    def apply(self, binned):
        from splatam_tpu.render.binning import shrink_binned

        if self.ks is None:
            return binned
        if getattr(binned, "tsl", None) is not None:  # split layout
            nc = min(self.nc, binned.chunk_meta.shape[0])
            nct = min(self.nct, binned.tmeta.shape[0])
            if (
                nc >= binned.chunk_meta.shape[0]
                and nct >= binned.tmeta.shape[0]
            ):
                return binned
            return shrink_binned(
                binned, self.chunk, nc * self.chunk, nc,
                max_chunks_tail=nct,
            )
        stream = binned.sorted_gid
        ks = min(self.ks, stream.shape[0] // self.chunk * self.chunk)
        nc = min(self.nc, binned.chunk_meta.shape[0])
        if ks >= stream.shape[0] and nc >= binned.chunk_meta.shape[0]:
            return binned
        return shrink_binned(binned, self.chunk, ks, nc)


def resolve_auto_layout(
    total_instances: int, num_tiles: int, chunk: int
) -> str:
    """Density-adaptive stream-layout choice (see the call site in
    rgbd_slam): split's window-waste win shrinks as tiles get denser while
    its tail/binning overheads don't — measured crossover near 2
    chunks/tile (PROFILE.md r5: 212 inst/tile split wins, 308+ aligned
    wins, SLAM maps 522+)."""
    dens = total_instances / max(num_tiles, 1)
    return "split" if dens < 2 * chunk else "aligned"


def _bump_raster(cfg: RasterConfig) -> RasterConfig:
    """Double the instance capacities after an overflow (recompile event).

    Snug post-cull capacities (max_stream/max_chunks, if a caller pre-sized
    them) are reset to their safe defaults rather than doubled — the next
    sized probe can re-tighten them.
    """
    return dataclasses.replace(
        cfg,
        max_instances=cfg.max_instances * 2,
        max_per_tile=cfg.max_per_tile * 2,
        max_stream=None,
        max_chunks=None,
    )


def _set_pose(params: Params, time_idx: int, rot, tran) -> Params:
    return set_pose(params, time_idx, rot, tran)


class SlamState:
    """Mutable host-side SLAM state (params/variables/keyframes/telemetry)."""

    def __init__(self):
        self.params: Params = {}
        self.variables: Variables = {}
        self.keyframe_list: List[Dict] = []
        self.keyframe_time_indices: List[int] = []
        self.gt_w2c_all: List[np.ndarray] = []
        self.cam = None
        self.intrinsics = None
        self.first_w2c = None
        self.scene_radius = 0.0
        self.timing = {
            "tracking_iter": [], "tracking_frame": [],
            "mapping_iter": [], "mapping_frame": [],
        }
        self.log_fn = None  # optional metrics sink (e.g. wandb_run.log)
        # NaN/inf-loss iterations whose updates were skipped (the guards in
        # tracking.track_frame / mapping.map_step). Accumulated as lazy
        # device scalars — no per-frame host sync — and fetched once at the
        # end of rgbd_slam.
        self.nonfinite = {"tracking": 0, "mapping": 0}


def rgbd_slam(
    config: Dict,
    dataset,
    tracking_dataset=None,
    densify_dataset=None,
    progress: bool = True,
    frame_callback=None,
) -> SlamState:
    """Run SplaTAM over ``dataset`` (sequence of (color, depth, K, c2w pose)).

    ``tracking_dataset`` / ``densify_dataset`` optionally provide the same
    sequence at different resolutions (SplaTAM-S: track full-res, densify
    half-res — `scripts/splatam.py:504-607`). Returns the final SlamState
    (params include the camera trajectory).
    """
    cfg_track = config["tracking"]
    cfg_map = config["mapping"]
    raster_cfg = RasterConfig(**config.get("raster", {}))
    rng = np.random.default_rng(config.get("seed", 0))
    # snug-capacity tiers for the render programs (see _RasterSizer)
    track_sizer = _RasterSizer(raster_cfg.chunk)
    map_sizer = _RasterSizer(raster_cfg.chunk)

    num_frames = config["data"].get("num_frames", -1)
    if num_frames == -1:
        num_frames = len(dataset)

    state = SlamState()
    if config.get("use_wandb", False):
        try:
            import wandb

            run = wandb.init(**config.get("wandb", {}))
            state.log_fn = run.log
        except ImportError:
            print("[warn] use_wandb=True but wandb is not installed; skipping")

    # --- frame 0 initialization ---
    color, depth, intrinsics, pose = dataset[0]
    params, variables, k3, first_w2c, cam, scene_radius = initialize_first_timestep(
        np.asarray(color), np.asarray(depth), np.asarray(intrinsics),
        np.asarray(pose), num_frames,
        config["scene_radius_depth_ratio"],
        config.get("gaussian_distribution", "isotropic"),
        config.get("mean_sq_dist_method", "projective"),
    )
    # Pre-sizing the map capacity avoids the growth-doubling recompiles
    # (each one recompiles the tracking scan + mapping step, 1-2 min on TPU).
    cap_hint = config.get("map_capacity")
    if cap_hint and cap_hint > capacity_of(params):
        params, variables, _ = grow_capacity(params, variables, None, cap_hint)
    state.cam, state.intrinsics, state.first_w2c = cam, k3, first_w2c
    state.scene_radius = scene_radius

    # --- density-adaptive stream layout ------------------------------------
    # The split layout's win is WINDOW WASTE (~chunk/2 masked slots per
    # tile), which shrinks as tiles get denser, while its tail-chunk and
    # binning overheads do not: measured crossover sits near 2 chunks/tile
    # (200k bench scene, 212 inst/tile: split 26.6 vs aligned 25.4 Mpix/s;
    # 900k scene, 308 inst/tile: split 52.3 vs aligned 45.7 ms/iter —
    # PROFILE.md r5). SLAM maps backproject every pixel and run dense
    # (>600 inst/tile), so configs that don't pin a layout get it resolved
    # from frame 0's measured instance density, once per run.
    if "layout" not in config.get("raster", {}):
        from splatam_tpu.core.losses import count_instances

        total0 = int(
            jax.jit(count_instances)(
                {k: v for k, v in params.items() if not k.startswith("cam_")},
                variables["active"],
                jnp.asarray(np.array([1, 0, 0, 0], np.float32)),
                jnp.zeros(3, jnp.float32),
                cam,
            )
        )
        gx0 = (cam.image_width + 15) // 16
        gy0 = (cam.image_height + 15) // 16
        auto_layout = resolve_auto_layout(
            total0, gx0 * gy0, raster_cfg.chunk
        )
        raster_cfg = dataclasses.replace(raster_cfg, layout=auto_layout)
        print(
            f"[info] auto layout: {auto_layout} "
            f"({total0} instances, {total0 / max(gx0 * gy0, 1):.0f}/tile "
            f"at frame 0)"
        )

    # separate-resolution cameras (`scripts/splatam.py:557-607`)
    from splatam_tpu.render.camera import setup_camera as _setup_camera

    track_cam, densify_cam, densify_k3 = cam, cam, k3
    if tracking_dataset is not None:
        tc, _, tk, _ = tracking_dataset[0]
        track_cam = _setup_camera(
            np.asarray(tc).shape[1], np.asarray(tc).shape[0],
            np.asarray(tk)[:3, :3], first_w2c,
        )
    if densify_dataset is not None:
        dc, _, dk, _ = densify_dataset[0]
        densify_k3 = np.asarray(dk)[:3, :3]
        densify_cam = _setup_camera(
            np.asarray(dc).shape[1], np.asarray(dc).shape[0],
            densify_k3, first_w2c,
        )

    lrs_map = tuple(sorted(cfg_map["lrs"].items()))
    gauss_lrs = tuple((k, v) for k, v in lrs_map if not k.startswith("cam_"))
    # bundle adjustment (`get_loss` do_ba, `scripts/splatam.py:232-238`):
    # mapping also optimizes the sampled keyframe's pose with the cam lrs
    do_ba = bool(cfg_map.get("do_ba", False))
    map_lrs = lrs_map if do_ba else gauss_lrs

    # --- checkpoint resume (`scripts/splatam.py:624-658`) ---
    start_frame = 0
    if config.get("load_checkpoint", False):
        from splatam_tpu.utils.checkpoint import load_params

        ckpt_idx = config["checkpoint_time_idx"]
        ckpt_dir = os.path.join(config["workdir"], config["run_name"])
        params, variables, extras = load_params(
            os.path.join(ckpt_dir, f"params{ckpt_idx}.npz")
        )
        kf_inds = np.load(
            os.path.join(ckpt_dir, f"keyframe_time_indices{ckpt_idx}.npy")
        )
        for t in range(ckpt_idx):
            color, depth, _, pose = dataset[t]
            state.gt_w2c_all.append(
                np.linalg.inv(np.asarray(pose, dtype=np.float64))
            )
            if t in kf_inds:
                frame_im, frame_depth = _as_frame(color, depth)
                curr_w2c = np.asarray(pose_to_w2c(*get_pose(params, t)))
                state.keyframe_list.append(
                    {"id": t, "est_w2c": curr_w2c, "im": frame_im,
                     "depth": frame_depth}
                )
                state.keyframe_time_indices.append(t)
        start_frame = ckpt_idx

    for time_idx in range(start_frame, num_frames):
        if frame_callback is not None:
            # observability hook (e.g. tools/slam_bench.py --profile_last
            # starts a jax.profiler trace before the final frame)
            frame_callback(time_idx, state)
        color, depth, _, pose = dataset[time_idx]
        gt_w2c = np.linalg.inv(np.asarray(pose, dtype=np.float64))
        state.gt_w2c_all.append(gt_w2c)
        frame_im, frame_depth = _as_frame(color, depth)
        if tracking_dataset is not None:
            tc, td, _, _ = tracking_dataset[time_idx]
            track_im, track_depth = _as_frame(tc, td)
        else:
            track_im, track_depth = frame_im, frame_depth

        # --- tracking ---
        t0 = time.time()
        if time_idx > 0:
            rot0, tran0 = initialize_camera_pose(
                params["cam_unnorm_rots"], params["cam_trans"], time_idx,
                forward_prop=cfg_track["forward_prop"],
            )
            if cfg_track["use_gt_poses"]:
                rel = jnp.asarray(gt_w2c, jnp.float32)
                rot = matrix_to_quaternion(rel[:3, :3])
                params = _set_pose(params, time_idx, rot, rel[:3, 3])
            else:
                n_iters = cfg_track["num_iters"]

                # jitted programs must not see the trajectory arrays:
                # their length varies per sequence and would retrace (and
                # cache-miss) every big program for every new num_frames
                gauss_only = {k: params[k] for k in GAUSSIAN_KEYS}

                def run_track_once(n, resume=None, binned=None):
                    return track_frame(
                        gauss_only, variables["active"], rot0, tran0,
                        track_im, track_depth, track_cam, raster_cfg,
                        num_iters=n,
                        resume=resume,
                        binned=binned,
                        use_sil_for_loss=cfg_track["use_sil_for_loss"],
                        sil_thres=cfg_track["sil_thres"],
                        ignore_outlier_depth_loss=cfg_track["ignore_outlier_depth_loss"],
                        loss_w_im=cfg_track["loss_weights"]["im"],
                        loss_w_depth=cfg_track["loss_weights"]["depth"],
                        lr_rot=cfg_track["lrs"]["cam_unnorm_rots"],
                        lr_tran=cfg_track["lrs"]["cam_trans"],
                        fixed_binning=cfg_track.get("fixed_binning", False),
                    )

                # Binning is frozen for `rebin_every` consecutive iterations
                # and recomputed at the then-current pose (tile membership
                # and depth order are pose-coherent across mm-scale Adam
                # steps; the blend stays exact). rebin_every=0 restores the
                # reference's per-iteration re-sort inside one dispatch.
                rebin = cfg_track.get("rebin_every", 10)

                # live tracking-loss diagnostic figure, once per dispatch
                # boundary (`scripts/splatam.py:299-344` draws per torch
                # iteration; here iterations run fused inside one scan, so
                # the figure refreshes per rebin segment)
                viz_track = cfg_track.get("visualize_tracking_loss", False)
                plot_dir = os.path.join(
                    config.get("workdir", "."), "plots"
                )

                def _viz_segment(res, iteration):
                    from splatam_tpu.core.losses import slam_loss
                    from splatam_tpu.viz.plots import save_tracking_loss_viz

                    out = slam_loss(
                        {**params, **gauss_only}, variables["active"],
                        res.final_rot, res.final_tran, track_im, track_depth,
                        track_cam, raster_cfg,
                        tracking=True,
                        loss_w_im=cfg_track["loss_weights"]["im"],
                        loss_w_depth=cfg_track["loss_weights"]["depth"],
                        use_sil_for_loss=cfg_track["use_sil_for_loss"],
                        sil_thres=cfg_track["sil_thres"],
                        ignore_outlier_depth_loss=cfg_track[
                            "ignore_outlier_depth_loss"
                        ],
                    )
                    save_tracking_loss_viz(
                        np.asarray(out.im), np.asarray(out.depth),
                        np.asarray(out.silhouette), np.asarray(track_im),
                        np.asarray(track_depth),
                        {k: float(v) for k, v in out.losses.items()},
                        plot_dir, iteration,
                        use_sil_for_loss=cfg_track["use_sil_for_loss"],
                        sil_thres=cfg_track["sil_thres"],
                        ignore_outlier_depth_loss=cfg_track[
                            "ignore_outlier_depth_loss"
                        ],
                        time_idx=time_idx,
                    )

                def run_track(n, resume=None):
                    if not rebin or cfg_track.get("fixed_binning", False):
                        res = run_track_once(n, resume=resume)
                        if viz_track:
                            _viz_segment(res, n)
                        return res
                    res, done, prev_binned = None, 0, None
                    while done < n:
                        step = min(rebin, n - done)
                        if res is None:
                            pose, rstate = (rot0, tran0), resume
                        else:
                            pose = (res.final_rot, res.final_tran)
                            rstate = res.resume_state
                        # chunk-align windows using the previous rebin's
                        # per-tile counts (render-exact for any rank;
                        # binning.alignment_order)
                        tile_rank = None
                        if (
                            raster_cfg.align_windows
                            and raster_cfg.layout == "aligned"
                            and prev_binned is not None
                        ):
                            tile_rank = alignment_order(
                                prev_binned.counts, raster_cfg.chunk
                            )
                        binned = compute_binned(
                            gauss_only, variables["active"], pose[0], pose[1],
                            track_cam, raster_cfg, tile_rank=tile_rank,
                        )
                        prev_binned = binned
                        if done == 0:
                            track_sizer.observe(binned)
                        binned = track_sizer.apply(binned)
                        res = run_track_once(step, resume=rstate, binned=binned)
                        done += step
                        if viz_track:
                            _viz_segment(res, done)
                    return res

                res = run_track(n_iters)
                for _ in range(3):  # auto-escalate capacity on overflow
                    if not bool(res.overflow):
                        break
                    raster_cfg = _bump_raster(raster_cfg)
                    track_sizer.reset()
                    map_sizer.reset()
                    print(
                        f"[info] raster overflow at frame {time_idx}: retrying "
                        f"with max_per_tile={raster_cfg.max_per_tile}, "
                        f"max_instances={raster_cfg.max_instances}"
                    )
                    res = run_track(n_iters)
                if (
                    cfg_track.get("use_depth_loss_thres", False)
                    and float(res.last_losses["depth"])
                    >= cfg_track.get("depth_loss_thres", 1e9)
                ):
                    # double the iterations once by CONTINUING the same Adam
                    # run — pose, moments and best candidate carry over
                    # (`scripts/splatam.py:745-758`, do_continue_slam)
                    res = run_track(n_iters, resume=res.resume_state)
                    n_iters = 2 * n_iters
                params = _set_pose(params, time_idx, res.best_rot, res.best_tran)
                state.nonfinite["tracking"] = (
                    state.nonfinite["tracking"] + res.nonfinite
                )
                # per-iteration average (the scan is one dispatch, so
                # wall-per-iter = phase / iters) — reference headline stat
                # (`scripts/splatam.py:970-973`)
                state.timing["tracking_iter"].append(
                    (time.time() - t0) / max(n_iters, 1)
                )
        state.timing["tracking_frame"].append(time.time() - t0)

        # global progress telemetry (`utils/eval_helpers.py:152-276`)
        every = config.get("report_global_progress_every", 0)
        if every and ((time_idx + 1) % every == 0 or time_idx == num_frames - 1):
            from splatam_tpu.eval.report import report_progress

            stats = report_progress(
                params, variables["active"], frame_im, frame_depth, cam,
                raster_cfg, time_idx, cfg_track["sil_thres"],
                tracking=True, gt_w2c_list=state.gt_w2c_all,
                first_w2c=state.first_w2c, log_fn=state.log_fn,
            )
            if progress:
                print(
                    f"  progress@{time_idx}: psnr={stats['psnr']:.2f} "
                    f"ate={stats.get('ate', float('nan'))*100:.2f}cm"
                )

        # --- densification + mapping ---
        if time_idx == 0 or (time_idx + 1) % config["map_every"] == 0:
            if cfg_map["add_new_gaussians"] and time_idx > 0:
                if densify_dataset is not None:
                    dc, dd, _, _ = densify_dataset[time_idx]
                    dens_im, dens_depth = _as_frame(dc, dd)
                else:
                    dens_im, dens_depth = frame_im, frame_depth
                params, variables, _, n_added = add_new_gaussians(
                    params, variables, None, dens_im, dens_depth,
                    densify_k3, densify_cam, raster_cfg,
                    cfg_map["sil_thres"], time_idx,
                    config.get("gaussian_distribution", "isotropic"),
                    pose=get_pose(params, time_idx),
                )

            # keyframe selection
            curr_w2c = np.asarray(pose_to_w2c(*get_pose(params, time_idx)))
            num_kf = config["mapping_window_size"] - 2
            selected = keyframe_selection_overlap(
                np.asarray(frame_depth), curr_w2c, state.intrinsics,
                state.keyframe_list[:-1], num_kf, rng=rng,
            )
            selected_frames = [state.keyframe_list[i] for i in selected]
            if state.keyframe_list:
                selected_frames.append(state.keyframe_list[-1])
            selected_frames.append(
                {
                    "id": time_idx,
                    "est_w2c": curr_w2c,
                    "im": frame_im,
                    "depth": frame_depth,
                }
            )

            t1 = time.time()
            use_gs_densify = cfg_map.get(
                "use_gaussian_splatting_densification", False
            )
            # Snapshot so an overflow can retry the WHOLE phase at a larger
            # capacity instead of keeping a truncated-gradient step. Checking
            # overflow per iteration would force a ~35 ms device sync each
            # step; instead the flags are OR-ed on device and fetched once
            # per phase (overflow is rare — the retry path recompiles anyway).
            snapshot = (params, dict(variables), state.nonfinite["mapping"])
            # per-keyframe frozen binning: mapping samples a random keyframe
            # per iteration, so each keyframe's instance stream is cached at
            # first use and refreshed every rebin_every iterations (or after
            # any prune/densify mutation). rebin_every=0 => reference-exact
            # per-iteration binning.
            map_rebin = cfg_map.get("rebin_every", 10)
            for attempt in range(3):
                opt_state = init_mapping_optimizer(params)
                gauss_map = {k: params[k] for k in GAUSSIAN_KEYS}
                overflow_any = jnp.bool_(False)
                binned_cache: Dict[int, tuple] = {}
                # per-phase pose moments per keyframe (the reference builds
                # one fresh optimizer over the full cam arrays per phase;
                # per-keyframe slots reproduce that, since gradients only
                # ever hit the sampled keyframe's slice)
                pose_opts: Dict[int, object] = {}
                for it in range(cfg_map["num_iters"]):
                    kf = selected_frames[rng.integers(0, len(selected_frames))]
                    kf_rot, kf_tran = get_pose(params, kf["id"])
                    binned = None
                    if map_rebin:
                        cached = binned_cache.get(kf["id"])
                        if cached is None or it - cached[1] >= map_rebin:
                            tile_rank = None
                            if (
                                raster_cfg.align_windows
                                and raster_cfg.layout == "aligned"
                                and cached is not None
                            ):
                                tile_rank = alignment_order(
                                    cached[0].counts, raster_cfg.chunk
                                )
                            fresh = compute_binned(
                                gauss_map, variables["active"],
                                jax.lax.stop_gradient(kf_rot),
                                jax.lax.stop_gradient(kf_tran),
                                cam, raster_cfg, tile_rank=tile_rank,
                            )
                            if not binned_cache:
                                map_sizer.observe(fresh)
                            cached = (map_sizer.apply(fresh), it)
                            binned_cache[kf["id"]] = cached
                        binned = cached[0]
                    result = map_step(
                        gauss_map, variables["active"], opt_state,
                        jax.lax.stop_gradient(kf_rot),
                        jax.lax.stop_gradient(kf_tran),
                        kf["im"], kf["depth"], cam, raster_cfg,
                        lrs=map_lrs,
                        do_ba=do_ba,
                        pose_opt=pose_opts.get(kf["id"]),
                        sil_thres=cfg_map["sil_thres"],
                        use_sil_for_loss=cfg_map["use_sil_for_loss"],
                        ignore_outlier_depth_loss=cfg_map["ignore_outlier_depth_loss"],
                        loss_w_im=cfg_map["loss_weights"]["im"],
                        loss_w_depth=cfg_map["loss_weights"]["depth"],
                        track_means2d_grad=use_gs_densify,
                        binned=binned,
                    )
                    overflow_any = overflow_any | result.overflow
                    state.nonfinite["mapping"] = state.nonfinite[
                        "mapping"
                    ] + result.nonfinite.astype(jnp.int32)
                    opt_state = result.opt_state
                    gauss_map = result.params
                    if do_ba:
                        params = _set_pose(
                            params, kf["id"], result.cam_rot, result.cam_tran
                        )
                        pose_opts[kf["id"]] = result.pose_opt
                        # pose moved: this keyframe's frozen stream is stale
                        binned_cache.pop(kf["id"], None)
                    variables["max_2D_radius"] = jnp.where(
                        result.seen,
                        jnp.maximum(
                            result.radius.astype(jnp.float32),
                            variables["max_2D_radius"],
                        ),
                        variables["max_2D_radius"],
                    )
                    if cfg_map.get("prune_gaussians", False):
                        gauss_map, variables, opt_state = prune_gaussians(
                            gauss_map, variables, opt_state, it,
                            cfg_map["pruning_dict"], state.scene_radius,
                        )
                        binned_cache.clear()  # active set may have changed
                    # Inria gradient densification inside the mapping loop
                    # (`scripts/splatam.py:883-885`). The reference runs
                    # densify between backward and step; here it runs after
                    # the fused step — appended gaussians start optimizing
                    # next iteration either way (torch re-creates Parameters
                    # whose .grad is None, so its step skips them too).
                    if use_gs_densify:
                        ddict = cfg_map["densify_dict"]
                        if it <= ddict["stop_after"]:
                            variables = accumulate_mean2d_gradient(
                                variables, result.means2d_grad_norm,
                                result.seen,
                            )
                        full = dict(params)
                        full.update(gauss_map)
                        full, variables, opt_state = inria_densify(
                            full, variables, opt_state, it, ddict,
                            state.scene_radius, rng,
                        )
                        params = full
                        gauss_map = {k: full[k] for k in GAUSSIAN_KEYS}
                        binned_cache.clear()  # capacity/active may change
                if not bool(overflow_any):
                    break
                if attempt == 2:
                    # keep the last attempt's (possibly truncated) result
                    # rather than discarding the phase — params/variables/
                    # gauss_map must stay capacity-consistent
                    print(
                        f"[warn] mapping at frame {time_idx} still overflows "
                        f"after {attempt + 1} capacity bumps; keeping result"
                    )
                    break
                params, variables = snapshot[0], dict(snapshot[1])
                state.nonfinite["mapping"] = snapshot[2]
                raster_cfg = _bump_raster(raster_cfg)
                track_sizer.reset()
                map_sizer.reset()
                print(
                    f"[info] raster overflow in mapping at frame {time_idx}: "
                    f"retrying phase with max_per_tile={raster_cfg.max_per_tile}, "
                    f"max_instances={raster_cfg.max_instances}"
                )
            params = dict(params)
            params.update(gauss_map)
            if cfg_map["num_iters"] > 0:
                state.timing["mapping_iter"].append(
                    (time.time() - t1) / cfg_map["num_iters"]
                )
            state.timing["mapping_frame"].append(time.time() - t1)

        # --- keyframe bookkeeping ---
        if (
            time_idx == 0
            or (time_idx + 1) % config["keyframe_every"] == 0
            or time_idx == num_frames - 2
        ) and (np.isfinite(gt_w2c).all()):
            curr_w2c = np.asarray(pose_to_w2c(*get_pose(params, time_idx)))
            state.keyframe_list.append(
                {
                    "id": time_idx,
                    "est_w2c": curr_w2c,
                    "im": frame_im,
                    "depth": frame_depth,
                }
            )
            state.keyframe_time_indices.append(time_idx)

        # --- periodic checkpoint (`scripts/splatam.py:947-951`) ---
        if (
            config.get("save_checkpoints", False)
            and time_idx % config.get("checkpoint_interval", 100) == 0
            and time_idx > 0
        ):
            from splatam_tpu.utils.checkpoint import save_params_ckpt

            ckpt_dir = os.path.join(config["workdir"], config["run_name"])
            save_params_ckpt(params, variables, ckpt_dir, time_idx)
            np.save(
                os.path.join(ckpt_dir, f"keyframe_time_indices{time_idx}.npy"),
                np.array(state.keyframe_time_indices),
            )

        if progress and (time_idx % 10 == 0 or time_idx == num_frames - 1):
            print(
                f"frame {time_idx}/{num_frames}  gaussians={num_active(variables)}"
                f" cap={capacity_of(params)}"
            )

    state.params = params
    state.variables = variables
    state.nonfinite = {k: int(v) for k, v in state.nonfinite.items()}
    if any(state.nonfinite.values()):
        print(
            "[warn] skipped NaN/inf-loss iterations: "
            f"tracking={state.nonfinite['tracking']} "
            f"mapping={state.nonfinite['mapping']}"
        )
    return state
