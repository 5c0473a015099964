"""ScanNet++ offline 3DGS config with GT poses
(reference `configs/scannetpp/gaussian_splatting.py`): 7k-iter optimization,
Inria densification, image-only loss. Scene via the SCENE env var."""
import os

scenes = ["8b5caf3398", "b20a261fdf"]

seed = 0
use_train_split = True
scene_num_frames = [-1, 360] if use_train_split else [-1, -1]
scene_idx = int(os.environ.get("SCENE", 0))
scene_name = scenes[scene_idx]
num_frames = scene_num_frames[scene_idx]
group_name = "ScanNet++_3DGS"
run_name = f"{scene_name}_{seed}"

config = dict(
    workdir=f"./experiments/{group_name}",
    run_name=run_name,
    seed=seed,
    scene_radius_depth_ratio=3,
    mean_sq_dist_method="projective",
    gaussian_distribution="isotropic",
    report_iter_progress=False,
    use_wandb=False,
    raster=dict(
        max_instances=2**20,
        max_per_tile=1024,
        chunk=128,
    ),
    data=dict(
        basedir="./data/scannetpp",
        gradslam_data_cfg=None,
        ignore_bad=False,
        use_train_split=use_train_split,
        sequence=scene_name,
        desired_image_height=584,
        desired_image_width=876,
        desired_image_height_init=584,
        desired_image_width_init=876,
        start=0,
        end=-1,
        stride=1,
        num_frames=num_frames,
        eval_stride=1,
        eval_num_frames=-1,
    ),
    train=dict(
        num_iters_mapping=7000,
        sil_thres=0.5,
        use_sil_for_loss=True,
        loss_weights=dict(im=1.0, depth=0.0),
        lrs_mapping=dict(
            means3D=0.00032,
            rgb_colors=0.0025,
            unnorm_rotations=0.001,
            logit_opacities=0.05,
            log_scales=0.005,
        ),
        lrs_mapping_means3D_final=0.0000032,
        lr_delay_mult=0.01,
        use_gaussian_splatting_densification=True,
        densify_dict=dict(
            start_after=500,
            remove_big_after=3000,
            stop_after=15000,
            densify_every=100,
            grad_thresh=0.0002,
            num_to_split_into=2,
            removal_opacity_threshold=0.005,
            final_removal_opacity_threshold=0.005,
            reset_opacities=True,
            reset_opacities_every=3000,
        ),
    ),
)
