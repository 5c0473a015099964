"""iPhone post-SplaTAM refinement config
(reference `configs/iphone/post_splatam_opt.py`): refines a captured-scene
SplaTAM map from params.npz with estimated poses fixed."""

base_dir = "./experiments/iPhone_Captures"
scene_name = "splatam_demo"
group_name = "iPhone_Captures"
run_name = f"{scene_name}_post_splatam_opt"

full_res_width = 1920
full_res_height = 1440
downscale_factor = 2.0
densify_downscale_factor = 4.0

config = dict(
    workdir=f"./experiments/{group_name}",
    run_name=run_name,
    seed=0,
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
        dataset_name="nerfcapture",
        basedir=base_dir,
        gradslam_data_cfg=None,
        sequence=scene_name,
        downscale_factor=downscale_factor,
        densify_downscale_factor=densify_downscale_factor,
        desired_image_height=int(full_res_height // downscale_factor),
        desired_image_width=int(full_res_width // downscale_factor),
        densification_image_height=int(full_res_height // densify_downscale_factor),
        densification_image_width=int(full_res_width // densify_downscale_factor),
        start=0,
        end=-1,
        stride=1,
        num_frames=-1,
        eval_stride=1,
        eval_num_frames=-1,
        param_ckpt_path=f"{base_dir}/{scene_name}/params.npz",
    ),
    train=dict(
        num_iters_mapping=5000,
        sil_thres=0.5,
        use_sil_for_loss=True,
        loss_weights=dict(im=0.5, depth=1.0),
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
            stop_after=5000,
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
