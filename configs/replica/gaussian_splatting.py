"""Offline 3DGS training config with GT poses (reference
`scripts/gaussian_splatting.py:320-616` driver defaults)."""

scenes = ["room0", "room1", "room2", "office0", "office1", "office2", "office3", "office4"]

seed = 0
scene_name = scenes[0]
group_name = "Replica_GS"
run_name = f"{scene_name}_{seed}"

config = dict(
    workdir=f"./experiments/{group_name}",
    run_name=run_name,
    seed=seed,
    scene_radius_depth_ratio=3,
    mean_sq_dist_method="projective",
    gaussian_distribution="anisotropic",
    report_iter_progress=False,
    use_wandb=False,
    raster=dict(
        max_instances=2**20,
        max_per_tile=1024,
        chunk=128,
    ),
    data=dict(
        basedir="./data/Replica",
        gradslam_data_cfg="./configs/data/replica.yaml",
        ignore_bad=False,
        use_train_split=True,
        sequence=scene_name,
        desired_image_height=680,
        desired_image_width=1200,
        start=0,
        end=-1,
        stride=1,
        num_frames=-1,
        eval_stride=1,
        eval_num_frames=-1,
    ),
    train=dict(
        num_iters_mapping=30000,
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
