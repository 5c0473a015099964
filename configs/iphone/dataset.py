"""iPhone NeRFCapture dataset-capture config
(reference `configs/iphone/dataset.py`): drives
splatam_tpu/tools/nerfcapture2dataset.py."""

seed = 0
base_dir = "./experiments/iPhone_Captures"  # root directory to save captures
scene_name = "dataset_demo"
num_frames = 10  # desired number of frames to capture
depth_scale = 10.0  # depth scale used when saving depth
overwrite = False  # rewrite over dataset if it exists

config = dict(
    workdir=f"{base_dir}/{scene_name}",
    overwrite=overwrite,
    depth_scale=depth_scale,
    num_frames=num_frames,
)
