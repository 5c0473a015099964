from splatam_tpu.data.base import RGBDDataset
from splatam_tpu.data.dataconfig import load_dataset_config
from splatam_tpu.data.datasets import (
    Ai2thorDataset,
    AzureKinectDataset,
    HabitatDataset,
    ICLDataset,
    NeRFCaptureDataset,
    Record3DDataset,
    RealsenseDataset,
    ReplicaDataset,
    ReplicaV2Dataset,
    ScannetDataset,
    ScannetPPDataset,
    TUMDataset,
    get_dataset,
)
from splatam_tpu.data.prefetch import PrefetchLoader
from splatam_tpu.data.synthetic import SyntheticDataset

__all__ = [
    "RGBDDataset",
    "load_dataset_config",
    "get_dataset",
    "PrefetchLoader",
    "SyntheticDataset",
    "ReplicaDataset",
    "ReplicaV2Dataset",
    "TUMDataset",
    "ScannetDataset",
    "ScannetPPDataset",
    "ICLDataset",
    "AzureKinectDataset",
    "Ai2thorDataset",
    "Record3DDataset",
    "RealsenseDataset",
    "NeRFCaptureDataset",
    "HabitatDataset",
]
