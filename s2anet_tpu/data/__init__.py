from .split import split_image, split_dataset, DOTA_CLASSES
from .merge import merge_chip_detections, poly_nms_np
from .dota import DotaDataset, BatchLoader, load_dota_label

__all__ = [
    "split_image",
    "split_dataset",
    "DOTA_CLASSES",
    "merge_chip_detections",
    "poly_nms_np",
    "DotaDataset",
    "BatchLoader",
    "load_dota_label",
]
