from .anchors import AnchorGeneratorRotated, grid_anchors
from .assigner import assign_labels
from .losses import focal_loss_with_logits, smooth_l1_loss
from .resnet import ResNetBackbone
from .fpn import FPN, PAN
from .head import S2ANetHead
from .detector import S2ANet

__all__ = [
    "AnchorGeneratorRotated",
    "grid_anchors",
    "assign_labels",
    "focal_loss_with_logits",
    "smooth_l1_loss",
    "ResNetBackbone",
    "FPN",
    "PAN",
    "S2ANetHead",
    "S2ANet",
]
