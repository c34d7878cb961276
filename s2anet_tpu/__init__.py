"""s2anet_tpu — a TPU-native (JAX / XLA / Pallas) oriented-object-detection framework.

Re-implements the full capability surface of the S2ANet reference detector
(single-shot alignment network for rotated boxes on DOTA aerial imagery) as an
idiomatic JAX framework:

- ``ops``:       rotated-box geometry, rotated IoU / NMS, deformable sampling,
                 active-rotating-filter convolutions — static shapes, fused on-device.
- ``models``:    flax ResNet backbones, FPN/PAN necks, the S2ANet FAM/ODM head,
                 anchor generation, label assignment and losses.
- ``data``:      DOTA chip splitting, YOLO-rotated-label datasets, augmentation,
                 result merging.
- ``eval``:      VOC-style polygon mAP evaluation (double-precision oracle IoU).
- ``train``:     train state (params/EMA/optimizer), LR schedules, checkpointing.
- ``parallel``:  device-mesh sharding, data-parallel train/eval steps over ICI.
"""

__version__ = "0.1.0"
