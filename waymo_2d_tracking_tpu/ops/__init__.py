"""Device ops and Pallas kernels.

The reference pipeline's native ops (torchvision/mmcv CUDA NMS & RoIAlign, ATen
top-k, scipy's C linear_sum_assignment — SURVEY.md §2.1) map here to
TPU-native equivalents: vectorized XLA where that is already speed-of-light,
Pallas kernels where fusion/VMEM control wins.
"""
from waymo_2d_tracking_tpu.ops.iou import pairwise_iou  # noqa: F401
from waymo_2d_tracking_tpu.ops.assign import auction_assign  # noqa: F401
