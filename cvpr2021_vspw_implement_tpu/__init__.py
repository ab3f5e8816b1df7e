"""cvpr2021_vspw_implement_tpu — TPU-native video scene parsing framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
PyTorch implementation of "VSPW: A Large-scale Dataset for Video Scene
Parsing in the Wild" (CVPR 2021): per-frame segmentation baselines
(PSPNet / OCRNet / DeepLab / UPerNet / non-local / HRNetV2 / MobileNetV2),
temporal methods (TCB clip_psp / clip_ocr, NetWarp, ETC, TDNet, non-local-3d,
warp/prop nets), a frozen RAFT optical-flow subsystem, and the video metrics
mIoU / VC / TC.

Design stance (TPU-first, not a port):
  * NHWC layouts, bf16-friendly convs, static shapes, `lax.scan` control flow.
  * Data parallelism + sync-BN via GSPMD: batch statistics over a
    batch sharded on a `jax.sharding.Mesh` compile to on-device partial
    reductions + ICI all-reduce — the reference's entire
    `models/sync_batchnorm/` thread/queue machinery collapses into the
    sharding annotations (see `parallel/`).
  * Hot gather/window ops (flow warp, windowed correlation, local cost
    volumes) are Pallas TPU kernels (see `ops/`).
"""

__version__ = "0.1.0"
