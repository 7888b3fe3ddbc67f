"""humaniflow_tpu: a TPU-native probabilistic 3D human shape-and-pose estimation
framework (JAX / XLA / Pallas / pjit).

Re-implements the capabilities of HuManiFlow (CVPR 2023,
reference: akashsengupta1997/HuManiFlow) as a from-scratch TPU-first design:

  * ``ops``       — SO(3) Lie ops, rotation representations, cameras, alignment
                    (reference: utils/rigid_transform_utils.py, utils/cam_utils.py,
                    utils/eval_utils.py)
  * ``flows``     — conditional normalizing-flow toolkit on so(3) with
                    SO(3)-pushforward distributions
                    (reference: models/norm_flows/)
  * ``models``    — HumaniflowModel, SMPL body model, ResNet encoder,
                    HRNet 2D pose, Canny edge detector (reference: models/)
  * ``data``      — datasets, image ops, label conversions, augmentation
                    (reference: data/, utils/image_utils.py)
  * ``render``    — TPU mesh rasterizer producing silhouette/IUV/depth/RGB
                    (reference: utils/renderers/pytorch3d_textured_renderer.py)
  * ``pipelines`` — predict / train / evaluate / optimise
                    (reference: predict/, train/, evaluate/, optimise/)
  * ``losses``    — HumaniflowLoss (reference: losses/humaniflow_loss.py)
  * ``metrics``   — train/eval metric trackers (reference: metrics/)
  * ``parallel``  — device-mesh sharding helpers (data-parallel pjit;
                    the reference is single-GPU with no distributed support)
  * ``utils``     — checkpointing, torch-checkpoint conversion, sampling,
                    visualisation, profiling
"""

__version__ = "0.1.0"
