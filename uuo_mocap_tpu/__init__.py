"""uuo_mocap_tpu — TPU-native unstructured-unlabeled optical mocap framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
NicholasMilef/UUO-Mocap ("Towards Unstructured Unlabeled Optical Mocap: A
Video Helps!", SIGGRAPH 2024): solving SMPL body parameters from unlabeled
marker clouds with a monocular-video (HMR 2.0) prior.

Layer map (bottom-up):
  body      SMPL body model: asset loading + jitted LBS forward
  ops       geometry/rotation kernels (chamfer, point-triangle, Procrustes)
  solver    L-BFGS + strong Wolfe line search inside jit, loss library
  pipeline  staged multimodal solve (part fit, root, chamfer, marker IK)
  camera    HMR crop-camera model + perspective projection
  models    Flax neural models (segmenter, pos2bc, ...) + training
  data      C3D / HMR-pkl / AMASS IO, synthetic generators, configs
  eval      metric suite + comparison/ablation harnesses
  parallel  device-mesh sharding of sequence/hypothesis batches
"""

__version__ = "0.1.0"
