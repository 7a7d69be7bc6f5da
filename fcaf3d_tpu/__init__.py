"""fcaf3d_tpu: a TPU-native (JAX/XLA/Pallas) indoor 3D object detection framework.

Re-implements the capabilities of SamsungLabs/fcaf3d (ECCV'22) — the FCAF3D
sparse-conv anchor-free detector, VoteNet-v2 (Mobius) and ImVoteNet — designed
TPU-first: static shapes, functional models, pjit data parallelism, and a
sort/searchsorted sparse-convolution engine instead of MinkowskiEngine.
"""

__version__ = "0.1.0"
