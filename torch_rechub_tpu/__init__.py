"""torch_rechub_tpu — a TPU-native (JAX/XLA/Pallas/pjit) recommender framework.

Brand-new implementation with the capabilities of datawhalechina/torch-rechub:
feature schema -> shared embedding collection -> layer zoo -> model families
(ranking / matching / multi-task / generative) -> trainers -> retrieval
serving + benchmark harness, designed SPMD-first over a (data, model) device
mesh.
"""

__version__ = "0.1.0"

from .basic import features
from .basic.features import DenseFeature, SequenceFeature, SparseFeature

__all__ = ["DenseFeature", "SparseFeature", "SequenceFeature", "features", "__version__"]
