"""MovieLens evaluation helper (parity with reference
``examples/matching/movielens_utils.py:15-58``): exact accelerator top-k
retrieval + topk_metrics, with multi-interest merge handled inside
``torch_rechub_tpu.serving.match_evaluation``."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from torch_rechub_tpu.serving import match_evaluation  # noqa: F401  (public re-export)
