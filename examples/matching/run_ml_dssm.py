"""MovieLens DSSM retrieval example (reference ``run_ml_dssm.py``).

Thin alias of ``run_dssm.py`` (two-tower DSSM, in-batch negatives, exact
top-k retrieval eval).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from examples.matching import run_dssm


def main():
    run_dssm.main()


if __name__ == "__main__":
    main()
