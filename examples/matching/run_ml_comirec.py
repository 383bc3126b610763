"""MovieLens Comirec (SA/DR) retrieval example (reference ``run_ml_comirec.py``).

Thin preset over ``run_ml_matching.py``; pass ``--model_name comirec_dr`` for
the dynamic-routing variant (default: self-attentive).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from examples.matching import run_ml_matching


def main():
    if not any(a.startswith("--model_name") for a in sys.argv[1:]):
        sys.argv.insert(1, "--model_name=comirec_sa")
    run_ml_matching.main()


if __name__ == "__main__":
    main()
