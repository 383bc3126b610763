"""MetaBalance adaptive multi-task example (reference ``run_metabalance.py:69``).

    python examples/ranking/run_metabalance.py --model_name mmoe
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from benchmarks.datasets import build_aliccp_multitask_dataset
from examples.ranking.mtl_common import add_mtl_args, fit_multitask


def main():
    args = add_mtl_args(argparse.ArgumentParser()).parse_args()
    args.adaptive = "metabalance"
    bundle = build_aliccp_multitask_dataset(seed=args.seed, dataset_path=args.dataset_path)
    fit_multitask(bundle, args)


if __name__ == "__main__":
    main()
