"""Census-income multi-task example (tasks [cvr_label, ctr_label]).

Parity with reference ``examples/ranking/run_census.py``.

    python examples/ranking/run_census.py --model_name esmm
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from benchmarks.datasets import build_census_multitask_dataset
from examples.ranking.mtl_common import add_mtl_args, fit_multitask


def main():
    args = add_mtl_args(argparse.ArgumentParser()).parse_args()
    bundle = build_census_multitask_dataset(seed=args.seed)
    fit_multitask(bundle, args)


if __name__ == "__main__":
    main()
