"""Ali-CCP multi-task example: 5 MTL models + adaptive loss weighting.

Parity with reference ``examples/ranking/run_ali_ccp_multi_task.py:56-77``
(tasks [cvr=purchase, ctr=click]); loads a real Ali-CCP CSV via
``--dataset_path`` or synthesizes a schema-identical sample.

    python examples/ranking/run_ali_ccp_multi_task.py --model_name mmoe --adaptive uwl
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from benchmarks.datasets import build_aliccp_multitask_dataset
from examples.ranking.mtl_common import add_mtl_args, fit_multitask


def main():
    args = add_mtl_args(argparse.ArgumentParser()).parse_args()
    bundle = build_aliccp_multitask_dataset(seed=args.seed, dataset_path=args.dataset_path)
    fit_multitask(bundle, args)


if __name__ == "__main__":
    main()
