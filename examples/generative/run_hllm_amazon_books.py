"""HLLM on Amazon-Books-shaped sequences (reference ``run_hllm_amazon_books.py``): larger catalog preset with chunked large-vocab CE."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from examples.generative import run_hllm


def main():
    presets = "--vocab=2000 --seq_len=32 --vocab_chunk_size=500".split()
    for p in presets:
        key = p.split("=")[0]
        if not any(a == key or a.startswith(key + "=") for a in sys.argv[1:]):
            sys.argv.insert(1, p)
    run_hllm.main()


if __name__ == "__main__":
    main()
