#!/usr/bin/env python
"""Evaluation CLI alias.

The reference ships `test.py` as a near-duplicate of `train.py`
(`/root/reference/test.py:1-56`); here it simply forces --mode test on the
same entry point.
"""

import sys

from train import main

if __name__ == "__main__":
    if "--mode" not in sys.argv:
        sys.argv += ["--mode", "test"]
    main()
