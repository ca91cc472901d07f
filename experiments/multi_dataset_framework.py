#!/usr/bin/env python
"""Entry-point parity with the reference's experiments/multi_dataset_framework.py.

Joint IEMOCAP+RAVDESS+MELD training and cross-dataset transfer evaluation —
with real results (the reference hardcoded its headline numbers).
Implementation lives in tpu_deer.train.multi_dataset.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_deer.train.multi_dataset import main

if __name__ == "__main__":
    sys.exit(main())
