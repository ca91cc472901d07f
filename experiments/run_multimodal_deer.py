#!/usr/bin/env python
"""Entry-point parity with the reference's experiments/run_multimodal_deer.py.

Same CLI surface (modes full/train/evaluate/visualize/test, --config,
--quick, --epochs/--batch_size/--learning_rate overrides); implementation
lives in tpu_deer.cli.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_deer.cli import main

if __name__ == "__main__":
    sys.exit(main())
