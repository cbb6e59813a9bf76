#!/usr/bin/env python
"""Entry point mirroring the reference CLI surface
(`python training/run_model.py --config <name>` ->
 `python run_model.py --config <name>`)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vitslam_tpu.cli import main

if __name__ == "__main__":
    main()
