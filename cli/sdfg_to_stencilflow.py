#!/usr/bin/env python
"""Thin wrapper over `python -m stencilflow_tpu.cli import-sdfg` (reference: bin/sdfg_to_stencilflow.py)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from stencilflow_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main(["import-sdfg"] + sys.argv[1:]))
