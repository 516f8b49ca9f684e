#!/usr/bin/env python
"""Thin wrapper over `python -m stencilflow_tpu.cli canonicalize` (reference: bin/canonicalize_sdfg.py)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from stencilflow_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main(["canonicalize"] + sys.argv[1:]))
