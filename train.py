#!/usr/bin/env python
"""Top-level training entry point (parity with reference train.py CLI)."""
from dgppo_fov_tpu.cli.train import main

if __name__ == "__main__":
    main()
