#!/usr/bin/env python
"""Top-level evaluation entry point (parity with reference test.py CLI)."""
from dgppo_fov_tpu.cli.test import main

if __name__ == "__main__":
    main()
