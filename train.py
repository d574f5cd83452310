#!/usr/bin/env python
"""CLI entry point (same flag surface as the reference train.py)."""

from raw2logit_tpu.utils import enable_compilation_cache
enable_compilation_cache()

from raw2logit_tpu.training.train import main

if __name__ == "__main__":
    main()
