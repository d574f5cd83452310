#!/usr/bin/env python
"""Stage-GIF and loss-scatter CLI (reference figures/figures.py:15-92)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from raw2logit_tpu.evaluation.figures import (MODE_CHOICES, STEP_CHOICES,
                                              loss_scatter, make_stage_gif)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--run_dir", required=True,
                   help="local run directory (results/runs/<exp>/<run>)")
    p.add_argument("--mode", default="processing", choices=MODE_CHOICES)
    p.add_argument("--step", default="gamma_correct", choices=STEP_CHOICES)
    p.add_argument("--gif", action="store_true")
    p.add_argument("--scatter", action="store_true")
    p.add_argument("--fps", type=int, default=2)
    args = p.parse_args(argv)
    if args.gif:
        print("wrote", make_stage_gif(args.run_dir, stage=args.step,
                                      mode=args.mode, fps=args.fps))
    if args.scatter:
        print("wrote", loss_scatter(args.run_dir))


if __name__ == "__main__":
    main()
