"""Diffusion training CLI (train_diff.py equivalent):
``python -m sovits_tpu.cli.train_diff -c configs/diffusion.yaml``."""

from __future__ import annotations

import argparse
import logging

from ..train.diffusion import load_diffusion_config, train_diffusion


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", default="./configs/diffusion.yaml")
    parser.add_argument("--max-steps", type=int, default=None)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    cfg = load_diffusion_config(args.config)
    train_diffusion(cfg, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
