"""Training CLI: ``python -m sovits_tpu.cli.train -c config.json -m 44k``.

Flag surface mirrors the reference's train.py:35-44 (utils.get_hparams):
-c/--config JSON path, -m/--model experiment name under ./logs/.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

from .. import config as scfg
from ..train.trainer import train


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train the SVC synthesizer (GAN)")
    parser.add_argument("-c", "--config", default="./configs/config.json")
    parser.add_argument("-m", "--model", required=True, help="experiment name")
    parser.add_argument("--max-steps", type=int, default=None)
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    model_dir = Path("./logs") / args.model
    saved_cfg = model_dir / "config.json"
    hps = scfg.load_config(saved_cfg if saved_cfg.exists() and not Path(args.config).exists() else args.config)
    train(hps, model_dir, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
