"""Model tooling: compress for release, mix checkpoints (static timbre mix).

- compress: strip the train-only posterior encoder + optimizer state and
  optionally cast to bf16 (compress_model.py:21-72's ~3x shrink).
- mix: convex (softmax) or linear parameter blends of several checkpoints
  (utils.mix_model, utils.py:427-438) — "static timbre mixing".

Compressed models are flat .npz files loadable by the Svc facade.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

import jax


def flatten_params(tree: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten_params(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten_params(flat: dict) -> dict:
    out: dict = {}
    for key, v in flat.items():
        node = out
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def load_generator_params(path: str, hps=None) -> dict:
    """Load generator params from orbax dir / compressed npz / torch pth."""
    p = Path(path)
    if p.suffix == ".npz":
        return unflatten_params(dict(np.load(p)))
    if p.suffix in (".pth", ".pt"):
        from .. import config as scfg
        from ..models import factory
        from ..train import checkpoint as ckpt_lib

        assert hps is not None, "config needed to convert a torch checkpoint"
        syn = factory.build_synthesizer(hps)
        init = factory.init_synthesizer_params(syn, jax.random.PRNGKey(0), hps, t_frames=16)
        return ckpt_lib.load_torch_generator(str(p), hps, init)[0]
    # orbax directory written by the trainer: restore raw tree
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(p.absolute())
    step = mgr.latest_step()
    restored = mgr.restore(step, args=ocp.args.StandardRestore())
    mgr.close()
    return restored["state"]["g_params"]


def compress(argv=None):
    parser = argparse.ArgumentParser(description="compress a checkpoint for release")
    parser.add_argument("-c", "--config", default="./configs/config.json")
    parser.add_argument("-i", "--input", required=True, help="orbax ckpt dir / G_*.pth")
    parser.add_argument("-o", "--output", required=True, help="output .npz")
    parser.add_argument("--half", action="store_true", help="cast to bfloat16")
    args = parser.parse_args(argv)

    from .. import config as scfg

    hps = scfg.load_config(args.config)
    params = load_generator_params(args.input, hps)
    params.pop("enc_q", None)  # train-only posterior (compress_model.py:30-35)
    flat = flatten_params(params)
    if args.half:
        import jax.numpy as jnp

        flat = {
            k: np.asarray(v, dtype=jnp.bfloat16) if v.dtype == np.float32 else v
            for k, v in flat.items()
        }
    np.savez_compressed(args.output, **flat)
    size = Path(args.output).stat().st_size / 1e6
    print(f"wrote {args.output} ({size:.1f} MB)")


def mix(argv=None):
    parser = argparse.ArgumentParser(description="blend model checkpoints")
    parser.add_argument("-c", "--config", default="./configs/config.json")
    parser.add_argument("-i", "--inputs", nargs="+", required=True)
    parser.add_argument("-r", "--rates", nargs="+", type=float, required=True)
    parser.add_argument("-o", "--output", default="output_mix.npz")
    parser.add_argument(
        "--mode", type=int, default=0, help="0: convex (softmax of rates), 1: linear"
    )
    args = parser.parse_args(argv)
    assert len(args.inputs) == len(args.rates)

    from .. import config as scfg

    hps = scfg.load_config(args.config)
    rates = np.asarray(args.rates, np.float64) / 100.0
    if args.mode == 0:
        rates = np.exp(rates) / np.exp(rates).sum()

    flats = [flatten_params(load_generator_params(p, hps)) for p in args.inputs]
    mixed = {}
    for k in flats[0]:
        mixed[k] = sum(r * f[k].astype(np.float64) for r, f in zip(rates, flats)).astype(
            flats[0][k].dtype
        )
    np.savez_compressed(args.output, **mixed)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    import sys

    cmd = sys.argv[1] if len(sys.argv) > 1 else ""
    if cmd == "compress":
        compress(sys.argv[2:])
    elif cmd == "mix":
        mix(sys.argv[2:])
    else:
        print("usage: python -m sovits_tpu.cli.tools {compress|mix} ...")
