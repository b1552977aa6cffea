"""Convert reference (torch) checkpoints to flax orbax params.

Usage:
  python tools/convert_weights.py --model db_resnet18 \
      --checkpoint /path/pytorch_model.pt [--out <dir>]

Converted weights land in the model cache (models/registry.weights_dir) so
tasks pick them up automatically; absent --out overrides that.
Supported: db_resnet18 / db_resnet50 (more converters land per model as
name maps are validated against real checkpoints; the layer-parity harness
is tests/test_convert.py).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    import numpy as np

    jax.config.update("jax_platforms", "cpu")

    from pdf_table_tpu.convert.torch_to_flax import TorchTensorSource
    from pdf_table_tpu.engine.params import init_params, save_params
    from pdf_table_tpu.models.registry import get_config, weights_dir

    src = TorchTensorSource(args.checkpoint)

    if args.model in ("db_resnet18", "db_resnet50"):
        import jax.numpy as jnp

        from pdf_table_tpu.convert.dbnet_convert import convert_dbnet
        from pdf_table_tpu.models.dbnet import DBNet

        depth = int(args.model[-2:])
        cfg = get_config("detection", args.model)
        model = DBNet(cfg)
        variables = jax.tree.map(
            np.asarray,
            dict(init_params(model, jnp.zeros((1, 64, 64, 3)))))
        rep = convert_dbnet(src, variables, depth=depth)
        out_dir = args.out or weights_dir("detection", args.model)
        print("conversion:", rep.summary())
        if not rep.ok:
            print("MISSING:", rep.missing[:10])
            print("SHAPE:", rep.shape_errors[:10])
            return 1
        save_params(variables, out_dir)
        print("saved to", out_dir)
        return 0

    print(f"no converter for {args.model!r} yet; available: db_resnet18, "
          f"db_resnet50")
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
