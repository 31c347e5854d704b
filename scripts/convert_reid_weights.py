#!/usr/bin/env python3
"""Convert a torchreid OSNet checkpoint to Flax variables (.npz).

Equivalent role to the reference's ONNX export script (reference:
scripts/export_reid_onnx.py exports torch weights for the ORT backend);
here the target runtime is the Flax OSNet in motcpp_tpu.appearance.

The conversion is name-based (torchreid state_dict key -> Flax module
path) and covers BatchNorm running statistics (batch_stats collection);
it raises if any tensor fails to map or mismatches in shape. Output is
a flat .npz with 'params/...' / 'batch_stats/...' keys, loadable via
ReIDBackend(weights="out.npz") or osnet.load_npz_variables.

Usage:
    python scripts/convert_reid_weights.py <weights.pt> <out.npz> [x1_0|x0_75|x0_5|x0_25]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        print(__doc__)
        return 1
    src, dst = argv[0], argv[1]
    variant = argv[2] if len(argv) > 2 else "x1_0"

    # conversion is pure host work — don't wait on a (possibly busy)
    # TPU tunnel for what is a tensor-name remapping job
    import jax

    jax.config.update("jax_platforms", "cpu")

    from motcpp_tpu.appearance.osnet import (
        init_params,
        load_torch_weights,
        osnet_x0_25,
        osnet_x0_5,
        osnet_x0_75,
        osnet_x1_0,
        save_npz_variables,
    )

    model = {"x1_0": osnet_x1_0, "x0_75": osnet_x0_75,
             "x0_5": osnet_x0_5, "x0_25": osnet_x0_25}[variant]()
    variables = init_params(model)
    variables = load_torch_weights(model, variables, src)
    save_npz_variables(dst, variables)
    n = sum(1 for _ in _iter_leaves(variables))
    print(f"wrote {dst} ({n} tensors, variant {variant})")
    return 0


def _iter_leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _iter_leaves(v)
        else:
            yield v


if __name__ == "__main__":
    sys.exit(main())
