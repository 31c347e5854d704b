#!/usr/bin/env python3
"""Convert a torchreid OSNet checkpoint to Flax params.

Equivalent role to the reference's ONNX export script (reference:
scripts/export_reid_onnx.py exports torch weights for the ORT backend);
here the target runtime is the Flax OSNet in motcpp_tpu.appearance.

Usage:
    python scripts/convert_reid_weights.py <weights.pt> <out.npz>
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 2:
        print(__doc__)
        return 1
    src, dst = argv
    import jax
    import numpy as np

    from motcpp_tpu.appearance.osnet import (
        init_params,
        load_torch_weights,
        osnet_x1_0,
    )

    model = osnet_x1_0()
    variables = init_params(model)
    params = load_torch_weights(model, variables["params"], src)
    leaves, _ = jax.tree_util.tree_flatten(params)
    np.savez(dst, **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})
    print(f"wrote {dst} ({len(leaves)} tensors)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
