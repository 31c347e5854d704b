"""Dump the repo's ablation scene to the replica harness binary format."""
import struct, sys
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[2]))
import numpy as np
from motcpp_tpu.data.synthetic import ablation_scene

n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 600
pan = float(sys.argv[2]) if len(sys.argv) > 2 else 0.0
out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/refharness/scene.bin"

gt, dets, embs, warps = ablation_scene(n_frames=n_frames,
                                       pan_amp=(pan, pan * 0.3))
D = embs[1].shape[1] if embs[1].size else 64
with open(out, "wb") as f:
    f.write(b"MSCN")
    f.write(struct.pack("<ii", n_frames, D))
    for t in range(1, n_frames + 1):
        d = np.asarray(dets[t], np.float32).reshape(-1, 6)
        e = np.asarray(embs[t], np.float32).reshape(-1, D)
        assert d.shape[0] == e.shape[0]
        f.write(struct.pack("<i", d.shape[0]))
        f.write(d.tobytes())
        f.write(e.tobytes())
# also dump GT for scoring
np.save(out + ".gt.npy", {t: (np.asarray(g[0]), np.asarray(g[1])) for t, g in gt.items()}, allow_pickle=True)
print("wrote", out, "frames", n_frames, "D", D)
