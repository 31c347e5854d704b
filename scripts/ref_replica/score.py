"""Score replica harness MOT output against the dumped GT."""
import sys
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[2]))
import numpy as np
from motcpp_tpu.metrics import clear_metrics, hota_metrics, identity_metrics

gt_raw = np.load(sys.argv[1], allow_pickle=True).item()
gt = {t: (v[0], v[1], None) for t, v in gt_raw.items()}

pred = {}
for line in open(sys.argv[2]):
    p = line.strip().split(",")
    t, tid = int(p[0]), int(p[1])
    x, y, w, h, conf = map(float, p[2:7])
    pred.setdefault(t, []).append((tid, [x, y, x + w, y + h], conf))
pred = {t: (np.asarray([r[0] for r in rows]),
            np.asarray([r[1] for r in rows], float),
            np.asarray([r[2] for r in rows], float))
        for t, rows in pred.items()}
c = clear_metrics(gt, pred); i = identity_metrics(gt, pred); h = hota_metrics(gt, pred)
import json
print(json.dumps({"HOTA": round(h["HOTA"],2), "MOTA": round(c["MOTA"],2),
  "IDF1": round(i["IDF1"],2), "DetA": round(h["DetA"],2), "AssA": round(h["AssA"],2),
  "IDSW": int(c["IDSW"]), "MT": int(c["MT"]), "ML": int(c["ML"]),
  "FP": int(c["FP"]), "FN": int(c["FN"])}))
