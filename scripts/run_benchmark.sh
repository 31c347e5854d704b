#!/usr/bin/env bash
# One-shot accuracy benchmark over a MOT dataset, all trackers.
# Equivalent of the reference's scripts/auto_benchmark.sh (which
# downloads benchmark data, builds, runs trackers, and calls TrackEval);
# here data must already be on disk and metrics are computed in-repo.
#
# Usage: scripts/run_benchmark.sh <mot_root> [det_emb_root] [model] [reid]
set -euo pipefail

MOT_ROOT=${1:?usage: run_benchmark.sh <mot_root> [det_emb_root] [model] [reid]}
DET_EMB_ROOT=${2:-}
MODEL=${3:-}
REID=${4:-}
OUT_BASE=${OUT_BASE:-./results}
TRACKERS=${TRACKERS:-sort bytetrack ocsort deepocsort strongsort botsort boosttrack hybridsort ucmctrack}

cd "$(dirname "$0")/.."

for trk in $TRACKERS; do
    echo "=== $trk"
    python -m motcpp_tpu.cli "$MOT_ROOT" "$OUT_BASE/$trk" "$trk" \
        $DET_EMB_ROOT $MODEL $REID
    python scripts/eval_mot.py --gt_folder "$MOT_ROOT" \
        --trackers_folder "$OUT_BASE/$trk"
done
