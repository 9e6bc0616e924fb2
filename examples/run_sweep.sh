#!/usr/bin/env bash
# Experiment sweep — equivalent of the reference's run.sh: the benchmark
# roster at hidden=4 through the flagship (v6: reorder -> ELL -> Pallas)
# pipeline. Real datasets run when their files exist under $GCN_TPU_DATA;
# synth-* stand-ins always run (no-egress environment).
set -uo pipefail
cd "$(dirname "$0")/.."

HIDDEN="${HIDDEN:-4}"
ITERS="${ITERS:-100}"
VARIANT="${VARIANT:-v6}"

for g in synth-pubmed synth-flickr synth-arxiv synth-reddit; do
  echo "=== $g (hidden=$HIDDEN, iters=$ITERS, $VARIANT) ==="
  python examples/train_gcn.py -g "$g" -k "$HIDDEN" -i "$ITERS" \
    --variant "$VARIANT" || echo "[sweep] $g failed"
done

# real-data accuracy-parity gate: fires automatically once files are
# provisioned (same gate as tests/test_real_data.py). Exit 5 = nothing
# collected (fine); any other nonzero = a REAL parity failure.
python -m pytest tests/test_real_data.py -q -rs | tail -2
rc=${PIPESTATUS[0]}
sweep_failed=0
if [ "$rc" -ne 0 ] && [ "$rc" -ne 5 ]; then
  echo "[sweep] REAL-DATA PARITY FAILURE (pytest exit $rc)"
  sweep_failed=1
fi

# real datasets, if present (pubmed flickr reddit ppi amazon yelp — run.sh:3-9)
for g in pubmed flickr reddit ppi amazon yelp; do
  python - "$g" <<'EOF' || continue
import sys
from gcn_tpu.data import get_dataset
try:
    get_dataset(sys.argv[1])
except FileNotFoundError:
    sys.exit(1)
except Exception:
    sys.exit(1)
EOF
  echo "=== $g (hidden=$HIDDEN, iters=$ITERS, $VARIANT) ==="
  python examples/train_gcn.py -g "$g" -k "$HIDDEN" -i "$ITERS" \
    --variant "$VARIANT" || echo "[sweep] $g failed"
done

exit "$sweep_failed"
