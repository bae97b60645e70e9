#!/bin/sh
# Full test tier -> committed artifact (VERDICT r3 item 7).
#
# The fast tier (`pytest tests/ -x -q`) deselects the slow-marked tests
# (4K goldens, streaming, LM calibration goldens, cv2 parity gates); this
# script runs EVERYTHING on the virtual 8-device CPU mesh and records the
# outcome in FULLTIER_r<N>.txt at the repo root so the full tier is
# auditable without anyone having to type `-m ''`.
#
# Usage: tools/run_full_tier.sh [round-number]   (default: 4)
set -u
ROUND="${1:-4}"
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$ROOT/FULLTIER_r$ROUND.txt"
TMP="$(mktemp)"
cd "$ROOT"
python -m pytest tests/ -q -m '' -p no:cacheprovider > "$TMP" 2>&1
RC=$?   # captured BEFORE any pipe so the artifact records pytest's status
{
  echo "# Full test tier (fast + slow), virtual 8-device CPU mesh"
  echo "# date: $(date -u +%Y-%m-%dT%H:%M:%SZ)"
  echo "# cmd: python -m pytest tests/ -q -m '' -p no:cacheprovider"
  tail -40 "$TMP"
  echo "# exit: $RC"
} > "$OUT"
rm -f "$TMP"
tail -3 "$OUT"
exit "$RC"
