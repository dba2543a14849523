#!/bin/sh
# Order-shuffled test pass (r14, VERDICT #1): runs the whole suite
# with the TEST FILES in a random order so order-dependent state
# leaks (shared-session temp views, class-attribute overrides, module
# caches) surface in-round instead of in the judge's run. Seed with
# SHUF_SEED for a reproducible order; defaults to the date so every
# day exercises a new permutation.
set -e
cd "$(dirname "$0")/.."
SEED="${SHUF_SEED:-$(date +%Y%m%d)}"
echo "== shuffled pytest (seed $SEED) =="
FILES=$(python - "$SEED" <<'EOF'
import glob, random, sys
files = sorted(glob.glob("tests/test_*.py"))
random.Random(int(sys.argv[1])).shuffle(files)
print(" ".join(files))
EOF
)
# shellcheck disable=SC2086
python -m pytest $FILES -q
