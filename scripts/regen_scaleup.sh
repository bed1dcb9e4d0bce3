#!/usr/bin/env bash
# Rebuild the gitignored scale-up dirs (target/sf1, target/sf3) from
# the driver testdata — one command, so decade/10x re-measures are
# turnkey after a clean checkout. The generator contract (key strides,
# caesar char/token preservation, embedding-norm preservation, copy-0
# verbatim) is pinned by ScaleUpSpec; run `sbt "testOnly
# graft.ScaleUpSpec"` first if the testdata may have been regenerated.
set -euo pipefail
cd "$(dirname "$0")/.."
IN="${1:-/root/testdata/sf0.1}"
sbt -batch "runMain graft.ScaleUp $IN target/sf1 10"
sbt -batch "runMain graft.ScaleUp $IN target/sf3 3"
echo "[regen_scaleup] done: target/sf1 (10x), target/sf3 (3x) from $IN"
