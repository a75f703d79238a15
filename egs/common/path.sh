# Source from any egs/<corpus>/<model>/ script: puts the repo root on
# PYTHONPATH (counterpart of the reference's per-recipe path.sh splice,
# egs/wsj0-mix/conv-tasnet/path.sh:3-4).
repo_root="$(cd "$(dirname "${BASH_SOURCE[0]}")/../.." && pwd)"
export PYTHONPATH="$repo_root${PYTHONPATH:+:$PYTHONPATH}"
# Recipe CLIs pipe through `tee <log>`; without pipefail a crashed CLI
# exits the pipeline 0 and the failure is silently masked.
set -o pipefail
