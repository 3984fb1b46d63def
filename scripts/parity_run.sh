#!/usr/bin/env bash
# Parity run against the reference's published checkpoints.
#
# Executes the PARITY.md recipe the moment network egress exists:
# download the reference zoo tarball (TF-format checkpoint + config +
# classes), convert it to a native checkpoint, evaluate, and print the
# mAP to compare against BASELINE.md. Every step after the download is
# already implemented and tested (tests/test_zoo_conversion.py); this
# script only sequences them.
#
# Usage:
#   scripts/parity_run.sh <alias-or-tar> <data_dir> [out_dir]
#
#   alias-or-tar  "accurate" | "fast" (resolve + download from the
#                 reference release index) or a path/URL to an already
#                 downloaded reference tarball (e.g. for a dry run).
#   data_dir      directory with the real val TFRecords + classes.json
#                 (dataset.dir for eval).
#   out_dir       work dir (default: ./parity_run)
#
# Dry-run (no egress, synthetic tarball): tests/test_parity_run.py
# builds a fake reference bundle and runs this script end to end.
set -euo pipefail

ALIAS="${1:?usage: parity_run.sh <alias-or-tar> <data_dir> [out_dir]}"
DATA_DIR="${2:?usage: parity_run.sh <alias-or-tar> <data_dir> [out_dir]}"
OUT="${3:-./parity_run}"
LUMI="${LUMI:-python -m luminoth_tpu}"

# The reference's release index (TF-format bundles; see
# /root/reference/luminoth/tools/checkpoint/__init__.py:20-24).
REF_INDEX_URL="${REF_INDEX_URL:-https://github.com/tryolabs/luminoth/releases/download/v0.0.3/checkpoints.json}"

mkdir -p "$OUT"
cd "$OUT"

# ---- 1. fetch + extract the reference bundle -------------------------
case "$ALIAS" in
  accurate|fast)
    echo "==> resolving '$ALIAS' from $REF_INDEX_URL"
    TAR_URL=$(python - "$ALIAS" "$REF_INDEX_URL" <<'PY'
import json, sys, urllib.request
alias, url = sys.argv[1], sys.argv[2]
index = json.load(urllib.request.urlopen(url, timeout=60))
for entry in index.get("checkpoints", []):
    if entry.get("alias") == alias or entry.get("id") == alias:
        print(entry["url"])
        break
else:
    sys.exit(f"alias {alias!r} not in remote index")
PY
)
    echo "==> downloading $TAR_URL"
    curl -fL "$TAR_URL" -o bundle.tar
    ;;
  *)
    echo "==> using local/explicit tarball $ALIAS"
    cp "$ALIAS" bundle.tar 2>/dev/null || curl -fL "$ALIAS" -o bundle.tar
    ;;
esac

rm -rf extracted && mkdir extracted
tar -xf bundle.tar -C extracted
# Bundles nest members under <id>/; normalize to extracted/.
if [ "$(ls extracted | wc -l)" = 1 ] && [ -d "extracted/$(ls extracted)" ]; then
  mv "extracted/$(ls extracted)"/* extracted/
fi

CKPT_PREFIX=$(ls extracted/model.ckpt* 2>/dev/null | head -1 | sed 's/\.\(index\|meta\|data-[0-9of-]*\)$//')
CKPT_PREFIX="${CKPT_PREFIX:-extracted/model.ckpt}"
CFG="extracted/config.yml"
[ -f "$CFG" ] || { echo "no config.yml in bundle" >&2; exit 1; }

# ---- 2. convert the TF checkpoint to a native one --------------------
echo "==> converting $CKPT_PREFIX"
rm -rf converted
$LUMI checkpoint convert-detector "$CKPT_PREFIX" converted/ -c "$CFG"
# classes travel with the bundle when present
[ -f extracted/classes.json ] && cp extracted/classes.json converted/

# ---- 3. evaluate on the real val split -------------------------------
echo "==> evaluating on $DATA_DIR"
# eval reads checkpoints from <job_dir>/<run_name>/ckpt; the converter
# wrote converted/ckpt, so job_dir=$(pwd), run_name=converted.
$LUMI eval --split val --no-watch -c "$CFG" \
  -o train.job_dir="$(pwd)" \
  -o train.run_name=converted \
  -o dataset.dir="$DATA_DIR"

echo "==> done; compare the reported mAP against BASELINE.md"
