#!/usr/bin/env bash
# Fetch the ImageNet-pretrained backbones the training recipes initialize
# from (reference: /root/reference/pretrained/download_imgnet.sh — same
# release artifacts; the importer reads torch .pth files directly).
#
# Gated on egress: in an air-gapped environment, drop resnet50.pth /
# resnet101.pth into this directory manually (see README.md).
set -euo pipefail
cd "$(dirname "$0")"

BASE=https://github.com/whwu95/MVFNet/releases/download/v0.1
# sha256 of the reference-released ImageNet checkpoints. UNSET: this repo
# was built in a zero-egress environment, so the digests could not be
# computed. On first fetch from a trusted network, fill them in
# (sha256sum resnet50.pth) to pin future downloads; until then the script
# WARNS that verification was skipped rather than silently passing.
declare -A SHA256=(
  [resnet50.pth]=""
  [resnet101.pth]=""
)

if ! curl -sI --max-time 10 "$BASE/resnet50.pth" >/dev/null 2>&1; then
  echo "no network egress — place resnet50.pth / resnet101.pth here manually" >&2
  exit 1
fi

for f in resnet50.pth resnet101.pth; do
  [ -f "$f" ] && { echo "$f already present, skipping"; continue; }
  curl -L --fail -o "$f.tmp" "$BASE/$f"
  if [ -n "${SHA256[$f]}" ]; then
    echo "${SHA256[$f]}  $f.tmp" | sha256sum -c -
  else
    echo "WARNING: no pinned sha256 for $f — checksum verification" \
         "SKIPPED (see comment above; fill in SHA256 to pin)" >&2
  fi
  mv "$f.tmp" "$f"
  echo "fetched $f"
done
