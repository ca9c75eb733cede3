#!/usr/bin/env bash
# Fetch the ImageNet-pretrained backbones the training recipes initialize
# from (reference: /root/reference/pretrained/download_imgnet.sh — same
# release artifacts; the importer reads torch .pth files directly).
#
# Gated on egress: in an air-gapped environment, drop resnet50.pth /
# resnet101.pth into this directory manually (see README.md).
#
# Usage: download_imgnet.sh [--allow-unverified]
#   Without a pinned sha256 the script FAILS CLOSED (the download is
#   removed, nothing installed). Pass --allow-unverified to accept an
#   unpinned artifact anyway (zero-egress bootstrap; pin it afterwards).
set -euo pipefail
cd "$(dirname "$0")"

ALLOW_UNVERIFIED=0
[ "${1:-}" = "--allow-unverified" ] && ALLOW_UNVERIFIED=1

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
  elif [ "$ALLOW_UNVERIFIED" = "1" ]; then
    echo "WARNING: no pinned sha256 for $f — installing UNVERIFIED" \
         "(--allow-unverified); pin it: sha256sum $f" >&2
  else
    rm -f "$f.tmp"
    echo "ERROR: no pinned sha256 for $f — refusing to install an" \
         "unverified download. Re-run with --allow-unverified to accept," \
         "then pin the digest in SHA256 above." >&2
    exit 1
  fi
  mv "$f.tmp" "$f"
  echo "fetched $f"
done
