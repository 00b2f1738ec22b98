#!/usr/bin/env bash
# Download SIFT1M (745 MB) — same source as the reference
# (/root/reference/examples/benchmark/download_sift1m.sh).
set -euo pipefail
DEST="${1:-./sift1m}"
mkdir -p "$DEST"
cd "$DEST"
wget -c ftp://ftp.irisa.fr/local/texmex/corpus/sift.tar.gz
tar -xzf sift.tar.gz
echo "SIFT1M extracted to $DEST/sift"
