#!/usr/bin/env bash
# Download SIFT1B / bigann (~255 GB) — same source as the reference
# (/root/reference/examples/benchmark/download_sift1b.sh).
set -euo pipefail
DEST="${1:-./sift1b}"
mkdir -p "$DEST"
cd "$DEST"
for f in bigann_base.bvecs.gz bigann_learn.bvecs.gz bigann_query.bvecs.gz bigann_gnd.tar.gz; do
  wget -c "ftp://ftp.irisa.fr/local/texmex/corpus/$f"
done
gunzip -k bigann_base.bvecs.gz bigann_learn.bvecs.gz bigann_query.bvecs.gz
tar -xzf bigann_gnd.tar.gz
echo "SIFT1B extracted to $DEST"
