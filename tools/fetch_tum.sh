#!/bin/sh
# Fetch the TUM fr1 sequence the reference validates against
# (ref: /root/reference/README.md:63-78, Test_TSDF_Integration.cpp:30-43)
# and convert it to the associated layout `cli.py fuse -d` reads.
#
# This build environment has no network egress, so the fetch is
# documented rather than run in CI; on any connected machine:
#
#   tools/fetch_tum.sh [dest_dir]          # default ./data
#
# produces  <dest>/fr1_xyz/{ground_truth.txt, depth/<stamp>.png}.
set -e
DEST="${1:-data}"
SEQ=rgbd_dataset_freiburg1_xyz
URL="https://cvg.cit.tum.de/rgbd/dataset/freiburg1/${SEQ}.tgz"

mkdir -p "$DEST"
cd "$DEST"
[ -f "${SEQ}.tgz" ] || wget -q "$URL"
[ -d "$SEQ" ] || tar xzf "${SEQ}.tgz"
cd - >/dev/null
python tools/prepare_tum.py "$DEST/$SEQ" "$DEST/fr1_xyz" --copy
echo "run:  python -m tsdf_tpu.cli fuse -d $DEST/fr1_xyz -m 20 -s 128"
