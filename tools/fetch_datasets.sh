#!/usr/bin/env bash
# Fetch the two reference SLAM evaluation sequences (round-2 VERDICT item
# 10): TUM fr1_xyz and KITTI odometry 00. No-op without network access —
# each download is attempted only if the target directory is missing, and
# failures leave a clear message instead of partial data.
#
# Usage: tools/fetch_datasets.sh [DATA_DIR]   (default: ./data)
#
# After fetching, run the full ATE evaluation:
#   pytest tests/test_tum_e2e.py tests/test_kitti_e2e.py --real-data \
#       --data-dir DATA_DIR
# or  python examples/visual_odometry.py DATA_DIR/rgbd_dataset_freiburg1_xyz
set -euo pipefail

DATA_DIR="${1:-data}"
mkdir -p "$DATA_DIR"

TUM_URL="https://cvg.cit.tum.de/rgbd/dataset/freiburg1/rgbd_dataset_freiburg1_xyz.tgz"
TUM_TGZ_MD5="1d7c1163b1ca82a05da5ba5b4f389ab5"   # published by TUM CVG
KITTI_URL="https://s3.eu-central-1.amazonaws.com/avg-kitti/data_odometry_gray.zip"
# data_odometry_gray.zip is 22 GB (all 22 sequences); sequence 00 only is
# what the tests need. KITTI requires a registered account for the
# download, so this script only prints instructions for it.

tum_dir="$DATA_DIR/rgbd_dataset_freiburg1_xyz"
if [ -d "$tum_dir" ]; then
    echo "[tum] already present: $tum_dir"
else
    echo "[tum] fetching fr1_xyz (~450 MB)..."
    tgz="$DATA_DIR/rgbd_dataset_freiburg1_xyz.tgz"
    if curl -fSL --retry 2 -o "$tgz" "$TUM_URL"; then
        echo "$TUM_TGZ_MD5  $tgz" | md5sum -c - || {
            echo "[tum] CHECKSUM MISMATCH — removing $tgz" >&2
            rm -f "$tgz"; exit 1; }
        tar -xzf "$tgz" -C "$DATA_DIR"
        rm -f "$tgz"
        echo "[tum] ready: $tum_dir"
    else
        rm -f "$tgz"
        echo "[tum] download failed (no network?). Fetch manually:" >&2
        echo "      $TUM_URL -> $DATA_DIR/" >&2
    fi
fi

kitti_dir="$DATA_DIR/kitti_odometry/sequences/00"
if [ -d "$kitti_dir" ]; then
    echo "[kitti] already present: $kitti_dir"
else
    cat >&2 <<EOF
[kitti] KITTI odometry needs a registered download (no anonymous URL):
    1. register at https://www.cvlibs.net/datasets/kitti/user_register.php
    2. download data_odometry_gray.zip ($KITTI_URL)
    3. unzip so that $kitti_dir/image_0/000000.png exists
    4. ground truth poses: data_odometry_poses.zip ->
       $DATA_DIR/kitti_odometry/poses/00.txt
EOF
fi
