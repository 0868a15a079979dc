#!/usr/bin/env python
"""TartanAir recon-annotation builder (reference
data/preprocessing/process_tartanair.py:12-43).

Walks <root>/<env>/<env>/{Easy,Hard}/<seq>/image_left and emits one JSONL
row per sequence:

  {"seq_name": [env, difficulty, seq], "scene_name": "tartanair",
   "num_images": N}

The reference reads S3 through a petrel Client; here the store is any
pyarrow FileSystem URI (local path, or fs:// / s3:// via
g2vlm_tpu.data.parquet_dataset.register_fs_factory — the same cluster hook
the parquet ingestion uses), so the builder runs against local mirrors and
remote object stores alike.

  python scripts/build_tartanair_annotations.py --root /data/tartanair \
      --output_dir annotations/ [--min_num_images 24]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _fs_for(root: str):
    """(filesystem, path) for a local dir or a pyarrow fs URI.
    resolve_fs returns fs=None for plain local paths (glob semantics);
    listing wants a real FileSystem either way, so wrap those in LocalFileSystem."""
    from g2vlm_tpu.data.parquet_dataset import resolve_fs

    fs, path = resolve_fs(root)
    if fs is None:
        from pyarrow import fs as pafs

        fs = pafs.LocalFileSystem()
        path = os.path.abspath(path)
    return fs, path.rstrip("/")


def _subdirs(fs, path):
    from pyarrow import fs as pafs

    sel = pafs.FileSelector(path, allow_not_found=True)
    return sorted(
        info.base_name
        for info in fs.get_file_info(sel)
        if info.type == pafs.FileType.Directory
    )


def _count_files(fs, path):
    from pyarrow import fs as pafs

    sel = pafs.FileSelector(path, allow_not_found=True)
    return sum(
        1 for info in fs.get_file_info(sel) if info.type == pafs.FileType.File
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True,
                    help="TartanAir root (local dir or pyarrow fs URI)")
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--min_num_images", type=int, default=24,
                    help="drop sequences shorter than this (reference flag)")
    args = ap.parse_args()

    fs, root = _fs_for(args.root)
    out_data = []
    for env in _subdirs(fs, root):
        for diff in ("Easy", "Hard"):
            base = f"{root}/{env}/{env}/{diff}"
            for seq in _subdirs(fs, base):
                n = _count_files(fs, f"{base}/{seq}/image_left")
                if n < args.min_num_images:
                    continue
                out_data.append(
                    {
                        "seq_name": [env, diff, seq],
                        "scene_name": "tartanair",
                        "num_images": n,
                    }
                )

    print(f"{len(out_data)} valid sequences processed...")
    os.makedirs(args.output_dir, exist_ok=True)
    out = os.path.join(args.output_dir, "tartanair_recon_ann.jsonl")
    with open(out, "w") as f:
        for item in out_data:
            f.write(json.dumps(item) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
