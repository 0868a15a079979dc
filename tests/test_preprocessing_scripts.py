"""Preprocessing/annotation tooling (reference data/preprocessing/*):
TartanAir JSONL builder + recon-annotation point-cloud visualizer."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")


def _run(script, *args):
    return subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, script), *args],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )


def test_tartanair_builder(tmp_path):
    """Same JSONL shape as reference process_tartanair.py:30-43: one row per
    Easy/Hard sequence with seq_name triple + num_images, short sequences
    dropped."""
    for env, diff, seq, n in [
        ("factory", "Easy", "P000", 30),
        ("factory", "Hard", "P001", 30),
        ("factory", "Easy", "P002", 3),  # below min_num_images
    ]:
        d = tmp_path / env / env / diff / seq / "image_left"
        d.mkdir(parents=True)
        for i in range(n):
            (d / f"{i:06d}_left.png").write_text("x")
    out = tmp_path / "ann"
    r = _run(
        "build_tartanair_annotations.py",
        "--root", str(tmp_path), "--output_dir", str(out),
        "--min_num_images", "24",
    )
    assert r.returncode == 0, r.stderr
    rows = [
        json.loads(l)
        for l in (out / "tartanair_recon_ann.jsonl").read_text().splitlines()
    ]
    assert len(rows) == 2
    assert rows[0] == {
        "seq_name": ["factory", "Easy", "P000"],
        "scene_name": "tartanair",
        "num_images": 30,
    }


def test_visualizer_writes_ply(tmp_path):
    """Unprojects fixture depth+pose to a world point cloud and writes a
    parseable PLY (reference points_visualize_scannet.py role)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    h, w = 48, 64
    frames = []
    for i in range(3):
        img = tmp_path / f"rgb_{i}.png"
        dep = tmp_path / f"d_{i}.npy"
        Image.fromarray((rng.random((h, w, 3)) * 255).astype(np.uint8)).save(img)
        np.save(dep, rng.random((h, w)).astype(np.float32) * 2 + 0.5)
        pose = np.eye(4)
        pose[:3, 3] = [0.1 * i, 0, 0]
        frames.append(
            dict(
                image=str(img), depth=str(dep), depth_scale=1.0,
                extrinsics=pose.tolist(),
                intrinsics=[[50.0, 0, w / 2], [0, 50.0, h / 2], [0, 0, 1]],
            )
        )
    jsonl = tmp_path / "scenes.jsonl"
    jsonl.write_text(
        json.dumps(dict(scene_name="scannet", seq_name="s0", frames=frames))
        + "\n"
    )
    out = tmp_path / "pts.ply"
    r = _run(
        "visualize_recon_annotations.py",
        "--jsonl", str(jsonl), "--frames", "2", "--out", str(out),
    )
    assert r.returncode == 0, r.stderr
    header = out.read_bytes()[:200].decode("latin-1")
    assert header.startswith("ply")
    n_pts = int(
        [l for l in header.splitlines() if l.startswith("element vertex")][0]
        .split()[-1]
    )
    assert n_pts == 2 * h * w  # all fixture depths valid
