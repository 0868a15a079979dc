"""Recon-then-understand parquet dataset: synthetic SPAR-style rows flow
through depth decode, markers, cropping, and sequence-plan assembly."""

import io

import numpy as np
import pytest

from g2vlm_tpu.data.draw_marker import TASK_MARKERS, apply_markers
from g2vlm_tpu.data.recon_then_und_dataset import ReconThenUndDataset


@pytest.fixture
def parquet_file(tmp_path, rng):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from PIL import Image

    def png_bytes(arr):
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return buf.getvalue()

    h, w = 96, 128
    rows = []
    for r in range(4):
        imgs = [
            png_bytes((rng.random((h, w, 3)) * 255).astype(np.uint8))
            for _ in range(2)
        ]
        depths = [
            png_bytes((rng.random((h, w)) * 3000 + 500).astype(np.uint16))
            for _ in range(2)
        ]
        pose = np.eye(4)
        pose[:3, 3] = [0.1 * r, 0, 0]
        intr = np.array([[100.0, 0, w / 2], [0, 100.0, h / 2], [0, 0, 1]])
        rows.append(
            dict(
                question="How far apart are the red and blue points? <vit_image>",
                answer="About two meters.",
                scene_name="scannet",
                dataset_name="spar_scannet",
                image_list=imgs,
                depth_list=depths,
                poses=[pose.reshape(-1).tolist()] * 2,
                intrinsic=intr.tolist(),
                depth_intrinsic=intr.tolist(),
                task_type="depth_prediction_oc",
                metadata=None,
            )
        )
    path = str(tmp_path / "rows.parquet")
    pq.write_table(pa.Table.from_pylist(rows), path, row_group_size=2)
    return path


def test_parse_rows(parquet_file):
    ds = ReconThenUndDataset(
        "spar", [parquet_file], img_size=56, patch_size=14, vit_target_hw=(56, 56)
    )
    it = iter(ds)
    s = next(it)
    assert len(s["dino_views"]) == 2 and len(s["vit_views"]) == 2
    kinds = [p["type"] for p in s["plan"]]
    assert kinds == ["text", "text", "dino_image", "dino_image",
                     "vit_image", "vit_image", "text", "text"]
    assert s["plan"][-1]["loss"] == 1
    v = s["dino_views"][0]
    assert v["point_masks"].sum() > 0
    assert np.isfinite(v["world_points"]).all()


def test_parquet_resume(parquet_file):
    # data_status records the LAST CONSUMED [file, row_group, row]; resume
    # continues with the next sample (matches the jsonl datasets' cursor+1)
    fresh = ReconThenUndDataset(
        "spar", [parquet_file], img_size=56, patch_size=14,
        vit_target_hw=(56, 56),
    )
    it = iter(fresh)
    i0 = next(it)["data_indexes"]["data_indexes"]
    i1 = next(it)["data_indexes"]["data_indexes"]
    ds = ReconThenUndDataset(
        "spar", [parquet_file], img_size=56, patch_size=14,
        vit_target_hw=(56, 56), data_status=[i0],
    )
    s = next(iter(ds))
    assert s["data_indexes"]["data_indexes"] == i1


def test_markers_cover_all_tasks(rng):
    from PIL import Image

    entry = {
        "red_point": [[500, 500]], "blue_point": [[100, 200]],
        "green_point": [[800, 300]], "red_bbox": [[100, 100, 400, 400]],
        "blue_bbox": [[500, 500, 900, 900]], "green_bbox": [[50, 600, 300, 950]],
        "yellow_bbox": [[600, 50, 950, 300]],
        "point_img_idx": [[0, 1, 0]], "bbox_img_idx": [[0, 1, 0, 1]],
        "point_list": [[[500, 500], [200, 200]]],
    }
    for task in TASK_MARKERS:
        imgs = [
            Image.fromarray((rng.random((128, 128, 3)) * 255).astype(np.uint8))
            for _ in range(2)
        ]
        before = [np.asarray(im).copy() for im in imgs]
        apply_markers(imgs, entry, task)
        # every non-empty spec must change at least one pixel
        spec = TASK_MARKERS[task]
        if spec:
            changed = any(
                (np.asarray(im) != b).any() for im, b in zip(imgs, before)
            )
            assert changed, task
