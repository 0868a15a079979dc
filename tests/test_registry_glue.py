"""YAML config -> registry -> PackedIterableDataset -> train step: the glue
seam train.py's packer_batches exercises (reference DataConfig/PackedDataset
wiring, data/dataset_base.py:126-195 + data/configs/*.yaml)."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from g2vlm_tpu.config import tiny_test_config
from g2vlm_tpu.data.packing import PackedIterableDataset, PackerConfig
from g2vlm_tpu.data.registry import (
    DATASET_INFO,
    build_groups_from_config,
    load_yaml_config,
    register_dataset,
)
from g2vlm_tpu.models import g2vlm as jg
from g2vlm_tpu.train import trainer

TOKEN_IDS = dict(bos_token_id=7, eos_token_id=8, start_of_image=11, end_of_image=12)

YAML_TEXT = """\
recon:
  dataset_names:
  - test_scannet
  dino_image_transform_args:
    target_size: 56
  is_mandatory: true
  weight: 1.0
"""


@pytest.fixture
def scene_jsonl(tmp_path, rng):
    from PIL import Image

    n_frames = 6
    h, w = 96, 128
    frames = []
    for i in range(n_frames):
        img_path = str(tmp_path / f"rgb_{i}.png")
        depth_path = str(tmp_path / f"d_{i}.npy")
        Image.fromarray(
            (rng.random((h, w, 3)) * 255).astype(np.uint8)
        ).save(img_path)
        np.save(depth_path, rng.random((h, w)).astype(np.float32) * 3 + 0.5)
        pose = np.eye(4)
        pose[:3, 3] = rng.standard_normal(3) * 0.1
        intr = np.array(
            [[100.0, 0, w / 2], [0, 100.0, h / 2], [0, 0, 1]], np.float32
        )
        frames.append(
            dict(
                image=img_path,
                depth=depth_path,
                depth_scale=1.0,
                extrinsics=pose.tolist(),
                intrinsics=intr.tolist(),
            )
        )
    path = tmp_path / "scenes.jsonl"
    with open(path, "w") as f:
        for s in range(4):
            f.write(
                json.dumps(
                    dict(scene_name="scannet", seq_name=f"seq{s}", frames=frames)
                )
                + "\n"
            )
    return str(path)


@pytest.fixture
def yaml_path(tmp_path, scene_jsonl):
    register_dataset("recon", "test_scannet", jsonl_path=scene_jsonl)
    p = tmp_path / "tiny_train.yaml"
    p.write_text(YAML_TEXT)
    yield str(p)
    DATASET_INFO["recon"].pop("test_scannet", None)


class _FakeTokenizer:
    def encode(self, text):
        return [(23 + 7 * i) % 97 for i in range(len(text.split()))]


def _packer_cfg():
    return PackerConfig(
        expected_num_tokens=64,
        max_num_tokens_per_sample=64,
        max_num_tokens=128,
        max_ce_slots=8,
        image_num_range=(2, 2),
        aspect_ratio_range=(1.0, 1.0),
        cojitter_prob=0.0,
    )


def _build_packed(yaml_path, data_status=None):
    groups = build_groups_from_config(
        load_yaml_config(yaml_path),
        tokenizer=_FakeTokenizer(),
        data_status=data_status,
    )
    assert len(groups) == 1
    (g,) = groups
    assert g["name"] == "recon" and g["is_mandatory"] and g["weight"] == 1.0
    # target_size flowed from the YAML transform args into the dataset
    assert g["dataset"].img_size == 56
    return PackedIterableDataset(groups, TOKEN_IDS, _packer_cfg())


def test_yaml_config_to_train_step(yaml_path):
    """configs/*.yaml schema -> registry -> packer -> jitted train forward."""
    packed = _build_packed(yaml_path)
    batch = next(iter(packed))

    n_views = batch["dino_images"].shape[0]
    assert n_views >= 2
    assert batch["dino_images"].shape[1:] == (3, 56, 56)
    assert (batch["doc_id"] >= 0).sum() > 0

    tcfg = tiny_test_config()
    params = jg.init_params(tcfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    tb = trainer.TrainBatch(
        text_ids=batch["text_ids"],
        text_indexes=batch["text_indexes"],
        dino_indexes=batch["dino_indexes"],
        vit_indexes=batch["vit_indexes"],
        is_geo=batch["is_geo"],
        position_ids=batch["position_ids"],
        doc_id=batch["doc_id"],
        fn_id=batch["fn_id"],
        noise_id=batch["noise_id"],
        pos=batch["pos"],
        ce_indexes=batch["ce_indexes"],
        ce_labels=batch["ce_labels"],
        ce_weights=batch["ce_weights"],
        dino_images=batch["dino_images"],
        world_points=batch["world_points"][None],
        point_masks=batch["point_masks"][None],
        extrinsics=batch["extrinsics"][None],
        normal_batch_mask=np.ones((1,), bool),
    )
    tb = jax.tree.map(jnp.asarray, tb)
    total, details = trainer.train_forward(
        params, tb, tcfg, compute_dtype=jnp.float32
    )
    assert np.isfinite(float(total))
    assert float(details["dl"]) > 0


def test_yaml_data_status_resume(yaml_path):
    """data_status captured mid-stream re-enters through the registry and
    fast-forwards the dataset (reference FSDPCheckpoint data_status path)."""
    from g2vlm_tpu.data.packing import fold_data_status

    packed = _build_packed(yaml_path)
    it = iter(packed)
    b = next(it)
    assert b["data_indexes"], "packer must surface consumed cursors"
    status = {}
    fold_data_status(status, b["data_indexes"])
    last = status["test_scannet"][0]
    # 4 fixture scenes, 2 consumed: the resume point is mid-epoch
    assert last < 3

    # data_status re-enters through build_groups_from_config (keyed by
    # dataset name, like train.py's checkpoint payload)
    resumed = _build_packed(yaml_path, data_status=status)
    res_first = next(iter(resumed))
    assert res_first["data_indexes"][0]["data_indexes"] == last + 1


def test_unknown_group_raises(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("nonexistent_group:\n  dataset_names: [x]\n")
    with pytest.raises(KeyError):
        build_groups_from_config(load_yaml_config(str(p)))
