"""Data pipeline: synthetic recon JSONL -> packer -> train step consumes the
packed batch. Plus sharding arithmetic and resume fast-forward."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from g2vlm_tpu.config import tiny_test_config
from g2vlm_tpu.data.packing import (
    PackedIterableDataset,
    PackerConfig,
    SequencePacker,
    len2weight,
)
from g2vlm_tpu.data.recon_dataset import JsonlReconDataset
from g2vlm_tpu.models import g2vlm as jg
from g2vlm_tpu.train import trainer

TOKEN_IDS = dict(bos_token_id=7, eos_token_id=8, start_of_image=11, end_of_image=12)


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
        for s in range(3):
            f.write(
                json.dumps(
                    dict(scene_name="scannet", seq_name=f"seq{s}", frames=frames)
                )
                + "\n"
            )
    return str(path)


def _make_group(scene_jsonl, frame_num=2):
    ds = JsonlReconDataset(
        "recon",
        [scene_jsonl],
        img_size=56,  # tiny dino: 4x4 grids
        patch_size=14,
        frame_num=frame_num,
        prompt_ids=[23, 45, 67],
    )
    # pin the per-step knobs the packer would set
    ds.set_random_image_num(frame_num)
    ds.set_random_aspect_ratio(1.0)
    return ds


def test_recon_dataset_yields_valid_samples(scene_jsonl):
    ds = _make_group(scene_jsonl)
    sample = next(iter(ds))
    assert sample["num_tokens"] == 3 + 2 * (16 + 2)
    assert len(sample["dino_views"]) == 2
    v = sample["dino_views"][0]
    assert v["image"].shape == (56, 56, 3)
    assert v["world_points"].shape == (56, 56, 3)
    assert v["point_masks"].sum() > 0
    assert np.isfinite(v["intrinsics"]).all()


def test_packer_builds_train_batch(scene_jsonl):
    import random as pyrandom

    ds = _make_group(scene_jsonl)
    cfg = PackerConfig(
        expected_num_tokens=64,
        max_num_tokens_per_sample=64,
        max_num_tokens=128,
        max_ce_slots=8,
    )
    packer = SequencePacker(cfg, TOKEN_IDS)
    packer.add_sample(next(iter(ds)), pyrandom.Random(0))
    batch = packer.to_batch(pyrandom.Random(0))

    s = cfg.max_num_tokens
    assert batch["doc_id"].shape == (s,)
    n_real = 3 + 2 * 18
    assert (batch["doc_id"] >= 0).sum() == n_real
    assert batch["dino_images"].shape == (2, 3, 56, 56)
    assert batch["world_points"].shape == (2, 56, 56, 3)
    assert batch["is_geo"].sum() == 2 * 16
    # text tokens: 3 prompt + 2*(soi+eoi)
    assert len(batch["text_ids"]) == 3 + 4

    # feed through the jitted train step
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


def test_split_layout_train_forward_matches_mixed(scene_jsonl):
    """Packer sorted_layout + trainer SPLIT mode == unsorted MIXED: the loss
    is layout-invariant (pos field carries logical order through attention,
    index arrays are remapped through the permutation)."""
    import random as pyrandom

    cfg = PackerConfig(
        expected_num_tokens=64,
        max_num_tokens_per_sample=64,
        max_num_tokens=128,
        max_ce_slots=8,
    )

    def make_tb(sorted_layout, bucket=1):
        ds = _make_group(scene_jsonl)
        packer = SequencePacker(cfg, TOKEN_IDS)
        packer.add_sample(next(iter(ds)), pyrandom.Random(0))
        batch = packer.to_batch(
            pyrandom.Random(0), sorted_layout=sorted_layout,
            geo_start_bucket=bucket,
        )
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
        return jax.tree.map(jnp.asarray, tb), batch.get("geo_start")

    tcfg = tiny_test_config()
    params = jg.init_params(tcfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    tb_mixed, _ = make_tb(False)
    tb_split, geo_start = make_tb(True, bucket=16)
    s = cfg.max_num_tokens
    assert geo_start % 16 == 0 and geo_start < s
    # the und region holds no geo tokens (boundary sits in the pad span)
    assert np.asarray(tb_split.is_geo)[:geo_start].sum() == 0

    total_m, det_m = trainer.train_forward(
        params, tb_mixed, tcfg, compute_dtype=jnp.float32
    )
    total_s, det_s = trainer.train_forward(
        params, tb_split, tcfg, compute_dtype=jnp.float32,
        geo_start=geo_start,
    )
    np.testing.assert_allclose(
        float(total_s), float(total_m), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        float(det_s["ce"]), float(det_m["ce"]), rtol=1e-4, atol=1e-5
    )


def test_packed_iterable_dataset(scene_jsonl):
    ds = _make_group(scene_jsonl)
    packed = PackedIterableDataset(
        groups=[dict(name="recon", dataset=ds, weight=1.0, is_mandatory=True)],
        new_token_ids=TOKEN_IDS,
        cfg=PackerConfig(
            expected_num_tokens=80,
            max_num_tokens_per_sample=2000,
            max_num_tokens=4096,
            max_ce_slots=8,
            image_num_range=(2, 2),
        ),
    )
    it = iter(packed)
    b = next(it)
    assert (b["doc_id"] >= 0).sum() >= 80
    # all views in one pack share a shape; geo tokens = n_views * hw
    n, _, h, w = b["dino_images"].shape
    assert b["is_geo"].sum() == n * (h // 14) * (w // 14)


def test_distributed_sharding_arithmetic(scene_jsonl):
    seen = []
    for rank in range(2):
        ds = JsonlReconDataset(
            "recon", [scene_jsonl], local_rank=rank, world_size=2,
            prompt_ids=[1],
        )
        ds.set_epoch(7)
        paths, _ = ds.get_data_paths_per_worker()
        seen.append([p[0] for p in paths])
    assert len(seen[0]) == len(seen[1]) == 1  # 3 rows // 2 ranks
    assert not set(seen[0]) & set(seen[1])


def test_data_status_resume(scene_jsonl):
    ds = _make_group(scene_jsonl)
    ds.data_status = [0]  # resume after row 0 -> start at row 1
    it = iter(ds)
    sample = next(it)
    assert sample["data_indexes"]["data_indexes"] == 1


def test_data_status_loop_closes(scene_jsonl):
    """End-to-end resume loop: packer batches expose consumed cursors,
    fold_data_status builds the checkpoint payload, and a rebuilt dataset
    fast-forwards — the resumed stream continues instead of replaying
    (reference fsdp_utils.py:478-530, dataset_base.py:178-182)."""
    import json as pyjson

    from g2vlm_tpu.data.packing import fold_data_status

    def make_packed(ds):
        return PackedIterableDataset(
            groups=[dict(name="recon", dataset=ds, weight=1.0)],
            new_token_ids=TOKEN_IDS,
            cfg=PackerConfig(
                expected_num_tokens=40,
                max_num_tokens_per_sample=2000,
                max_num_tokens=4096,
                max_ce_slots=8,
                image_num_range=(2, 2),
            ),
        )

    it = iter(make_packed(_make_group(scene_jsonl)))
    status = {}
    for _ in range(2):
        b = next(it)
        assert b["data_indexes"], "packer must surface consumed cursors"
        fold_data_status(status, b["data_indexes"])
    last = status["recon"][0]

    # JSON roundtrip (checkpoint file) stringifies worker keys; the dataset
    # must still find its cursor
    status = pyjson.loads(pyjson.dumps(status))

    ds2 = _make_group(scene_jsonl)
    ds2.data_status = status["recon"]
    resumed = next(iter(make_packed(ds2)))
    first_resumed = resumed["data_indexes"][0]["data_indexes"]
    assert first_resumed == last + 1  # continues, not replays


def test_len2weight():
    assert len2weight(0) == 0
    assert len2weight(4, "square") == 0.5
    assert len2weight(4, "token") == 1
    assert len2weight(4, "sample") == 0.25


def test_prefetch_loader(scene_jsonl):
    from g2vlm_tpu.train.dataloader import PrefetchLoader

    def make_iter(worker_id):
        ds = _make_group(scene_jsonl)
        ds.worker_id = worker_id
        return iter(ds)

    loader = PrefetchLoader(make_iter, num_workers=2, prefetch=2)
    it = iter(loader)
    samples = [next(it) for _ in range(4)]
    assert all(s["num_tokens"] > 0 for s in samples)
    loader.close()


def test_prefetch_loader_propagates_errors():
    from g2vlm_tpu.train.dataloader import PrefetchLoader

    def make_iter(worker_id):
        raise RuntimeError("boom")
        yield  # pragma: no cover

    loader = PrefetchLoader(make_iter, num_workers=1)
    with pytest.raises(RuntimeError, match="boom"):
        next(iter(loader))
    loader.close()


def _proc_iter(worker_id):
    # module-level so the spawn context can pickle it
    for i in range(3):
        yield {"wid": worker_id, "i": i, "arr": np.full((4,), worker_id)}


def _proc_boom(worker_id):
    raise RuntimeError("proc boom")
    yield  # pragma: no cover


def test_process_prefetch_loader():
    from g2vlm_tpu.train.dataloader import ProcessPrefetchLoader

    loader = ProcessPrefetchLoader(_proc_iter, num_workers=2, prefetch=4)
    items = list(loader)
    assert len(items) == 6  # 2 workers x 3 items, none lost
    by_wid = {}
    for it in items:
        by_wid.setdefault(it["wid"], []).append(it["i"])
        assert (it["arr"] == it["wid"]).all()  # numpy round-trips intact
    # per-worker order preserved even though workers interleave
    assert sorted(by_wid) == [0, 1]
    assert all(v == sorted(v) for v in by_wid.values())
    loader.close()


def test_process_prefetch_loader_propagates_errors():
    from g2vlm_tpu.train.dataloader import ProcessPrefetchLoader

    loader = ProcessPrefetchLoader(_proc_boom, num_workers=1)
    with pytest.raises(RuntimeError, match="proc boom"):
        next(iter(loader))
    loader.close()
