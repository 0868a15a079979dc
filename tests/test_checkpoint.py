"""Checkpoint round-trip incl. resharded restore on a virtual mesh and the
dense->MoT bootstrap."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from g2vlm_tpu.config import tiny_test_config
from g2vlm_tpu.models import g2vlm as jg
from g2vlm_tpu.parallel import mesh as meshlib
from g2vlm_tpu.train import trainer
from g2vlm_tpu.train.checkpoint import CheckpointManager
from g2vlm_tpu.weights import init_moe_from_dense


def _state(cfg, seed=0):
    params = jg.init_params(cfg, jax.random.PRNGKey(seed), dtype=jnp.float32)
    opt = trainer.make_optimizer()
    return trainer.init_train_state(params, opt, ema=True)


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_test_config()
    state = _state(cfg)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2, async_save=False)
    mgr.save(0, state, data_status={"rank0": {"worker0": [3, 17, 42]}})
    mgr.wait()

    fresh = _state(cfg, seed=1)
    restored, ds = mgr.restore(fresh)
    assert ds == {"rank0": {"worker0": [3, 17, 42]}}
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored.params,
        state.params,
    )
    mgr.close()


def test_checkpoint_restore_resharded(tmp_path):
    """Save unsharded, restore into an FSDP-sharded target (the reference's
    DCP reshard-on-load, fsdp_utils.py:222-262)."""
    cfg = tiny_test_config()
    state = _state(cfg)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=1, async_save=False)
    mgr.save(0, state)
    mgr.wait()

    mesh = meshlib.make_mesh(8, dp=1, fsdp=8, tp=1)
    sharded_params, _ = meshlib.shard_params(
        jg.init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32), mesh
    )
    opt = trainer.make_optimizer()
    target = trainer.init_train_state(sharded_params, opt, ema=True)
    restored, _ = mgr.restore(target)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored.params,
        state.params,
    )
    mgr.close()


def test_checkpoint_roundtrip_factored_adam(tmp_path):
    """FactoredAdamState carries None leaves (nu_row/nu_col/nu_full are
    mutually exclusive per param leaf) inside a NamedTuple — a pytree shape
    the Orbax StandardSave path must round-trip faithfully."""
    cfg = tiny_test_config()
    params = jg.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    opt = trainer.make_optimizer(
        params=params, factored_v=True, mu_dtype=jnp.bfloat16
    )
    state = trainer.init_train_state(params, opt, ema=False)
    # advance the state so nu EMAs are nonzero before saving
    g = jax.tree.map(jnp.ones_like, params)
    u, new_opt_state = opt.update(g, state.opt_state, params)
    state = state._replace(opt_state=new_opt_state, step=state.step + 1)

    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=1, async_save=False)
    mgr.save(1, state)
    mgr.wait()

    fresh_params = jg.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    target = trainer.init_train_state(fresh_params, opt, ema=False)
    target = target._replace(
        opt_state=opt.update(g, target.opt_state, fresh_params)[1],
        step=target.step + 1,
    )
    restored, _ = mgr.restore(target)
    # identical treedef (incl. the None-leaf positions) and identical values
    assert jax.tree.structure(restored.opt_state) == jax.tree.structure(
        state.opt_state
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored.opt_state,
        state.opt_state,
    )
    mgr.close()


def test_keep_latest(tmp_path):
    cfg = tiny_test_config()
    state = _state(cfg)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2, async_save=False)
    for s in (0, 1, 2, 3):
        mgr.save(s, state)
    mgr.wait()
    assert mgr.latest_step() == 3
    assert sorted(mgr._mgr.all_steps()) == [2, 3]
    mgr.close()


def test_init_moe_from_dense():
    cfg = tiny_test_config()
    params = jg.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    # perturb geo weights, then bootstrap: geo must equal base afterwards
    params["llm"]["layers"]["q_geo"]["w"] = (
        params["llm"]["layers"]["q_geo"]["w"] + 1.0
    )
    boot = init_moe_from_dense(params)
    np.testing.assert_array_equal(
        np.asarray(boot["llm"]["layers"]["q_geo"]["w"]),
        np.asarray(boot["llm"]["layers"]["q"]["w"]),
    )
    np.testing.assert_array_equal(
        np.asarray(boot["llm"]["layers"]["mlp_geo"]["gate"]["w"]),
        np.asarray(boot["llm"]["layers"]["mlp"]["gate"]["w"]),
    )
