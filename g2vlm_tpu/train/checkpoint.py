"""Checkpoint save/restore with Orbax — the TPU-native equivalent of the
reference's FSDPCheckpoint (train/fsdp_utils.py:134-530):

  * sharded async model/optimizer/EMA state  <-> rank0 FULL_STATE_DICT +
    per-shard optimizer.pt / DCP dirs
  * per-rank/worker `data_status` for dataset fast-forward on resume
    (fsdp_utils.py:478-530)
  * keep-newest-K retention (fsdp_utils.py:45-65)
  * dense -> MoT bootstrap (try_load_ckpt_except_moe + init_moe,
    fsdp_utils.py:398-435; see weights.init_moe_from_dense)
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .trainer import TrainState


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 2, async_save: bool = True):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self.directory = directory
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep,
            enable_async_checkpointing=async_save,
        )
        self._mgr = ocp.CheckpointManager(directory, options=options)

    def save(
        self,
        step: int,
        state: TrainState,
        data_status: Optional[Dict[str, Any]] = None,
    ) -> None:
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        if state.ema_params is not None:
            payload["ema_params"] = state.ema_params
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        if data_status is not None:
            # host-side JSON beside the step dir (arrays are not involved)
            path = os.path.join(self.directory, f"data_status_{step}.json")
            with open(path, "w") as f:
                json.dump(data_status, f)

    def wait(self):
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(
        self, state: TrainState, step: Optional[int] = None
    ) -> tuple[TrainState, Optional[Dict[str, Any]]]:
        """Restore into the (possibly sharded) structure of `state`."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        template = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        if state.ema_params is not None:
            template["ema_params"] = state.ema_params
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template)
        )
        data_status = None
        path = os.path.join(self.directory, f"data_status_{step}.json")
        if os.path.exists(path):
            with open(path) as f:
                data_status = json.load(f)
        new_state = TrainState(
            step=restored["step"],
            params=restored["params"],
            opt_state=restored["opt_state"],
            ema_params=restored.get("ema_params", state.ema_params),
        )
        return new_state, data_status

    def close(self):
        self._mgr.close()


def save_params_debug_safetensors(params: Dict, path: str) -> None:
    """DEBUG dump: pytree-path keys with layer-stacked arrays, for inspection
    only. NOT interchangeable with the reference model.safetensors key space
    (language_model.model.layers.{i}..., transposed 2-D) and not re-readable
    by load_checkpoint / params_from_torch."""
    from safetensors.numpy import save_file

    flat = {}
    for keypath, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath
        )
        flat[name] = np.asarray(leaf)
    save_file(flat, path)
