"""Device mesh + sharding rules.

The reference scales with torch FSDP FULL_SHARD / HYBRID_SHARD over a 2-D
(replica, shard) device mesh (train/fsdp_utils.py:84-131). The TPU-native
equivalent is a jax.sharding.Mesh with axes ("dp", "fsdp", "tp"):

  * dp    — data parallel replicas (HSDP's replicate groups / DCN axis)
  * fsdp  — parameter sharding (ZeRO-3 over ICI)
  * tp    — tensor parallel within attention/MLP projections (the reference
            only declares a TP plan as metadata, qwen2vl.py:160-168; here it
            is real)

Parameters are sharded along their largest divisible axis over ("fsdp","tp")
via NamedSharding; batch/sequence inputs shard over "dp". XLA GSPMD inserts
the all-gathers/reduce-scatters (the NCCL calls of the reference's FSDP).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP, FSDP, TP = "dp", "fsdp", "tp"


def make_mesh(
    n_devices: Optional[int] = None,
    dp: int = 1,
    fsdp: Optional[int] = None,
    tp: int = 1,
    devices=None,
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if fsdp is None:
        fsdp = n_devices // (dp * tp)
    assert dp * fsdp * tp == n_devices, (dp, fsdp, tp, n_devices)
    arr = np.asarray(devices).reshape(dp, fsdp, tp)
    return Mesh(arr, (DP, FSDP, TP))


def fsdp_param_spec(path_leaf: Tuple, leaf: jax.Array, mesh: Mesh) -> P:
    """Shard the largest axis divisible by the fsdp axis size; replicate
    otherwise. 1-D params (norm scales, biases) stay replicated."""
    n_shard = mesh.shape[FSDP]
    if n_shard == 1 or leaf.ndim <= 1:
        return P()
    shape = leaf.shape
    # Prefer the last axis (output features) for 2-3D weights; fall back to
    # any divisible axis, largest first.
    order = sorted(range(leaf.ndim), key=lambda i: -shape[i])
    for ax in order:
        if shape[ax] % n_shard == 0 and shape[ax] >= 2 * n_shard:
            spec = [None] * leaf.ndim
            spec[ax] = FSDP
            return P(*spec)
    return P()


def shard_params(params: Dict, mesh: Mesh) -> Tuple[Dict, Dict]:
    """Returns (sharded_params, spec_tree)."""
    specs = jax.tree.map(lambda l: fsdp_param_spec((), l, mesh), params)
    sharded = jax.tree.map(
        lambda l, s: jax.device_put(l, NamedSharding(mesh, s)), params, specs
    )
    return sharded, specs


def param_shardings(params: Dict, mesh: Mesh) -> Dict:
    return jax.tree.map(
        lambda l: NamedSharding(mesh, fsdp_param_spec((), l, mesh)), params
    )
