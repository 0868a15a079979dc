"""Bridge for running the PyTorch reference (/root/reference) on CPU inside
tests, to produce golden values for parity checks.

The reference imports `flash_attn` (a CUDA-only wheel) and `easydict` which are
not installed; we register behavior-equivalent CPU stubs before importing it.
The flash stub reproduces flash_attn_varlen_func semantics including GQA and
the bottom-right-aligned causal mask for q_len < kv_len.
"""

from __future__ import annotations

import sys
import types

REF_ROOT = "/root/reference"


def _install_flash_stub():
    if "flash_attn" in sys.modules:
        return
    import torch
    import torch.nn.functional as F

    import importlib.machinery

    mod = types.ModuleType("flash_attn")
    mod.__spec__ = importlib.machinery.ModuleSpec("flash_attn", None)
    mod.__version__ = "2.7.4"

    def flash_attn_varlen_func(
        q,
        k,
        v,
        cu_seqlens_q,
        cu_seqlens_k,
        max_seqlen_q=None,
        max_seqlen_k=None,
        causal=False,
        **kwargs,
    ):
        outs = []
        nseg = len(cu_seqlens_q) - 1
        h = q.shape[1]
        kvh = k.shape[1]
        rep = h // kvh
        for i in range(nseg):
            qs = q[cu_seqlens_q[i] : cu_seqlens_q[i + 1]].float()
            ks = k[cu_seqlens_k[i] : cu_seqlens_k[i + 1]].float()
            vs = v[cu_seqlens_k[i] : cu_seqlens_k[i + 1]].float()
            if rep > 1:
                ks = ks.repeat_interleave(rep, dim=1)
                vs = vs.repeat_interleave(rep, dim=1)
            qt = qs.permute(1, 0, 2)  # (H, Sq, D)
            kt = ks.permute(1, 0, 2)
            vt = vs.permute(1, 0, 2)
            mask = None
            if causal:
                sq, sk = qt.shape[1], kt.shape[1]
                offs = sk - sq
                idx_q = torch.arange(sq).unsqueeze(1)
                idx_k = torch.arange(sk).unsqueeze(0)
                mask = idx_k <= (idx_q + offs)
            o = F.scaled_dot_product_attention(qt, kt, vt, attn_mask=mask)
            outs.append(o.permute(1, 0, 2).to(q.dtype))
        return torch.cat(outs, dim=0)

    mod.flash_attn_varlen_func = flash_attn_varlen_func
    sys.modules["flash_attn"] = mod


def _install_easydict_stub():
    if "easydict" in sys.modules:
        return
    mod = types.ModuleType("easydict")

    class EasyDict(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    mod.EasyDict = EasyDict
    sys.modules["easydict"] = mod


def _install_torchvision_stub():
    if "torchvision" in sys.modules:
        return
    try:
        import torchvision  # noqa: F401

        return
    except ImportError:
        pass
    import importlib.machinery

    import torch
    import torch.nn.functional as F

    tv = types.ModuleType("torchvision")
    tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
    transforms = types.ModuleType("torchvision.transforms")
    functional = types.ModuleType("torchvision.transforms.functional")

    class Normalize:
        def __init__(self, mean, std, inplace=False):
            self.mean = torch.tensor(mean)
            self.std = torch.tensor(std)

        def __call__(self, x):
            shape = [1] * x.ndim
            shape[-3] = -1
            return (x - self.mean.view(shape)) / self.std.view(shape)

    class Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    class ToTensor:
        def __call__(self, pic):
            import numpy as np

            arr = np.asarray(pic, dtype=np.float32) / 255.0
            if arr.ndim == 2:
                arr = arr[:, :, None]
            return torch.from_numpy(arr).permute(2, 0, 1).contiguous()

    class InterpolationMode:
        BILINEAR = "bilinear"
        BICUBIC = "bicubic"
        NEAREST = "nearest"
        LANCZOS = "lanczos"

    transforms.Normalize = Normalize
    transforms.Compose = Compose
    transforms.ToTensor = ToTensor
    transforms.InterpolationMode = InterpolationMode
    transforms.functional = functional
    functional.to_tensor = lambda pic: ToTensor()(pic)
    tv.transforms = transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = functional


def patch_dino_attention_fp32(model):
    """Replace the reference DINOv2 attention forward (which hard-casts q/k/v
    to bf16 for the flash kernel, dinov2_model.py:49-58) with an fp32-exact
    equivalent so CPU golden values are full precision."""
    import flash_attn
    from modeling.g2vlm.dinov2_model import Dinov2WithRegistersSelfAttention2

    def fwd(self, hidden_states, cu_seqlens, max_seqlen, **kw):
        t = hidden_states.shape[0]
        # NOTE: the reference's cu_seqlens count patch tokens only (hw per
        # view) while the packed stream includes CLS+register tokens, so the
        # real varlen windows are misaligned and the trailing rows are
        # UNDEFINED (g2vlm.py:988-996 vs dinov2_model.py:335-344). We use
        # clean per-view windows — the semantics the code intends.
        import torch as _torch

        n_seg = len(cu_seqlens) - 1
        seg = t // n_seg
        cu = _torch.arange(0, n_seg + 1, dtype=_torch.int32) * seg
        q = self.query(hidden_states).view(
            t, self.num_attention_heads, self.attention_head_size
        )
        k = self.key(hidden_states).view(
            t, self.num_attention_heads, self.attention_head_size
        )
        v = self.value(hidden_states).view(
            t, self.num_attention_heads, self.attention_head_size
        )
        o = flash_attn.flash_attn_varlen_func(
            q, k, v, cu_seqlens_q=cu, cu_seqlens_k=cu, causal=False
        )
        return o.reshape(t, -1)

    for m in model.modules():
        if isinstance(m, Dinov2WithRegistersSelfAttention2):
            m.forward = fwd.__get__(m)
    return model


import contextlib


def allow_math_sdpa():
    """The reference pins SDPA to EFFICIENT_ATTENTION (qwen2vl.py:322,524),
    which has no CPU kernel for float masks; relax to a no-op context so the
    math backend can serve golden runs."""
    import modeling.g2vlm.qwen2vl as ref_qwen

    ref_qwen.sdpa_kernel = lambda *a, **k: contextlib.nullcontext()


@contextlib.contextmanager
def fp32_casts():
    """Neutralize the reference's in-code `.to(torch.bfloat16)` casts
    (e.g. qwen2vl.py:375-377, 579, 617-619) so CPU golden values are exact
    fp32. On CUDA these casts merely mirror autocast; on CPU they would
    inject bf16 quantization into the goldens."""
    import torch

    orig = torch.Tensor.to

    def to(self, *args, **kwargs):
        args = tuple(
            torch.float32 if a is torch.bfloat16 else a for a in args
        )
        if kwargs.get("dtype") is torch.bfloat16:
            kwargs = dict(kwargs, dtype=torch.float32)
        return orig(self, *args, **kwargs)

    torch.Tensor.to = to
    try:
        yield
    finally:
        torch.Tensor.to = orig


def _install_timm_stub():
    if "timm" in sys.modules:
        return
    try:
        import timm  # noqa: F401

        return
    except ImportError:
        pass
    import importlib.machinery

    import torch
    import torch.nn as nn

    timm = types.ModuleType("timm")
    timm.__spec__ = importlib.machinery.ModuleSpec("timm", None)
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            return tensor.normal_(mean, std).clamp_(a * std, b * std)

    class DropPath(nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob or 0.0

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            mask = torch.rand((x.shape[0],) + (1,) * (x.ndim - 1)) < keep
            return x / keep * mask

    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    layers.DropPath = DropPath
    models.layers = layers
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


def install():
    """Make the reference importable: `modeling.*`, `pi3.*`, `data.*`."""
    for p in (REF_ROOT, REF_ROOT + "/modeling"):
        if p not in sys.path:
            sys.path.insert(0, p)
    _install_timm_stub()
    _install_flash_stub()
    _install_easydict_stub()
    _install_torchvision_stub()
    # Newer transformers moved VideoInput out of image_utils; the reference's
    # image processor still imports it from there.
    import transformers.image_utils as _iu

    if not hasattr(_iu, "VideoInput"):
        _iu.VideoInput = list
    if not hasattr(_iu, "make_batched_videos"):
        _iu.make_batched_videos = lambda videos: videos
