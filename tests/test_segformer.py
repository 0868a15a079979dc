"""Parity: SegFormer mit_b0 sky-mask model vs reference EncoderDecoder."""

import numpy as np
import jax.numpy as jnp
import torch

import torch_ref

torch_ref.install()

from g2vlm_tpu.models import segformer as jseg


def test_segformer_logits_parity(rng):
    from pi3.models.segformer.model import EncoderDecoder

    torch.manual_seed(4)
    model = EncoderDecoder().eval()
    with torch.no_grad():
        for p in model.parameters():
            p.uniform_(-0.05, 0.05)
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d) or "BatchNorm" in type(m).__name__:
                if hasattr(m, "running_mean"):
                    m.running_mean.uniform_(-0.1, 0.1)
                    m.running_var.uniform_(0.5, 1.5)

    imgs = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        meta = dict(img_shape=(64, 64), scale_factor=1.0, flip=False)
        ref_logits = model.encode_decode(torch.from_numpy(imgs.copy()), meta).numpy()
        ref_mask = model.inference_(torch.from_numpy(imgs.copy())).numpy() == 2

    params = jseg.params_from_torch(model.state_dict())
    got_logits = jseg.seg_logits(params, jnp.asarray(imgs), jseg.SegformerConfig())
    np.testing.assert_allclose(
        np.asarray(got_logits), ref_logits, atol=5e-4, rtol=1e-3
    )
    got_mask = np.asarray(
        jseg.predict_sky_mask(params, jnp.asarray(imgs))
    )
    assert (got_mask == ref_mask).mean() > 0.999
