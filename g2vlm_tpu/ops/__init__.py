from .norms import rms_norm, layer_norm
from .rope import (
    mrope_cos_sin,
    apply_mrope,
    rope2d_cos_sin,
    apply_rope2d,
    vision_rope_cos_sin,
    apply_vision_rope,
)
from .masks import TokenInfo, make_segment_mask
from .attention import segment_attention, dense_attention
