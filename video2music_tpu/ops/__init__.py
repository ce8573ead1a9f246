from .attention import MultiHeadAttention, causal_mask, dot_product_attention
from .embeddings import LearnedPE, SinusoidalPE, apply_rope, rope_cache, sinusoidal_table
from .kan import KANLinear
from .losses import (
    bce,
    bce_with_logits,
    combined_chord_loss,
    cross_entropy,
    focal_loss,
    smooth_cross_entropy,
    smooth_l1,
    topk_auxiliary_loss,
)
from .moe import MoELayer
from .norms import RMSNorm, make_norm
from .rpr import rpr_bias_decode, rpr_bias_full, skew
from .scan import (
    gru_scan,
    heinsen_log_scan,
    linear_recurrence,
    logcumsumexp,
    lstm_scan,
    selective_scan,
    selective_scan_step,
)
