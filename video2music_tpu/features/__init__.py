from .clip import (CLIP, CLIPVisionConfig, CLIPTextConfig, CLIPConfig,
                   convert_hf_clip, clip_vit_l14_336_config, preprocess_frames)

__all__ = ["CLIP", "CLIPVisionConfig", "CLIPTextConfig", "CLIPConfig",
           "convert_hf_clip", "clip_vit_l14_336_config", "preprocess_frames"]
