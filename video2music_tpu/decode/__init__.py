from .sampler import GenerateConfig, generate_chords

__all__ = ["GenerateConfig", "generate_chords"]
