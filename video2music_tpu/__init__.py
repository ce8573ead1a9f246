"""video2music_tpu — a TPU-native (JAX/XLA/Pallas) framework with the full
capability surface of khangklj/Video2Music: video feature extraction, the
Affective Multimodal Transformer family (AMT + V1/V2/V3 variants), the
regression model zoo (biLSTM/biGRU/Mamba/BiMamba/minGRU/MoE backbones),
training/eval loops, KV-cached constrained chord decoding, and the symbolic
music rendering pipeline.
"""

__version__ = "0.1.0"
