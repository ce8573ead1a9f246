from .amt import VideoMusicTransformer
from .bimamba import BiMambaEncoder, BiMambaEncoderLayer, BiMambaEncoderLayerV1
from .layers import DecoderLayer, EncoderLayer, ReluFFN, SwiGLU
from .mamba import Mamba, MambaBlock, MoEMamba, ResidualBlock
from .mingru import MinGRU, MinGRULM
from .music_transformer import MusicTransformer
from .regression import BACKBONES, VideoRegression
from .rnn import RNNStack

__all__ = [
    "VideoMusicTransformer",
    "MusicTransformer",
    "VideoRegression",
    "BACKBONES",
    "Mamba",
    "MambaBlock",
    "MoEMamba",
    "ResidualBlock",
    "BiMambaEncoder",
    "BiMambaEncoderLayer",
    "BiMambaEncoderLayerV1",
    "MinGRU",
    "MinGRULM",
    "RNNStack",
    "EncoderLayer",
    "DecoderLayer",
    "ReluFFN",
    "SwiGLU",
]
