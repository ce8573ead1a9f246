from .api import Video2music, GenerateResult
from .primer import parse_primer, resolve_key_and_primer

__all__ = ["Video2music", "GenerateResult", "parse_primer",
           "resolve_key_and_primer"]
