from .engine import ScoringEngine
from .tokenizer import ByteTokenizer, HFTokenizer, Tokenizer, load_tokenizer

__all__ = [
    "ByteTokenizer",
    "HFTokenizer",
    "ScoringEngine",
    "Tokenizer",
    "load_tokenizer",
]
