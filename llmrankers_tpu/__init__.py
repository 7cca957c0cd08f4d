"""llmrankers_tpu — a TPU-native LLM reranking framework.

Feature-parity rebuild of ielab/llm-rankers (see SURVEY.md) designed for
JAX/XLA/Pallas on TPU: from-scratch T5 and decoder-only transformers,
wave-batched comparison scheduling instead of sequential batch-1
compare() calls, fixed-shape bucketed execution, and pjit sharding over
a ('data', 'model') ICI mesh.
"""
from .types import LlmRanker, RerankStats, SearchResult

__version__ = "0.1.0"

__all__ = [
    "LlmRanker",
    "RerankStats",
    "SearchResult",
    "__version__",
]
