"""Training dataset builders for setwise GRPO / SFT.

Parity with Rank-R1/create_dataset.py (v0.1), create_dataset_v0.2.py and
create_dataset_sft.py: 1 relevant + shuffled negatives rendered through a
TOML prompt pack into chat ``prompt`` + ``ground_truth`` (and
``completion`` for SFT). The core row builders are pure functions over
plain dicts so they are testable offline; HF ``datasets`` loading is a
thin gated wrapper.
"""
from __future__ import annotations

import random
import tomllib
from typing import Any, Callable, Dict, List, Optional

from ..engine.tokenizer import Tokenizer


def load_prompt_pack(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return tomllib.load(f)


def build_setwise_row_v01(
    example: Dict[str, Any], prompt: Dict[str, Any], rng: random.Random,
    max_negatives: int = 19,
) -> Dict[str, Any]:
    """v0.1 builder (create_dataset.py:8-37): first positive + up to 19
    shuffled negatives, titles prepended, '[i] text' lines joined by \\n."""
    query = example["query"]
    pos = example["positive_passages"][0]
    rel_doc = f"{pos.get('title', '')} {pos['text']}".strip()
    negs = list(example["negative_passages"])
    rng.shuffle(negs)
    negs = negs[:max_negatives]
    docs = [rel_doc] + [f"{d.get('title', '')} {d['text']}".strip() for d in negs]
    labels = [1] + [0] * len(negs)
    order = list(range(len(docs)))
    rng.shuffle(order)
    docs = [docs[i] for i in order]
    labels = [labels[i] for i in order]
    docs_text = "\n".join(f"[{i + 1}] {d}" for i, d in enumerate(docs))
    gt = f"[{labels.index(1) + 1}]"
    return {
        "prompt": [
            {"role": "system", "content": prompt["prompt_system"]},
            {"role": "user",
             "content": prompt["prompt_user"].format(query=query, docs=docs_text)},
        ],
        "ground_truth": gt,
    }


def build_setwise_row_v02(
    example: Dict[str, Any], prompt: Dict[str, Any], rng: random.Random,
    tokenizer: Optional[Tokenizer] = None,
    max_negatives: int = 9, doc_token_cap: int = 512,
) -> Dict[str, Any]:
    """v0.2 builder (create_dataset_v0.2.py): random positive, 1-9
    negatives with count sampled proportionally to the count, docs
    token-truncated to 512, pack-configured doc prefix/separator."""
    query = example["query"]
    rel = rng.choice(example["positive_passages"])["text"].strip()
    negs = list(example["negative_passages"])
    rng.shuffle(negs)
    negs = negs[:max_negatives]
    nums = list(range(1, len(negs) + 1))
    num = rng.choices(nums, weights=nums, k=1)[0] if nums else 0
    docs = [rel] + [d["text"].strip() for d in negs[:num]]
    if tokenizer is not None:
        docs = [tokenizer.truncate(d, doc_token_cap) for d in docs]
    labels = [1] + [0] * (len(docs) - 1)
    order = list(range(len(docs)))
    rng.shuffle(order)
    docs = [docs[i] for i in order]
    labels = [labels[i] for i in order]
    prefix = prompt.get("doc_prefix", "[{num}]: ")
    sep = prompt.get("doc_separator", "\n\n")
    docs_text = sep.join(
        f"{prefix.format(num=i + 1)}{d}" for i, d in enumerate(docs)
    )
    gt = prompt.get("ground_truth", "[{num}]").format(num=labels.index(1) + 1)
    return {
        "prompt": [
            {"role": "system", "content": prompt["prompt_system"]},
            {"role": "user",
             "content": prompt["prompt_user"].format(query=query, docs=docs_text)},
        ],
        "ground_truth": gt,
    }


def build_sft_row(
    example: Dict[str, Any], prompt: Dict[str, Any], rng: random.Random,
) -> Dict[str, Any]:
    """SFT builder (create_dataset_sft.py): v0.1 prompt + gold completion
    '<answer>[i]</answer>'."""
    row = build_setwise_row_v01(example, prompt, rng)
    gt = row.pop("ground_truth")
    row["completion"] = [
        {"role": "assistant", "content": f"<answer>{gt}</answer>"}
    ]
    row["ground_truth"] = gt
    return row


def build_hf_dataset(
    dataset_name: str, prompt_file: str, builder: Callable = build_setwise_row_v01,
    split: str = "train", seed: int = 929, **kw,
):
    """Gated HF-datasets wrapper (Tevatron/msmarco-passage etc.)."""
    from datasets import load_dataset  # gated: needs network/local cache

    prompt = load_prompt_pack(prompt_file)
    rng = random.Random(seed)
    ds = load_dataset(dataset_name, split=split)
    return ds.map(lambda ex: builder(ex, prompt, rng, **kw))
