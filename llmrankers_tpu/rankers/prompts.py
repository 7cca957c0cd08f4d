"""Prompt construction for every scoring paradigm.

The prompt strings are behavioral contracts, reproduced verbatim from the
reference so that identical models produce identical scores:
  * setwise label prompt          — setwise.py:82-84
  * pairwise A/B prompt           — pairwise.py:38-44
  * pointwise qlm / yes_no        — pointwise.py:42, 85
  * monoT5 / duoT5 templates      — pointwise.py:140, pairwise.py:299
  * RankGPT listwise chat + completion forms, with the shrink-to-fit
    word-cap loop                 — listwise.py:17-110
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

# Single-token passage labels; X/Y/Z excluded because they tokenize to
# multiple pieces under T5 vocab (reference comment, setwise.py:22-23).
CHARACTERS = [
    "A", "B", "C", "D", "E", "F", "G", "H", "I", "J", "K", "L", "M",
    "N", "O", "P", "Q", "R", "S", "T", "U", "V", "W",
]


def setwise_prompt(query: str, doc_texts: Sequence[str],
                   labels: Optional[Sequence[str]] = None) -> str:
    labels = labels or CHARACTERS
    passages = "\n\n".join(
        f'Passage {labels[i]}: "{t}"' for i, t in enumerate(doc_texts)
    )
    return (
        f'Given a query "{query}", which of the following passages is the most '
        "relevant one to the query?\n\n"
        + passages
        + "\n\nOutput only the passage label of the most relevant passage:"
    )


PAIRWISE_PROMPT = """Given a query "{query}", which of the following two passages is more relevant to the query?

Passage A: "{doc1}"

Passage B: "{doc2}"

Output Passage A or Passage B:"""


def pairwise_prompt(query: str, doc1: str, doc2: str) -> str:
    return PAIRWISE_PROMPT.format(query=query, doc1=doc1, doc2=doc2)


def qlm_prompt(doc_text: str) -> str:
    return f"Passage: {doc_text}\nPlease write a question based on this passage."


def yes_no_prompt(query: str, doc_text: str) -> str:
    return (
        f"Passage: {doc_text}\nQuery: {query}\n"
        "Does the passage answer the query? Answer 'Yes' or 'No'"
    )


def monot5_prompt(query: str, doc_text: str) -> str:
    return f"Query: {query} Document: {doc_text} Relevant:"


def duot5_prompt(query: str, doc1: str, doc2: str) -> str:
    return f"Query: {query} Document0: {doc1} Document1: {doc2} Relevant:"


# ---------------------------------------------------------------------------
# RankGPT listwise forms
# ---------------------------------------------------------------------------
def rankgpt_prefix_messages(query: str, num: int) -> List[dict]:
    return [
        {
            "role": "system",
            "content": "You are RankGPT, an intelligent assistant that can rank "
            "passages based on their relevancy to the query.",
        },
        {
            "role": "user",
            "content": f"I will provide you with {num} passages, each indicated by "
            f"number identifier []. \nRank the passages based on their relevance "
            f"to query: {query}.",
        },
        {"role": "assistant", "content": "Okay, please provide the passages."},
    ]


def rankgpt_post_prompt(query: str, num: int) -> str:
    return (
        f"Search Query: {query}. \nRank the {num} passages above based on their "
        "relevance to the search query. The passages should be listed in "
        "descending order using identifiers. The most relevant passages should "
        "be listed first. The output format should be [] > [], e.g., [1] > [2]. "
        "Only response the ranking results, do not say any word or explain."
    )


def _clean_doc(text: str, word_cap: int) -> str:
    content = text.replace("Title: Content: ", "").strip()
    return " ".join(content.split()[: int(word_cap)])


def rankgpt_chat_messages(
    query: str,
    doc_texts: Sequence[str],
    token_count: Optional[Callable[[List[dict]], int]] = None,
    token_budget: Optional[int] = None,
) -> List[dict]:
    """Chat-form permutation instruction with the reference's shrink-to-fit
    loop: per-doc word cap starts at 300 and decrements until the message
    list fits the budget (listwise.py:66-87)."""
    num = len(doc_texts)
    max_length = 300
    while True:
        messages = rankgpt_prefix_messages(query, num)
        for rank, text in enumerate(doc_texts, start=1):
            messages.append(
                {"role": "user", "content": f"[{rank}] {_clean_doc(text, max_length)}"}
            )
            messages.append(
                {"role": "assistant", "content": f"Received passage [{rank}]."}
            )
        messages.append({"role": "user", "content": rankgpt_post_prompt(query, num)})
        if token_count is None or token_budget is None:
            return messages
        if token_count(messages) <= token_budget or max_length <= 0:
            return messages
        max_length -= 1


def rankgpt_completion_prompt(query: str, doc_texts: Sequence[str]) -> str:
    """Single-string completion form used by the T5 listwise generation
    path (listwise.py:91-110)."""
    num = len(doc_texts)
    msg = (
        "This is RankGPT, an intelligent assistant that can rank passages based "
        "on their relevancy to the query.\n\n"
        f"The following are {num} passages, each indicated by number identifier []. "
        f"I can rank them based on their relevance to query: {query}\n\n"
    )
    for rank, text in enumerate(doc_texts, start=1):
        msg += f"[{rank}] {_clean_doc(text, 300)}\n\n"
    msg += f"The search query is: {query}"
    msg += (
        f"I will rank the {num} passages above based on their relevance to the "
        "search query. The passages will be listed in descending order using "
        "identifiers, and the most relevant passages should be listed first, "
        "and the output format should be [] > [] > etc, e.g., [1] > [2] > etc.\n\n"
        f"The ranking results of the {num} passages (only identifiers) is:"
    )
    return msg
