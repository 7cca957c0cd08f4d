"""Document stores and query sources.

The reference fetches passage text from ir_datasets docs_store()
(run.py:165-168) or a Lucene index via Pyserini (run.py:169-173,
run_setwise.py:271-275), and queries from ir_datasets / Pyserini topics /
.tsv / .jsonl files (run.py:135-149, run_setwise.py:247-261). Those
libraries stay optional (gated imports); JSONL/TSV file stores are
first-class so the framework runs self-contained.

Title handling matches the reference: when a title exists it is
prepended as "{title} {text}" (run.py:166-173).
"""
from __future__ import annotations

import json
import os
from typing import Dict, Iterator, List, Optional, Tuple


class Docstore:
    def get_text(self, docid: str) -> str:
        raise NotImplementedError


class DictDocstore(Docstore):
    def __init__(self, mapping: Dict[str, str]):
        self._m = mapping

    def get_text(self, docid: str) -> str:
        return self._m[docid]


class JsonlDocstore(Docstore):
    """{"id"|"docid"|"_id": ..., "title": ..., "text"|"contents": ...} rows.

    Loaded into memory (BM25 top-k corpora are small); an mmap'd offset
    index is unnecessary at reference scale.
    """

    def __init__(self, path: str):
        self._m: Dict[str, str] = {}
        with open(path) as f:
            for line in f:
                if not line.strip():
                    continue
                d = json.loads(line)
                docid = str(d.get("id") or d.get("docid") or d.get("_id"))
                text = d.get("text") or d.get("contents") or ""
                if d.get("title"):
                    text = f"{d['title']} {text}"
                self._m[docid] = text

    def get_text(self, docid: str) -> str:
        return self._m[docid]


class IrDatasetsDocstore(Docstore):
    """ir_datasets-backed store (run.py:165-168); optional dependency."""

    def __init__(self, dataset_name: str):
        import ir_datasets  # gated: not in the base image

        self._store = ir_datasets.load(dataset_name).docs_store()

    def get_text(self, docid: str) -> str:
        doc = self._store.get(docid)
        text = doc.text
        if hasattr(doc, "title"):
            text = f"{doc.title} {text}"
        return text


class PyseriniDocstore(Docstore):
    """Lucene index raw-JSON store (run.py:169-173); optional dependency."""

    def __init__(self, index_name_or_path: str):
        from pyserini.search.lucene import LuceneSearcher  # gated

        if os.path.exists(index_name_or_path):
            self._searcher = LuceneSearcher(index_name_or_path)
        else:
            self._searcher = LuceneSearcher.from_prebuilt_index(index_name_or_path)

    def get_text(self, docid: str) -> str:
        data = json.loads(self._searcher.doc(docid).raw())
        text = data.get("text", "")
        if "title" in data:
            text = f'{data["title"]} {text}'
        return text


# ---------------------------------------------------------------------------
# Query sources
# ---------------------------------------------------------------------------
def load_queries_tsv(path: str) -> Dict[str, str]:
    out: Dict[str, str] = {}
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            qid, text = line.rstrip("\n").split("\t", 1)
            out[qid] = text
    return out


def load_queries_jsonl(path: str) -> Dict[str, str]:
    out: Dict[str, str] = {}
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            d = json.loads(line)
            qid = str(d.get("qid") or d.get("query_id") or d.get("id"))
            out[qid] = d.get("query") or d.get("text") or d.get("title")
    return out


def load_queries_ir_datasets(dataset_name: str) -> Dict[str, str]:
    import ir_datasets  # gated

    ds = ir_datasets.load(dataset_name)
    return {q.query_id: q.text for q in ds.queries_iter()}


def load_queries_pyserini_topics(index: str) -> Dict[str, str]:
    from pyserini.search._base import get_topics  # gated

    topics = get_topics(index + "-test")
    return {str(k): v["title"] for k, v in topics.items()}


def load_queries(path_or_name: str) -> Dict[str, str]:
    """Dispatch on extension: .tsv / .jsonl files, else ir_datasets name."""
    if path_or_name.endswith(".tsv"):
        return load_queries_tsv(path_or_name)
    if path_or_name.endswith(".jsonl"):
        return load_queries_jsonl(path_or_name)
    return load_queries_ir_datasets(path_or_name)
