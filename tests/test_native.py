"""Native host-ops: build, correctness vs numpy fallback, TREC parser."""
import numpy as np
import pytest

from llmrankers_tpu.utils import native


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        pytest.skip("native library unavailable (no compiler?)")


@pytest.mark.quick
def test_pack_padded_matches_fallback():
    rows = [[1, 2, 3], [4], list(range(5, 45)), []]
    for left in (False, True):
        ids_n, mask_n = native.pack_padded(rows, 8, 16, 0, left)
        # Force the fallback by calling the pure-python branch directly.
        lib, native._lib = native._lib, None
        tried = native._tried
        native._tried = True
        try:
            ids_f, mask_f = native.pack_padded(rows, 8, 16, 0, left)
        finally:
            native._lib, native._tried = lib, tried
        np.testing.assert_array_equal(ids_n, ids_f)
        np.testing.assert_array_equal(mask_n, mask_f)
    # Truncation: row longer than L keeps head (right) / tail (left).
    long = [list(range(100))]
    ids_r, _ = native.pack_padded(long, 1, 16, 0, False)
    ids_l, _ = native.pack_padded(long, 1, 16, 0, True)
    assert ids_r[0, 0] == 0 and ids_r[0, 15] == 15
    assert ids_l[0, 0] == 84 and ids_l[0, 15] == 99


def test_trec_parse(tmp_path):
    p = tmp_path / "run.txt"
    with open(p, "w") as f:
        f.write("q1 Q0 docA 1 12.5 tag\n")
        f.write("q1\tQ0\tdocB\t2\t11.25\ttag\n")  # tabs
        f.write("malformed line\n")
        f.write("q2 Q0 docC 1 -3.5 tag\n")
    qids, docids, ranks, scores = native.trec_parse(str(p))
    assert qids == ["q1", "q1", "q2"]
    assert docids == ["docA", "docB", "docC"]
    assert ranks.tolist() == [1, 2, 1]
    assert scores.tolist() == [12.5, 11.25, -3.5]


def test_read_run_uses_native(tmp_path):
    from llmrankers_tpu.data import trec

    p = tmp_path / "run.txt"
    with open(p, "w") as f:
        for q in range(3):
            for d in range(5):
                f.write(f"q{q} Q0 d{d} {d+1} {10-d} x\n")
    groups = trec.read_run(str(p), hits=3)
    assert len(groups) == 3 and all(len(g[1]) == 3 for g in groups)
    assert groups[0][1][0] == ("d0", 10.0)


def test_byte_encode_batch_matches_tokenizer():
    import ctypes

    from llmrankers_tpu.engine.tokenizer import ByteTokenizer

    lib = native._load()
    tok = ByteTokenizer()
    texts = ["hello world", "tëst ☃", "", "x" * 40]
    blob = b"".join(t.encode("utf-8") for t in texts)
    offs = np.zeros(len(texts) + 1, np.int64)
    np.cumsum([len(t.encode("utf-8")) for t in texts], out=offs[1:])
    B, L = 6, 16
    ids = np.empty((B, L), np.int32)
    mask = np.empty((B, L), np.int32)
    buf = (ctypes.c_uint8 * len(blob)).from_buffer_copy(blob)
    lib.byte_encode_batch(
        ctypes.cast(buf, ctypes.POINTER(ctypes.c_uint8)),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(texts), native._as_i32p(ids), native._as_i32p(mask),
        B, L, 1, 0,
    )
    for i, t in enumerate(texts):
        full = tok.encode(t)
        if len(full) > L:
            # C contract: truncate bytes but keep EOS inside the budget.
            want = full[: L - 1] + [tok.eos_id]
        else:
            want = full
        got = [int(x) for x, m in zip(ids[i], mask[i]) if m]
        assert got == want, (t, got, want)
    assert mask[4].sum() == 0  # padding row


def test_jsonl_scan_native_and_fallback(tmp_path):
    """Offset index: ids + byte ranges from the native scanner must match
    the regex fallback, across id key variants / numeric ids / blank
    lines / a corpus_id decoy key / long lines."""
    import json

    from llmrankers_tpu.utils import native

    rows = [
        {"id": "d1", "title": "T", "text": "alpha"},
        {"docid": "d2", "text": "beta " * 5000},  # >16KB line
        {"_id": "d3", "contents": "gamma"},
        {"corpus_id": "decoy", "id": 42, "text": "numeric id"},
        {"text": "id last", "id": "d5"},
        # preference order: "id" wins over "_id"/"docid" regardless of
        # which appears first in the line
        {"_id": "wrong", "docid": "alsowrong", "id": "d6", "text": "x"},
        # nested objects' keys never shadow the top-level row id (the
        # in-memory JsonlDocstore parses JSON, so the offset index must
        # agree or auto-switching stores at 256MB would break lookups)
        {"docid": "d7", "meta": {"id": 3}, "text": "nested id"},
        {"nested": [{"id": "x"}, {"_id": "y"}], "docid": "d8", "text": "arr"},
        {"text": 'a string containing "id": fake', "id": "d9"},
    ]
    p = tmp_path / "c.jsonl"
    with open(p, "w") as f:
        f.write("\n")  # leading blank line
        for r in rows:
            f.write(json.dumps(r) + "\n\n")

    def fallback(path):
        lib, native._lib, native._tried = native._lib, None, True
        try:
            return native.jsonl_scan(path)
        finally:
            native._lib, native._tried = lib, lib is not None

    ids_f, off_f, len_f = fallback(str(p))
    assert ids_f == ["d1", "d2", "d3", "42", "d5", "d6", "d7", "d8", "d9"]
    # byte ranges parse back to the right row
    with open(p, "rb") as f:
        for i, r in enumerate(rows):
            f.seek(off_f[i])
            assert json.loads(f.read(len_f[i])) == r
    if native.available():
        ids_n, off_n, len_n = native.jsonl_scan(str(p))
        assert ids_n == ids_f
        assert list(off_n) == list(off_f) and list(len_n) == list(len_f)


def test_indexed_jsonl_docstore(tmp_path):
    import json

    from llmrankers_tpu.data import docstore as ds_mod

    p = tmp_path / "c.jsonl"
    with open(p, "w") as f:
        f.write(json.dumps({"id": "a", "title": "Ti", "text": "body"}) + "\n")
        f.write(json.dumps({"docid": "b", "contents": "other"}) + "\n")
    lazy = ds_mod.IndexedJsonlDocstore(str(p))
    mem = ds_mod.JsonlDocstore(str(p))
    for d in ("a", "b"):
        assert lazy.get_text(d) == mem.get_text(d)
    assert len(lazy) == 2
    # auto selection: tiny file -> in-memory; lazy=True forces the index
    assert isinstance(ds_mod.open_jsonl_docstore(str(p)), ds_mod.JsonlDocstore)
    assert isinstance(
        ds_mod.open_jsonl_docstore(str(p), lazy=True),
        ds_mod.IndexedJsonlDocstore,
    )
