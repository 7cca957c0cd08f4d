// Native host-side data path for llmrankers_tpu.
//
// The reference has no first-party native code (SURVEY.md §2.4) — its host
// path is HF tokenizers + torch DataLoader workers. Here the per-wave host
// hot loops live in C++ behind a ctypes interface:
//   * pack_padded      — scatter a concatenated token stream into padded
//                        [B, L] id/mask buffers (right or left padding),
//                        the inner loop of every engine batch;
//   * byte_encode_batch— byte-level tokenization (the offline tokenizer)
//                        straight into the padded buffers, skipping the
//                        per-token Python loop entirely;
//   * trec_count / trec_parse — single-pass TREC run-file parser returning
//                        columnar qid/docid offsets + scores.
//
// Build: `make -C native` -> native/libhostops.so. Python side:
// llmrankers_tpu/utils/native.py (falls back to numpy when absent).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cctype>
#include <cstring>

extern "C" {

// rows: concatenated token ids; offsets: n+1 row boundaries.
// out_ids/out_mask: [B, L] row-major, preallocated. Rows are truncated to
// L (head-truncate when left_pad, matching the engine's behavior).
void pack_padded(const int32_t* rows, const int64_t* offsets, int64_t n,
                 int32_t* out_ids, int32_t* out_mask, int64_t B, int64_t L,
                 int32_t pad_id, int left_pad) {
  for (int64_t b = 0; b < B; ++b) {
    int32_t* ids = out_ids + b * L;
    int32_t* mask = out_mask + b * L;
    for (int64_t j = 0; j < L; ++j) { ids[j] = pad_id; mask[j] = 0; }
    if (b >= n) continue;
    int64_t lo = offsets[b], hi = offsets[b + 1];
    int64_t len = hi - lo;
    if (len > L) {
      if (left_pad) lo = hi - L;  // keep the tail (prompt end)
      len = L;
    }
    int64_t start = left_pad ? (L - len) : 0;
    for (int64_t j = 0; j < len; ++j) {
      ids[start + j] = rows[lo + j];
      mask[start + j] = 1;
    }
  }
}

// Byte-level tokenizer (ids = byte + 2; 0 = pad, 1 = eos), fused with
// padding. texts: concatenated utf-8 bytes; toffsets: n+1 boundaries.
void byte_encode_batch(const uint8_t* texts, const int64_t* toffsets,
                       int64_t n, int32_t* out_ids, int32_t* out_mask,
                       int64_t B, int64_t L, int add_eos, int left_pad) {
  for (int64_t b = 0; b < B; ++b) {
    int32_t* ids = out_ids + b * L;
    int32_t* mask = out_mask + b * L;
    for (int64_t j = 0; j < L; ++j) { ids[j] = 0; mask[j] = 0; }
    if (b >= n) continue;
    int64_t lo = toffsets[b], hi = toffsets[b + 1];
    int64_t len = (hi - lo) + (add_eos ? 1 : 0);
    int64_t drop = 0;
    if (len > L) { drop = len - L; len = L; }
    int64_t start = left_pad ? (L - len) : 0;
    int64_t nbytes = (hi - lo) - drop;
    if (left_pad && drop > 0) lo += drop;  // keep the tail
    for (int64_t j = 0; j < nbytes; ++j) {
      ids[start + j] = (int32_t)texts[lo + j] + 2;
      mask[start + j] = 1;
    }
    if (add_eos && start + nbytes < L) {
      ids[start + nbytes] = 1;
      mask[start + nbytes] = 1;
    }
  }
}

// Pass 1: count valid rows in a TREC run file.
int64_t trec_count(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int64_t count = 0;
  char line[1 << 16];
  while (fgets(line, sizeof line, f)) {
    int fields = 0, in_tok = 0;
    for (char* p = line; *p; ++p) {
      if (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r') in_tok = 0;
      else if (!in_tok) { in_tok = 1; ++fields; }
    }
    if (fields >= 6) ++count;
  }
  fclose(f);
  return count;
}

// Pass 2: parse into columnar buffers. qid/docid strings are written into
// strbuf, NUL-separated; qid_off/docid_off index their starts.
// Returns rows parsed, or -1 on IO error / -2 if strbuf too small.
int64_t trec_parse(const char* path, int64_t max_rows,
                   char* strbuf, int64_t strbuf_cap,
                   int64_t* qid_off, int64_t* docid_off,
                   int32_t* ranks, double* scores) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char line[1 << 16];
  int64_t row = 0, pos = 0;
  while (row < max_rows && fgets(line, sizeof line, f)) {
    char* toks[8];
    int nt = 0;
    char* save = nullptr;
    for (char* t = strtok_r(line, " \t\r\n", &save);
         t && nt < 8; t = strtok_r(nullptr, " \t\r\n", &save))
      toks[nt++] = t;
    if (nt < 6) continue;
    int64_t ql = (int64_t)strlen(toks[0]), dl = (int64_t)strlen(toks[2]);
    if (pos + ql + dl + 2 > strbuf_cap) { fclose(f); return -2; }
    qid_off[row] = pos;
    memcpy(strbuf + pos, toks[0], ql + 1);
    pos += ql + 1;
    docid_off[row] = pos;
    memcpy(strbuf + pos, toks[2], dl + 1);
    pos += dl + 1;
    ranks[row] = (int32_t)atoi(toks[3]);
    scores[row] = atof(toks[4]);
    ++row;
  }
  fclose(f);
  return row;
}

// Pass 1: count non-empty lines in a JSONL file.
int64_t jsonl_count(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int64_t count = 0;
  char* line = nullptr;
  size_t cap = 0;
  ssize_t nread;
  while ((nread = getline(&line, &cap, f)) != -1) {
    for (ssize_t i = 0; i < nread; ++i) {
      if (!isspace((unsigned char)line[i])) { ++count; break; }
    }
  }
  free(line);
  fclose(f);
  return count;
}

// Locate the row's document id — the best of the TOP-LEVEL keys
// "id" > "docid" > "_id" — without a full JSON parse. A single pass
// tracks string state and brace/bracket depth, so a nested object's
// key (e.g. {"docid": "d7", "meta": {"id": 3}}) can never shadow the
// row id: only depth-1 keys are candidates, exactly like a JSON parse
// of the top-level object (JsonlDocstore's _row_docid). Returns 1 and
// the id span [out_start, out_start+out_len) on success, else 0.
// Only string and integer id values are supported.
static int find_json_id(const char* line, int64_t len,
                        int64_t* out_start, int64_t* out_len) {
  int64_t i = 0;
  while (i < len && isspace((unsigned char)line[i])) ++i;
  if (i >= len || line[i] != '{') return 0;
  ++i;
  int depth = 1;
  int expect_key = 1;  // at depth 1: next string is a key (not a value)
  int best = 99;       // preference rank of the id found so far (0 best)
  while (i < len && depth > 0) {
    char c = line[i];
    if (c == '"') {
      int64_t s = ++i;  // string body start
      while (i < len && line[i] != '"') i += (line[i] == '\\') ? 2 : 1;
      if (i >= len) break;  // unterminated string
      int64_t slen = i - s;
      ++i;  // past closing quote
      if (depth != 1 || !expect_key) continue;
      int64_t p = i;
      while (p < len && (line[p] == ' ' || line[p] == '\t')) ++p;
      if (p >= len || line[p] != ':') continue;  // value string, not a key
      int rank = 99;
      if (slen == 2 && strncmp(line + s, "id", 2) == 0) rank = 0;
      else if (slen == 5 && strncmp(line + s, "docid", 5) == 0) rank = 1;
      else if (slen == 3 && strncmp(line + s, "_id", 3) == 0) rank = 2;
      if (rank >= best) continue;
      ++p;
      while (p < len && (line[p] == ' ' || line[p] == '\t')) ++p;
      if (p >= len) continue;
      if (line[p] == '"') {  // quoted id (skip escaped quotes)
        int64_t vs = ++p;
        while (p < len && line[p] != '"') p += (line[p] == '\\') ? 2 : 1;
        if (p > len) continue;
        *out_start = vs;
        *out_len = p - vs;
        best = rank;
      } else {  // numeric id
        int64_t vs = p;
        while (p < len &&
               (line[p] == '-' || (line[p] >= '0' && line[p] <= '9')))
          ++p;
        if (p == vs) continue;
        *out_start = vs;
        *out_len = p - vs;
        best = rank;
      }
      if (best == 0) return 1;  // "id" wins outright; stop scanning
      continue;
    }
    if (c == '{' || c == '[') ++depth;
    else if (c == '}' || c == ']') --depth;
    else if (depth == 1 && c == ':') expect_key = 0;
    else if (depth == 1 && c == ',') expect_key = 1;
    ++i;
  }
  return best < 99;
}

// Pass 2: per non-empty line record (byte offset, byte length) and the
// document id — the first key among "id", "docid", "_id" (the
// JsonlDocstore preference order) — located WITHOUT a JSON parse. ids are
// written NUL-separated into idbuf; id_off indexes their starts.
// Returns rows, -1 on IO error, -2 idbuf too small, -3 id missing.
int64_t jsonl_scan(const char* path, int64_t max_rows,
                   int64_t* line_off, int64_t* line_len,
                   char* idbuf, int64_t idbuf_cap, int64_t* id_off) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char* line = nullptr;
  size_t cap = 0;
  ssize_t nread;
  int64_t row = 0, off = 0, pos = 0;
  while (row < max_rows && (nread = getline(&line, &cap, f)) != -1) {
    int blank = 1;
    for (ssize_t i = 0; i < nread; ++i) {
      if (!isspace((unsigned char)line[i])) { blank = 0; break; }
    }
    if (!blank) {
      int64_t s = 0, l = 0;
      int found = find_json_id(line, nread, &s, &l);
      if (!found) { free(line); fclose(f); return -3; }
      if (pos + l + 1 > idbuf_cap) { free(line); fclose(f); return -2; }
      line_off[row] = off;
      line_len[row] = (int64_t)nread;
      id_off[row] = pos;
      memcpy(idbuf + pos, line + s, (size_t)l);
      idbuf[pos + l] = '\0';
      pos += l + 1;
      ++row;
    }
    off += (int64_t)nread;
  }
  free(line);
  fclose(f);
  return row;
}

}  // extern "C"
