// Native host-side data runtime for bsarec_tpu.
//
// The TPU device pipeline is pure XLA/Pallas; this library accelerates the
// *host* side of the input pipeline, which matters because training hosts
// often give one CPU core per accelerator. Python/numpy costs on Amazon
// Beauty (22k users / 198k interactions, 1-core host): corpus parse 1.9 s,
// per-epoch DuoRec same-target resample 1.1 s (vs ~1 s of device time per
// epoch!), eval seen-bitmask build 1.8 s. These routines bring each to
// milliseconds.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 dependency);
// built on demand by bsarec_tpu/native/__init__.py with `g++ -O3 -shared`.
// Every routine is deterministic; the resampler uses splitmix64 streams so
// results are reproducible across platforms (unlike numpy Generator state).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// corpus parsing: "user item item ..." lines -> CSR (offsets, items)
// ---------------------------------------------------------------------------

// Pass 1: count users and total items. Returns 0 on success, 2 on a
// malformed (non-digit) token — callers then fall back to the Python
// loader, which raises a proper ValueError. A line counts as a user iff
// it contains at least one token (same rule as corpus_fill).
int corpus_count(const char* path, int64_t* n_users, int64_t* n_items) {
  FILE* fh = fopen(path, "rb");
  if (!fh) return 1;
  int64_t users = 0, items = 0;
  int c;
  bool in_tok = false, first_tok = true, line_has_content = false;
  while (true) {
    c = fgetc(fh);
    bool is_sep = (c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == EOF);
    if (!is_sep) {
      if (c < '0' || c > '9') {
        fclose(fh);
        return 2;  // malformed token
      }
      in_tok = true;
      line_has_content = true;
    } else if (in_tok) {
      if (!first_tok) items++;
      else first_tok = false;
      in_tok = false;
    }
    if (c == '\n' || c == EOF) {
      if (line_has_content) users++;
      line_has_content = false;
      first_tok = true;
      if (c == EOF) break;
    }
  }
  fclose(fh);
  *n_users = users;
  *n_items = items;
  return 0;
}

// Pass 2: fill offsets[n_users + 1] and items[n_items]; returns max item
// id via out-param (2 on malformed input, matching corpus_count).
int corpus_fill(const char* path, int32_t* offsets, int32_t* items,
                int32_t* max_item) {
  FILE* fh = fopen(path, "rb");
  if (!fh) return 1;
  int64_t user = 0, pos = 0;
  int32_t maxi = 0;
  offsets[0] = 0;
  int c;
  long cur = -1;  // -1: between tokens
  bool first_tok = true, line_has_content = false;
  while (true) {
    c = fgetc(fh);
    bool is_sep = (c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == EOF);
    if (!is_sep) {
      if (c < '0' || c > '9') {
        fclose(fh);
        return 2;  // malformed token
      }
      if (cur < 0) cur = 0;
      cur = cur * 10 + (c - '0');
      line_has_content = true;
    } else if (cur >= 0) {
      if (first_tok) {
        first_tok = false;  // user id column, discarded (row index = user)
      } else {
        items[pos++] = (int32_t)cur;
        if (cur > maxi) maxi = (int32_t)cur;
      }
      cur = -1;
    }
    if (c == '\n' || c == EOF) {
      if (line_has_content) {
        offsets[++user] = (int32_t)pos;
        line_has_content = false;
        first_tok = true;
      }
      if (c == EOF) break;
    }
  }
  fclose(fh);
  *max_item = maxi;
  return 0;
}

// ---------------------------------------------------------------------------
// training-split construction (reference semantics, src/dataset.py:18-23,
// 61-117): per user take seq[-(L+2):-2]; one training row per element i
// with input = left-padded items[:i], answer = items[i].
// ---------------------------------------------------------------------------

int64_t prefix_rows(const int32_t* offsets, int64_t n_users, int32_t max_len) {
  int64_t total = 0;
  for (int64_t u = 0; u < n_users; ++u) {
    int64_t len = offsets[u + 1] - offsets[u];
    if (len > 2) {
      int64_t t = len - 2;
      total += t < max_len ? t : max_len;
    }
  }
  return total;
}

void prefix_expand(const int32_t* offsets, const int32_t* items,
                   int64_t n_users, int32_t max_len, int32_t* inputs,
                   int32_t* answers, int32_t* users) {
  int64_t row = 0;
  for (int64_t u = 0; u < n_users; ++u) {
    int64_t lo = offsets[u], hi = offsets[u + 1];
    int64_t len = hi - lo;
    if (len <= 2) continue;
    int64_t take = len - 2 < max_len ? len - 2 : max_len;
    const int32_t* sub = items + (hi - 2 - take);  // seq[-(L+2):-2]
    for (int64_t i = 0; i < take; ++i) {
      int32_t* out = inputs + row * max_len;
      memset(out, 0, sizeof(int32_t) * (max_len - i));
      for (int64_t j = 0; j < i; ++j) out[max_len - i + j] = sub[j];
      answers[row] = sub[i];
      users[row] = (int32_t)u;
      ++row;
    }
  }
}

// eval split: inputs = left-padded seq[:-drop][-L:], answer = seq[-drop],
// seen = 0-padded seq[:-drop] (src/dataset.py:96-111 semantics).
void eval_split(const int32_t* offsets, const int32_t* items, int64_t n_users,
                int32_t max_len, int32_t drop, int32_t seen_width,
                int32_t* inputs, int32_t* answers, int32_t* seen) {
  for (int64_t u = 0; u < n_users; ++u) {
    int64_t lo = offsets[u], hi = offsets[u + 1];
    int64_t len = hi - lo;
    int32_t* in_row = inputs + u * max_len;
    int32_t* seen_row = seen + u * seen_width;
    memset(in_row, 0, sizeof(int32_t) * max_len);
    memset(seen_row, 0, sizeof(int32_t) * seen_width);
    if (len < drop + 1) {
      answers[u] = 0;
      continue;
    }
    int64_t hist = len - drop;
    answers[u] = items[lo + hist];
    int64_t take = hist < max_len ? hist : max_len;
    for (int64_t j = 0; j < take; ++j)
      in_row[max_len - take + j] = items[lo + hist - take + j];
    for (int64_t j = 0; j < hist && j < seen_width; ++j)
      seen_row[j] = items[lo + j];
  }
}

// ---------------------------------------------------------------------------
// seen bitmask, bit-plane-per-tile layout (ops/pallas_rank.py):
// item v -> word (v / TILE) * W + (v % TILE) % W, bit (v % TILE) / W
// ---------------------------------------------------------------------------

// `id_offset` shifts ids into shard-local coordinates (vocab-sharded
// tables: shard s covers global ids [offset, offset + vocab)); ids
// falling outside [1, vocab) after the shift are skipped. `mask_item0`
// sets local item 0's bit unconditionally — wanted only on the shard
// owning the global padding item (reference zeroes column 0 for every
// user, src/trainers.py:134).
void seen_bitmask(const int32_t* seen, int64_t n_rows, int64_t n_cols,
                  int64_t vocab, int32_t tile_cols, uint32_t* out,
                  int64_t out_words, int64_t id_offset, int32_t mask_item0) {
  int64_t w = tile_cols / 32;
  memset(out, 0, sizeof(uint32_t) * n_rows * out_words);
  for (int64_t r = 0; r < n_rows; ++r) {
    uint32_t* row = out + r * out_words;
    if (mask_item0) row[0] |= 1u;  // padding item 0
    const int32_t* ids = seen + r * n_cols;
    for (int64_t c = 0; c < n_cols; ++c) {
      int64_t v = (int64_t)ids[c] - id_offset;
      if (ids[c] <= 0 || v < 0 || v >= vocab) continue;
      int64_t u = v % tile_cols;
      row[(v / tile_cols) * w + u % w] |= 1u << (u / w);
    }
  }
}

// ---------------------------------------------------------------------------
// per-epoch same-target resample (DuoRec/FEARec semantic augmentation,
// src/dataset.py:83-106): for each train row, pick a random *other* row
// sharing its answer; retry while the pick is an identical sequence and
// the group offers diversity. splitmix64 keyed on (seed, row, attempt).
// ---------------------------------------------------------------------------

static inline uint64_t splitmix64(uint64_t x) {
  x += 0x9E3779B97F4A7C15ull;
  x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ull;
  x = (x ^ (x >> 27)) * 0x94D049BB133111EBull;
  return x ^ (x >> 31);
}

void same_target_pick(const int32_t* order, const int32_t* group_start,
                      const int32_t* group_size, const uint8_t* diverse,
                      const int64_t* row_hash, int64_t n_rows, uint64_t seed,
                      int32_t* pick) {
  for (int64_t i = 0; i < n_rows; ++i) {
    int32_t start = group_start[i];
    int32_t size = group_size[i] > 0 ? group_size[i] : 1;
    int32_t p = order[start + (int32_t)(splitmix64(seed ^ (uint64_t)i) % size)];
    if (diverse[i]) {
      for (int attempt = 1; attempt < 9 && row_hash[p] == row_hash[i];
           ++attempt) {
        uint64_t r = splitmix64(seed ^ (uint64_t)i ^ ((uint64_t)attempt << 48));
        p = order[start + (int32_t)(r % size)];
      }
    }
    pick[i] = p;
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// PREPRec `<ds>_intwtime.csv` parsing: "user,item,t1,t2[,timestamp]" rows.
// Reference loader semantics (`repo-b/data.py:14-43`, reproduced in
// bsarec_tpu/preprec/data.py:load_intwtime): user/item shift to 1-based,
// t1/t2 are ints, the optional 5th field is `int(float(x))` — i.e. the
// integer part, truncated toward zero — and rows keep file order per user.
// ---------------------------------------------------------------------------

namespace {

// Parses one signed integer field, optionally skipping a ".fraction" tail
// (allow_frac mirrors Python's int(float(x)) truncation toward zero).
// Returns 0 ok / 2 malformed; advances *pp past the field (not the sep).
inline int parse_field(const char** pp, const char* end, bool allow_frac,
                       int64_t* out) {
  const char* p = *pp;
  bool neg = false;
  if (p < end && (*p == '-' || *p == '+')) neg = (*p++ == '-');
  if (p >= end || *p < '0' || *p > '9') return 2;
  int64_t v = 0;
  while (p < end && *p >= '0' && *p <= '9') v = v * 10 + (*p++ - '0');
  if (allow_frac && p < end && *p == '.') {
    ++p;
    while (p < end && *p >= '0' && *p <= '9') ++p;
  }
  *out = neg ? -v : v;
  *pp = p;
  return 0;
}

// Shared line-walker: calls emit(row_index, u1, i1, t1, t2, te) per row.
template <typename Emit>
int intwtime_walk(const char* path, int64_t* n_rows, int64_t* max_user1,
                  int64_t* max_item1, Emit emit) {
  FILE* fh = fopen(path, "rb");
  if (!fh) return 1;
  fseek(fh, 0, SEEK_END);
  long size = ftell(fh);
  fseek(fh, 0, SEEK_SET);
  char* buf = (char*)malloc(size + 1);
  if (!buf) { fclose(fh); return 1; }
  if ((long)fread(buf, 1, size, fh) != size) { free(buf); fclose(fh); return 1; }
  fclose(fh);
  const char* p = buf;
  const char* end = buf + size;
  int64_t rows = 0, mu = 0, mi = 0;
  while (p < end) {
    const char* eol = (const char*)memchr(p, '\n', end - p);
    const char* le = eol ? eol : end;
    while (le > p && (le[-1] == '\r' || le[-1] == ' ')) --le;  // rstrip
    // blank lines are malformed: the Python loader raises int('') on
    // them, so accepting here would diverge from the fallback.
    {
      int64_t f[5] = {0, 0, 0, 0, 0};
      int nf = 0;
      bool bad = (le <= p);
      const char* q = p;
      while (!bad && nf < 5) {
        if (parse_field(&q, le, nf == 4, &f[nf])) { bad = true; break; }
        ++nf;
        if (q >= le) break;        // line fully consumed
        if (*q != ',') { bad = true; break; }  // junk this parser can't
        ++q;                       // mirror (e.g. 1e3): Python fallback
        if (nf == 5) break;        // extra fields ignored (parts[5:])
      }
      if (bad || nf < 4) { free(buf); return 2; }
      int64_t u1 = f[0] + 1, i1 = f[1] + 1;
      // columns are materialized as int32 (matching the np.int32 arrays
      // the Python loader fills, which raise OverflowError rather than
      // wrap) — out-of-range values defer to the fallback's loud error
      for (int k = 0; k < 5; ++k)
        if (f[k] > INT32_MAX - 1 || f[k] < INT32_MIN) { free(buf); return 2; }
      if (u1 > mu) mu = u1;
      if (i1 > mi) mi = i1;
      if (!emit(rows, u1, i1, f[2], f[3], nf > 4 ? f[4] : 0)) {
        free(buf); return 3;       // caller's capacity exceeded
      }
      ++rows;
    }
    p = eol ? eol + 1 : end;
  }
  free(buf);
  *n_rows = rows;
  *max_user1 = mu;
  *max_item1 = mi;
  return 0;
}

}  // namespace

extern "C" {

// Pass 1: row count and 1-based max user/item ids. 0 ok / 1 io / 2 malformed
// (callers fall back to the Python loader for a proper exception).
int intwtime_count(const char* path, int64_t* n_rows, int64_t* max_user1,
                   int64_t* max_item1) {
  return intwtime_walk(
      path, n_rows, max_user1, max_item1,
      [](int64_t, int64_t, int64_t, int64_t, int64_t, int64_t) { return true; });
}

// Pass 2: fill the five [capacity] int32 columns (file order preserved).
// `capacity` is pass 1's row count; if the file grew between the passes
// the walk stops at the buffer bound and returns 3 (callers fall back).
int intwtime_fill(const char* path, int64_t capacity, int32_t* users,
                  int32_t* items, int32_t* t1, int32_t* t2, int32_t* te) {
  int64_t r, mu, mi;
  int rc = intwtime_walk(
      path, &r, &mu, &mi,
      [&](int64_t row, int64_t u1, int64_t i1, int64_t a, int64_t b, int64_t t) {
        if (row >= capacity) return false;
        users[row] = (int32_t)u1;
        items[row] = (int32_t)i1;
        t1[row] = (int32_t)a;
        t2[row] = (int32_t)b;
        te[row] = (int32_t)t;
        return true;
      });
  if (rc == 0 && r != capacity) return 3;  // file shrank between passes
  return rc;
}

}  // extern "C"
