// Columnar JSONL emitter: a tiny per-row template VM.
//
// The QA engines' host-side cost is assembling per-sample JSON records
// (dict building + string formatting + json.dumps in Python, ~40us/row).
// This emitter executes a compiled "program" per row over columnar inputs
// and writes the byte stream directly, at ~1-2us/row single-threaded.
//
// Program encoding: flat int32 array of (opcode, a, b) triples.
//   OP_LIT  (0): append literals[a]                     (pre-JSON-escaped)
//   OP_STR  (1): append string_table[str_indices[a*n + row]]  (pre-escaped)
//   OP_INT  (2): append decimal of int_cols[a*n + row]
//   OP_FLT  (3): append shortest-ish float of float_cols[a*n + row]
//   OP_SEL  (4): sel = int_cols[a*n + row]; run subprogram
//                (sub_offsets[b + sel], sub_lengths[b + sel])   [recurses]
// The main program is (main_offset, main_length) in the same array.
// Rows are emitted in row_order (shuffle permutation), one line each.

#include <atomic>
#include <cinttypes>
#include <thread>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

enum Op { OP_LIT = 0, OP_STR = 1, OP_INT = 2, OP_FLT = 3, OP_SEL = 4 };

// True iff D significant digits round-trip v through decimal.
inline bool roundtrips(double v, int D, char* buf, size_t cap) {
  snprintf(buf, cap, "%.*e", D - 1, v);
  return strtod(buf, nullptr) == v;
}

// Format v exactly as CPython repr(float) / json.dumps: the shortest
// decimal digit string that round-trips, fixed notation when the decimal
// point lands in (-4, 16], else exponential with a signed >=2-digit
// exponent. Returns the length written to out (capacity >= 40).
int format_double_pyrepr(double v, char* out) {
  if (v != v) return snprintf(out, 8, "NaN");            // json.dumps spelling
  if (v > 1.7976931348623157e308) return snprintf(out, 12, "Infinity");
  if (v < -1.7976931348623157e308) return snprintf(out, 12, "-Infinity");

  // Integral fast path: every exact integral double in (-1e16, 1e16)
  // reprs as "<int>.0" (fixed notation reconstructs the integer from the
  // shortest digit string by zero-padding, so the strings coincide).
  if (v > -1e16 && v < 1e16 && v == (double)(int64_t)v) {
    int64_t iv = (int64_t)v;
    if (iv == 0) {
      const char* z = (1.0 / v < 0) ? "-0.0" : "0.0";  // signed zero
      size_t n = strlen(z);
      memcpy(out, z, n);
      return (int)n;
    }
    int len = snprintf(out, 24, "%" PRId64, iv);
    out[len++] = '.';
    out[len++] = '0';
    return len;
  }

  // Shortest round-trip digit count D. Real-valued engine data almost
  // always needs 16-17 digits, so probe downward from 17 (free) and fall
  // back to binary search for the rare short values.
  char ebuf[40];
  int D = 17;
  if (roundtrips(v, 16, ebuf, sizeof(ebuf))) {
    if (roundtrips(v, 15, ebuf, sizeof(ebuf))) {
      int lo = 1, hi = 14;
      D = 15;
      while (lo <= hi) {  // monotone: if D digits round-trip, D+1 do too
        int mid = (lo + hi) / 2;
        if (roundtrips(v, mid, ebuf, sizeof(ebuf))) {
          D = mid;
          hi = mid - 1;
        } else {
          lo = mid + 1;
        }
      }
    } else {
      D = 16;
    }
  }
  snprintf(ebuf, sizeof(ebuf), "%.*e", D - 1, v);

  // Parse [-]d[.ddd]e(+|-)XX into sign + digit string + exponent.
  const char* s = ebuf;
  bool neg = (*s == '-');
  if (neg) ++s;
  char digits[20];
  int ndig = 0;
  digits[ndig++] = *s++;
  if (*s == '.') {
    ++s;
    while (*s != 'e' && *s != 'E') digits[ndig++] = *s++;
  }
  int exp10 = atoi(strchr(s, 'e') ? strchr(s, 'e') + 1 : s + 1);
  while (ndig > 1 && digits[ndig - 1] == '0') --ndig;  // shortest digits

  char* w = out;
  if (neg) *w++ = '-';
  if (exp10 >= -4 && exp10 <= 15) {  // fixed: CPython threshold
    int dp = exp10 + 1;  // decimal point position in the digit string
    if (dp <= 0) {
      *w++ = '0'; *w++ = '.';
      for (int i = 0; i < -dp; ++i) *w++ = '0';
      memcpy(w, digits, ndig); w += ndig;
    } else if (dp >= ndig) {
      memcpy(w, digits, ndig); w += ndig;
      for (int i = 0; i < dp - ndig; ++i) *w++ = '0';
      *w++ = '.'; *w++ = '0';
    } else {
      memcpy(w, digits, dp); w += dp;
      *w++ = '.';
      memcpy(w, digits + dp, ndig - dp); w += ndig - dp;
    }
  } else {  // exponential: 1.5e-05 / 1e+16 style
    *w++ = digits[0];
    if (ndig > 1) {
      *w++ = '.';
      memcpy(w, digits + 1, ndig - 1); w += ndig - 1;
    }
    *w++ = 'e';
    *w++ = exp10 < 0 ? '-' : '+';
    int ae = exp10 < 0 ? -exp10 : exp10;
    char eb[8];
    int el = snprintf(eb, sizeof(eb), "%02d", ae);
    memcpy(w, eb, el); w += el;
  }
  return (int)(w - out);
}

struct Ctx {
  const char* const* literals;
  const char* const* string_table;
  const int64_t* str_indices;
  const int64_t* int_cols;
  const double* float_cols;
  const int32_t* program;
  const int64_t* sub_offsets;
  const int64_t* sub_lengths;
  int64_t n_rows;
};

void run(const Ctx& ctx, int64_t offset, int64_t length, int64_t row,
         std::string* out) {
  const int32_t* ops = ctx.program + offset * 3;
  for (int64_t i = 0; i < length; ++i) {
    int32_t op = ops[i * 3], a = ops[i * 3 + 1], b = ops[i * 3 + 2];
    switch (op) {
      case OP_LIT:
        out->append(ctx.literals[a]);
        break;
      case OP_STR:
        out->append(
            ctx.string_table[ctx.str_indices[(int64_t)a * ctx.n_rows + row]]);
        break;
      case OP_INT: {
        char buf[24];
        int len = snprintf(buf, sizeof(buf), "%" PRId64,
                           ctx.int_cols[(int64_t)a * ctx.n_rows + row]);
        out->append(buf, len);
        break;
      }
      case OP_FLT: {
        char buf[40];
        double v = ctx.float_cols[(int64_t)a * ctx.n_rows + row];
        int len = format_double_pyrepr(v, buf);
        out->append(buf, len);
        break;
      }
      case OP_SEL: {
        int64_t sel = ctx.int_cols[(int64_t)a * ctx.n_rows + row];
        run(ctx, ctx.sub_offsets[b + sel], ctx.sub_lengths[b + sel], row,
            out);
        break;
      }
      default:
        break;
    }
  }
}

}  // namespace

// Multithreaded emitter: rows render in parallel (they are independent),
// output bytes stay in row_order (each thread fills one slice of a wave;
// waves are written sequentially), so the file is byte-identical to the
// single-threaded path for any thread count. Waves bound buffering to
// n_threads * wave_rows lines.
extern "C" int msm_emit_jsonl_mt(
    const char* out_path, int64_t n_rows, int64_t n_out,
    const char* const* literals,
    const char* const* string_table, const int64_t* str_indices,
    const int64_t* int_cols, const double* float_cols,
    const int32_t* program, const int64_t* sub_offsets,
    const int64_t* sub_lengths, int64_t main_offset, int64_t main_length,
    const int64_t* row_order, int32_t n_threads) {
  if (n_threads < 1) n_threads = 1;
  FILE* f = fopen(out_path, "wb");
  if (!f) return -1;
  std::vector<char> iobuf(1 << 20);
  setvbuf(f, iobuf.data(), _IOFBF, iobuf.size());

  Ctx ctx{literals,  string_table, str_indices, int_cols,
          float_cols, program,     sub_offsets, sub_lengths, n_rows};
  const int64_t slice = 8192;  // rows per thread per wave
  const int64_t wave = slice * n_threads;
  std::vector<std::string> bufs(n_threads);
  std::atomic<int> bad{0};

  for (int64_t lo = 0; lo < n_out; lo += wave) {
    int64_t hi = lo + wave < n_out ? lo + wave : n_out;
    auto render = [&](int t) {
      int64_t a = lo + (int64_t)t * slice;
      int64_t b = a + slice < hi ? a + slice : hi;
      std::string& out = bufs[t];
      out.clear();
      for (int64_t i = a; i < b; ++i) {
        int64_t row = row_order ? row_order[i] : i;
        if (row < 0 || row >= n_rows) {
          bad.store(1);
          return;
        }
        run(ctx, main_offset, main_length, row, &out);
        out.push_back('\n');
      }
    };
    if (n_threads == 1) {
      render(0);
    } else {
      std::vector<std::thread> threads;
      for (int t = 0; t < n_threads; ++t) threads.emplace_back(render, t);
      for (auto& th : threads) th.join();
    }
    if (bad.load()) {
      fclose(f);
      return -3;
    }
    for (int t = 0; t < n_threads; ++t) {
      if (!bufs[t].empty() &&
          fwrite(bufs[t].data(), 1, bufs[t].size(), f) != bufs[t].size()) {
        fclose(f);
        return -2;
      }
    }
  }
  fclose(f);
  return 0;
}

// n_rows: column stride (rows in the column arrays).
// n_out: number of lines to write; row_order (length n_out, may be a
// subsampled permutation) selects which rows, identity when null.
extern "C" int msm_emit_jsonl(
    const char* out_path, int64_t n_rows, int64_t n_out,
    const char* const* literals,
    const char* const* string_table, const int64_t* str_indices,
    const int64_t* int_cols, const double* float_cols,
    const int32_t* program, const int64_t* sub_offsets,
    const int64_t* sub_lengths, int64_t main_offset, int64_t main_length,
    const int64_t* row_order) {
  FILE* f = fopen(out_path, "wb");
  if (!f) return -1;
  std::vector<char> iobuf(1 << 20);
  setvbuf(f, iobuf.data(), _IOFBF, iobuf.size());

  Ctx ctx{literals,  string_table, str_indices, int_cols,
          float_cols, program,     sub_offsets, sub_lengths, n_rows};
  std::string line;
  line.reserve(4096);
  for (int64_t i = 0; i < n_out; ++i) {
    int64_t row = row_order ? row_order[i] : i;
    if (row < 0 || row >= n_rows) {
      fclose(f);
      return -3;
    }
    line.clear();
    run(ctx, main_offset, main_length, row, &line);
    line.push_back('\n');
    if (fwrite(line.data(), 1, line.size(), f) != line.size()) {
      fclose(f);
      return -2;
    }
  }
  fclose(f);
  return 0;
}
