// Fuzz harness: Ryu fast path vs snprintf-probing oracle, byte parity.
//
// The oracle (probe_digits) was itself fuzzed against CPython repr /
// json.dumps (tests/test_fast_jsonl.py), so agreement here transfers
// that parity to the Ryu path at C++ speed (~400ns/value -> 1e8+ values
// in minutes, far beyond what a Python-level oracle could cover).
//
// Build + run (from the repo root):
//   g++ -O2 -std=c++17 -o /tmp/fuzz_ryu scripts/fuzz_ryu.cpp -lz -lpthread
//   /tmp/fuzz_ryu 100000000
#include "../multi_spatialmllm_tpu/ingest/native/src/jsonl_emit.cpp"

#include <cmath>
#include <random>

static long fails = 0;

static void check(double v) {
  char a[64], b[64];
  int la = msm_format_double(v, a);
  int lb = msm_format_double_slow(v, b);
  a[la] = b[lb] = 0;
  if (la != lb || memcmp(a, b, la) != 0) {
    uint64_t bits;
    memcpy(&bits, &v, 8);
    printf("MISMATCH bits=%016llx ryu=%s probe=%s\n",
           (unsigned long long)bits, a, b);
    if (++fails > 20) exit(1);
  }
}

int main(int argc, char** argv) {
  long n_random = argc > 1 ? atol(argv[1]) : 10000000;

  // Structured families first -------------------------------------
  // 1. All powers of two (incl. subnormal ulps) and their neighbors.
  for (int e = -1074; e <= 1023; ++e) {
    double p = ldexp(1.0, e);
    check(p);
    check(nextafter(p, 0.0));
    check(nextafter(p, INFINITY));
    check(-p);
  }
  // 2. Powers of ten and neighbors (exercise the repr notation edges
  //    at 1e-5/1e-4 and 1e15/1e16 plus table boundaries).
  for (int e = -308; e <= 308; ++e) {
    double p = pow(10.0, e);
    check(p);
    check(nextafter(p, 0.0));
    check(nextafter(p, INFINITY));
  }
  // 3. Engine-like terminating decimals i/10^j (tie-rich: exact
  //    decimal halves stress round-half-even).
  for (long i = 1; i <= 2000000; ++i) {
    check((double)i / 10.0);
    check((double)i / 100.0);
    check((double)i / 1000.0);
    check((double)i * 0.5);
    check((double)i * 0.25);
  }
  // 4. Smallest/largest magnitudes.
  check(5e-324);
  check(4.9406564584124654e-324);
  check(2.2250738585072014e-308);  // smallest normal
  check(2.2250738585072009e-308);  // largest subnormal
  check(1.7976931348623157e308);
  check(0.1); check(0.2); check(0.3); check(1.0 / 3.0); check(2.0 / 3.0);
  printf("structured families ok\n");

  // Random bit patterns -------------------------------------------
  std::mt19937_64 rng(20260819);
  for (long i = 0; i < n_random; ++i) {
    uint64_t bits = rng();
    double v;
    memcpy(&v, &bits, 8);
    if (v != v || v == HUGE_VAL || v == -HUGE_VAL) continue;
    check(v);
    if ((i & 0xFFFFFF) == 0xFFFFFF)
      printf("  %ldM random ok\n", (i + 1) / 1000000);
  }
  // Random small-exponent reals (the engines' actual regime).
  std::uniform_real_distribution<double> ud(-1e6, 1e6);
  for (long i = 0; i < n_random / 4; ++i) check(ud(rng));

  if (fails == 0) printf("fuzz_ryu: ALL OK\n");
  return fails != 0;
}
