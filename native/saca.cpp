// Linear-time suffix array construction (SA-IS) over an integer alphabet.
//
// Framework role: fast host-side eBWT construction for read collections
// (the reference delegates this to external builders like BCR_LCP_GSA,
// README.md:38; we ship it natively so the pipeline is self-contained and
// benchmarkable at C. elegans scale).
//
// Contract: T[0..n-1] with values in [0, K); T[n-1] == 0 is the unique
// smallest sentinel. Produces SA[0..n-1]; SA[0] == n-1.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

using i64 = int64_t;

// SI = suffix-array index type: int32_t below 2^31 positions, int64_t
// above (BASELINE config 5 scale inputs; the reduced recursion always
// has n_lms <= n/2 < 2^31 for any n < 2^32, so it re-enters at int32).
template <typename TT, typename SI>
void sais_core(const TT* T, SI* SA, i64 n, i64 K) {
  if (n == 1) {
    SA[0] = 0;
    return;
  }
  std::vector<uint8_t> t(n);  // 1 = S-type, 0 = L-type
  t[n - 1] = 1;
  for (i64 i = n - 2; i >= 0; --i)
    t[i] = (T[i] < T[i + 1]) ? 1 : (T[i] > T[i + 1] ? 0 : t[i + 1]);

  auto is_lms = [&](i64 i) { return i > 0 && t[i] && !t[i - 1]; };

  std::vector<i64> C(K, 0), B(K);
  for (i64 i = 0; i < n; ++i) C[T[i]]++;
  auto bucket_starts = [&] {
    i64 sum = 0;
    for (i64 i = 0; i < K; ++i) {
      B[i] = sum;
      sum += C[i];
    }
  };
  auto bucket_ends = [&] {
    i64 sum = 0;
    for (i64 i = 0; i < K; ++i) {
      sum += C[i];
      B[i] = sum;
    }
  };

  auto induce = [&] {
    // L-type pass, left to right
    bucket_starts();
    for (i64 i = 0; i < n; ++i) {
      i64 j = SA[i];
      if (j > 0 && !t[j - 1]) SA[B[T[j - 1]]++] = (SI)(j - 1);
    }
    // S-type pass, right to left
    bucket_ends();
    for (i64 i = n - 1; i >= 0; --i) {
      i64 j = SA[i];
      if (j > 0 && t[j - 1]) SA[--B[T[j - 1]]] = (SI)(j - 1);
    }
  };

  // step 1: place LMS suffixes at bucket ends (arbitrary order), induce
  std::memset(SA, -1, n * sizeof(SI));
  bucket_ends();
  for (i64 i = n - 1; i >= 1; --i)
    if (is_lms(i)) SA[--B[T[i]]] = (SI)i;
  induce();

  // step 2: collect sorted LMS substrings, name them
  std::vector<SI> lms_sorted;
  lms_sorted.reserve(n / 3 + 1);
  for (i64 i = 0; i < n; ++i)
    if (SA[i] >= 0 && is_lms(SA[i])) lms_sorted.push_back((SI)SA[i]);
  i64 n_lms = (i64)lms_sorted.size();

  // map position -> LMS index (by position order)
  std::vector<SI> lms_pos;
  lms_pos.reserve(n_lms);
  for (i64 i = 1; i < n; ++i)
    if (is_lms(i)) lms_pos.push_back((SI)i);

  // LMS names fit int32 for any n < 2^32 (names <= n_lms <= n/2)
  std::vector<int32_t> name_of(n, -1);
  i64 names = 0;
  i64 prev = -1;
  for (i64 k = 0; k < n_lms; ++k) {
    i64 cur = lms_sorted[k];
    bool same = false;
    if (prev >= 0) {
      // compare LMS substrings at prev and cur: equal iff chars and types
      // match up to (and including) the next LMS boundary of both
      same = true;
      for (i64 d = 0;; ++d) {
        if (prev + d >= n || cur + d >= n) {  // unreachable with a unique
          same = false;                       // sentinel; guard anyway
          break;
        }
        bool end_p = d > 0 && is_lms(prev + d);
        bool end_c = d > 0 && is_lms(cur + d);
        if (end_p && end_c) break;
        if (end_p != end_c || T[prev + d] != T[cur + d] ||
            t[prev + d] != t[cur + d]) {
          same = false;
          break;
        }
      }
    }
    if (!same) ++names;
    name_of[cur] = (int32_t)(names - 1);
    prev = cur;
  }

  std::vector<SI> lms_order(n_lms);  // sorted order of LMS suffixes
  if (names < n_lms) {
    // recurse on the reduced string (names in position order); n_lms <=
    // n/2 < 2^31 whenever n < 2^32, so the recursion runs at int32
    { std::vector<SI>().swap(lms_sorted); }  // big input: free before recursing
    std::vector<int32_t> T1(n_lms), SA1(n_lms);
    for (i64 k = 0; k < n_lms; ++k) T1[k] = name_of[lms_pos[k]];
    { std::vector<int32_t>().swap(name_of); }
    sais_core<int32_t, int32_t>(T1.data(), SA1.data(), n_lms, names);
    for (i64 k = 0; k < n_lms; ++k) lms_order[k] = lms_pos[SA1[k]];
  } else {
    for (i64 k = 0; k < n_lms; ++k) lms_order[k] = lms_sorted[k];
  }

  // step 3: final induce from the fully sorted LMS order
  std::memset(SA, -1, n * sizeof(SI));
  bucket_ends();
  for (i64 k = n_lms - 1; k >= 0; --k) {
    i64 j = lms_order[k];
    SA[--B[T[j]]] = (SI)j;
  }
  induce();
}

}  // namespace

extern "C" {

// T values in [0,K), T[n-1]==0 unique sentinel; fills SA. Returns 0.
int64_t sais_int32(const int32_t* T, int32_t* SA, int64_t n, int64_t K) {
  if (n <= 0 || n > INT32_MAX) return -1;
  sais_core<int32_t, int32_t>(T, SA, n, K);
  return 0;
}

// 64-bit-index variant for inputs past 2^31 positions (SA is int64).
int64_t sais_int64(const int32_t* T, int64_t* SA, int64_t n, int64_t K) {
  if (n <= 0) return -1;
  sais_core<int32_t, int64_t>(T, SA, n, K);
  return 0;
}

}  // extern "C"
