// skrx native host-side kernels.
//
// TPU-native counterpart of the reference's Cython/C++ layer
// (skrec/utils/py/cython/: evaluate.h, metric.h, randint.h, sort.h,
// thread_pool.h) — same capabilities, fresh design: one C ABI consumed via
// ctypes (no Cython), a std::thread worker pool with an atomic work index
// instead of a future-per-task queue, and flat offset-array inputs instead
// of per-user Python lists. These kernels serve as (a) CPU oracles for
// verifying the on-device JAX kernels, (b) a host fallback when no
// accelerator is present, and (c) the host side of the input pipeline.
//
// Metric semantics are the reference's exactly: cumulative
// Precision/Recall/MAP/NDCG/MRR at every k <= top_k, truth size clamped to
// >= 1, MAP denominator min(|truth|, k), NDCG's iDCG accumulating only while
// i < |truth|, MRR filling the tail after the first hit.

#include <algorithm>
#include <atomic>
#include <functional>
#include <cmath>
#include <cstdint>
#include <random>
#include <thread>
#include <unordered_set>
#include <vector>

namespace {

// Run fn(i) for i in [0, n) over a transient pool of `threads` workers.
void parallel_for(int64_t n, int threads, const std::function<void(int64_t)>& fn) {
    if (threads <= 1 || n <= 1) {
        for (int64_t i = 0; i < n; ++i) fn(i);
        return;
    }
    std::atomic<int64_t> next(0);
    auto worker = [&]() {
        while (true) {
            int64_t i = next.fetch_add(1);
            if (i >= n) break;
            fn(i);
        }
    };
    std::vector<std::thread> pool;
    int t = std::min<int64_t>(threads, n);
    pool.reserve(t);
    for (int i = 0; i < t; ++i) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
}

void eval_one_user(const float* ratings, int n_items,
                   const int* truth, int truth_len,
                   const int* metrics, int n_metrics, int top_k,
                   float* out) {
    // exact top_k by partial sort over indices (ties: lower index first,
    // matching a stable descending order)
    std::vector<int> idx(n_items);
    for (int i = 0; i < n_items; ++i) idx[i] = i;
    int k = std::min(top_k, n_items);
    std::partial_sort(idx.begin(), idx.begin() + k, idx.end(),
                      [ratings](int a, int b) {
                          if (ratings[a] != ratings[b])
                              return ratings[a] > ratings[b];
                          return a < b;
                      });

    std::unordered_set<int> truth_set(truth, truth + truth_len);
    float tl = std::max(truth_len, 1);

    for (int m = 0; m < n_metrics; ++m) {
        float* r = out + m * top_k;
        switch (metrics[m]) {
            case 1: {  // Precision
                float hits = 0;
                for (int i = 0; i < top_k; ++i) {
                    if (i < k && truth_set.count(idx[i])) hits += 1;
                    r[i] = hits / (i + 1);
                }
                break;
            }
            case 2: {  // Recall
                float hits = 0;
                for (int i = 0; i < top_k; ++i) {
                    if (i < k && truth_set.count(idx[i])) hits += 1;
                    r[i] = hits / tl;
                }
                break;
            }
            case 3: {  // MAP
                float hits = 0, sum_pre = 0;
                for (int i = 0; i < top_k; ++i) {
                    if (i < k && truth_set.count(idx[i])) {
                        hits += 1;
                        sum_pre += hits / (i + 1);
                    }
                    r[i] = sum_pre / std::min<float>(tl, i + 1);
                }
                break;
            }
            case 4: {  // NDCG
                float dcg = 0, idcg = 0;
                for (int i = 0; i < top_k; ++i) {
                    if (i < k && truth_set.count(idx[i]))
                        dcg += 1.0f / std::log2f(i + 2);
                    if (i < tl) idcg += 1.0f / std::log2f(i + 2);
                    r[i] = dcg / idcg;
                }
                break;
            }
            case 5: {  // MRR
                float rr = 0;
                bool found = false;
                for (int i = 0; i < top_k; ++i) {
                    if (!found && i < k && truth_set.count(idx[i])) {
                        rr = 1.0f / (i + 1);
                        found = true;
                    }
                    r[i] = found ? rr : 0.0f;
                }
                break;
            }
        }
    }
}

}  // namespace

// Row-wise full sort / argsort, ascending or descending, stable on ties
// (lower index first). 1D arrays are rows=1. Parity with the reference's
// templated 1D/2D sort kernels (skrec cython include/sort.h:17-170 +
// pyx_sort.pyx:25-187) — float32 and int32 instantiations, thread-pooled.
template <typename T>
static void sort_rows(const T* x, int rows, int n, int descending,
                      int n_threads, T* out) {
    parallel_for(rows, n_threads, [&](int64_t r) {
        const T* src = x + r * n;
        T* dst = out + r * n;
        std::copy(src, src + n, dst);
        if (descending)
            std::stable_sort(dst, dst + n, std::greater<T>());
        else
            std::stable_sort(dst, dst + n);
    });
}

template <typename T>
static void arg_sort_rows(const T* x, int rows, int n, int descending,
                          int n_threads, int* out_idx) {
    parallel_for(rows, n_threads, [&](int64_t r) {
        const T* src = x + r * n;
        int* dst = out_idx + r * n;
        for (int i = 0; i < n; ++i) dst[i] = i;
        if (descending)
            std::stable_sort(dst, dst + n, [src](int a, int b) {
                return src[a] > src[b];
            });
        else
            std::stable_sort(dst, dst + n, [src](int a, int b) {
                return src[a] < src[b];
            });
    });
}

extern "C" {

// scores: (B, n_items) row-major. test/train items flat + offsets (len B+1).
// out: (B, n_metrics * top_k).
void skrx_eval_score_matrix(const float* scores, int batch, int n_items,
                            const int* test_items, const int64_t* test_offsets,
                            const int* train_items, const int64_t* train_offsets,
                            const int* metrics, int n_metrics, int top_k,
                            int n_threads, float* out) {
    parallel_for(batch, n_threads, [&](int64_t b) {
        std::vector<float> row(scores + b * n_items,
                               scores + (b + 1) * n_items);
        if (train_offsets) {
            for (int64_t j = train_offsets[b]; j < train_offsets[b + 1]; ++j)
                row[train_items[j]] = -INFINITY;
        }
        eval_one_user(row.data(), n_items,
                      test_items + test_offsets[b],
                      static_cast<int>(test_offsets[b + 1] - test_offsets[b]),
                      metrics, n_metrics, top_k,
                      out + b * n_metrics * top_k);
    });
}

// Uniform negatives in [0, high) excluding each row's positives.
// sizes: draws per row; exclusions flat + offsets; out flat (sum(sizes)).
void skrx_batch_sample_negatives(int high, const int64_t* sizes, int batch,
                                 const int* exclusions,
                                 const int64_t* excl_offsets,
                                 uint64_t seed, int n_threads, int* out) {
    std::vector<int64_t> out_offsets(batch + 1, 0);
    for (int b = 0; b < batch; ++b) out_offsets[b + 1] = out_offsets[b] + sizes[b];
    parallel_for(batch, n_threads, [&](int64_t b) {
        std::mt19937_64 gen(seed + 0x9e3779b97f4a7c15ULL * (b + 1));
        std::uniform_int_distribution<int> dist(0, high - 1);
        std::unordered_set<int> excl(exclusions + excl_offsets[b],
                                     exclusions + excl_offsets[b + 1]);
        int* dst = out + out_offsets[b];
        for (int64_t i = 0; i < sizes[b]; ++i) {
            int v = dist(gen);
            while (excl.count(v)) v = dist(gen);
            dst[i] = v;
        }
    });
}

// Row-wise top-k (values + indices), descending, ties by lower index.
void skrx_top_k(const float* scores, int batch, int n_items, int top_k,
                int n_threads, float* out_vals, int* out_idx) {
    parallel_for(batch, n_threads, [&](int64_t b) {
        const float* row = scores + b * n_items;
        std::vector<int> idx(n_items);
        for (int i = 0; i < n_items; ++i) idx[i] = i;
        int k = std::min(top_k, n_items);
        std::partial_sort(idx.begin(), idx.begin() + k, idx.end(),
                          [row](int a, int c) {
                              if (row[a] != row[c]) return row[a] > row[c];
                              return a < c;
                          });
        for (int i = 0; i < top_k; ++i) {
            int j = i < k ? idx[i] : -1;
            out_idx[b * top_k + i] = j;
            out_vals[b * top_k + i] = j >= 0 ? row[j] : -INFINITY;
        }
    });
}

void skrx_sort_f32(const float* x, int rows, int n, int descending,
                   int n_threads, float* out) {
    sort_rows<float>(x, rows, n, descending, n_threads, out);
}

void skrx_sort_i32(const int* x, int rows, int n, int descending,
                   int n_threads, int* out) {
    sort_rows<int>(x, rows, n, descending, n_threads, out);
}

void skrx_arg_sort_f32(const float* x, int rows, int n, int descending,
                       int n_threads, int* out_idx) {
    arg_sort_rows<float>(x, rows, n, descending, n_threads, out_idx);
}

void skrx_arg_sort_i32(const int* x, int rows, int n, int descending,
                       int n_threads, int* out_idx) {
    arg_sort_rows<int>(x, rows, n, descending, n_threads, out_idx);
}

int skrx_abi_check() {
    // dtype contract guard (reference pyx_init.pyx:6-16)
    return (sizeof(int) == 4 && sizeof(float) == 4 && sizeof(int64_t) == 8)
               ? 1 : 0;
}

}  // extern "C"
