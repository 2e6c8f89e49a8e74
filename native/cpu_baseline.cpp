// CPU baseline for the bench harness: Myers bit-parallel ed<=2 scoring of
// (candidate k-mer x window) pairs, OpenMP over candidates -- an optimized
// stand-in for the reference's hot loop (the reference itself publishes no
// benchmark numbers; see BASELINE.md).  Same counting semantics as
// kernels/bpm.py: count += max(0, 3 - d_min) per pair.
//
// Usage: cpu_baseline <C> <W> <m> <k> <threads>
// Reads nothing; generates the same LCG-random data the bench generates.
// Prints "<pairs_per_sec>" on stdout.
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <chrono>
#include <vector>
#ifdef _OPENMP
#include <omp.h>
#endif

static inline uint32_t lcg(uint64_t &s) {
    s = s * 6364136223846793005ULL + 1442695040888963407ULL;
    return (uint32_t)(s >> 33);
}

int main(int argc, char **argv) {
    int C = argc > 1 ? atoi(argv[1]) : 512;
    int W = argc > 2 ? atoi(argv[2]) : 4096;
    int m = argc > 3 ? atoi(argv[3]) : 101;
    int k = argc > 4 ? atoi(argv[4]) : 16;
    int nt = argc > 5 ? atoi(argv[5]) : 2;
#ifdef _OPENMP
    omp_set_num_threads(nt);
#endif
    uint64_t seed = 12345;
    std::vector<uint8_t> wins((size_t)W * m);
    for (auto &c : wins) c = lcg(seed) & 3;
    std::vector<uint32_t> peq((size_t)C * 4, 0);
    for (int ci = 0; ci < C; ci++) {
        for (int i = 0; i < k; i++) {
            uint32_t b = lcg(seed) & 3;
            peq[(size_t)ci * 4 + b] |= (1u << i);
        }
    }
    std::vector<uint64_t> totals(C, 0);
    auto t0 = std::chrono::steady_clock::now();
#pragma omp parallel for schedule(static)
    for (int ci = 0; ci < C; ci++) {
        const uint32_t *pq = &peq[(size_t)ci * 4];
        uint64_t total = 0;
        const uint32_t high = 1u << (k - 1);
        for (int w = 0; w < W; w++) {
            const uint8_t *t = &wins[(size_t)w * m];
            uint32_t VP = 0xFFFFFFFFu, VN = 0;
            int score = k, best = k;
            for (int j = 0; j < m; j++) {
                uint32_t Eq = pq[t[j]];
                uint32_t Xv = Eq | VN;
                uint32_t Xh = (((Eq & VP) + VP) ^ VP) | Eq;
                uint32_t Ph = VN | ~(Xh | VP);
                uint32_t Mh = VP & Xh;
                if (Ph & high) score++;
                else if (Mh & high) score--;
                Ph <<= 1; Mh <<= 1;
                VP = Mh | ~(Xv | Ph);
                VN = Ph & Xv;
                if (score < best) best = score;
            }
            if (best < 3) total += 3 - best;
        }
        totals[ci] = total;
    }
    auto t1 = std::chrono::steady_clock::now();
    double dt = std::chrono::duration<double>(t1 - t0).count();
    uint64_t checksum = 0;
    for (auto v : totals) checksum += v;
    fprintf(stderr, "checksum=%llu time=%.3fs\n",
            (unsigned long long)checksum, dt);
    printf("%.1f\n", (double)C * W / dt);
    return 0;
}
