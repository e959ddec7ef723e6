// CPU reference-throughput baseline for the bench harness.
//
// Implements the same one-pass Pearson math as the reference's CPU path
// (semantics of computePearson1, reference src/Calculators/Correlation.cpp:42-99
// — independent implementation, not a copy) so bench.py can measure the
// "CPU reference" denominator of the >=50x target on this machine.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libcpu_baseline.so cpu_baseline.cpp
// (add -fopenmp if more than one core is available).

#include <cmath>
#include <cstdint>
#include <chrono>

extern "C" {

// Correlate every voxel series against the reference series.
// fields: member-major layout fields[e * num_voxels + v] (the layout the
// reference's loaders produce: one slab per member).
void pearson_field_cpu(
        const float* reference, const float* fields,
        int64_t num_voxels, int es, float* out) {
    for (int64_t v = 0; v < num_voxels; ++v) {
        double sum_x = 0.0, sum_y = 0.0, sum_xy = 0.0, sum_xx = 0.0,
               sum_yy = 0.0;
        for (int e = 0; e < es; ++e) {
            double x = reference[e];
            double y = fields[int64_t(e) * num_voxels + v];
            sum_x += x;
            sum_y += y;
            sum_xy += x * y;
            sum_xx += x * x;
            sum_yy += y * y;
        }
        double n = double(es);
        out[v] = float(
            (n * sum_xy - sum_x * sum_y) /
            std::sqrt((n * sum_xx - sum_x * sum_x) *
                      (n * sum_yy - sum_y * sum_y)));
    }
}

// Returns voxels/second for the given problem shape.
double pearson_throughput_cpu(int64_t num_voxels, int es) {
    float* reference = new float[es];
    float* fields = new float[int64_t(es) * num_voxels];
    float* out = new float[num_voxels];
    // Deterministic pseudo-data (xorshift32).
    uint32_t state = 0x243F6A88u;
    auto next = [&state]() {
        state ^= state << 13;
        state ^= state >> 17;
        state ^= state << 5;
        return float(state) * (1.0f / 4294967296.0f);
    };
    for (int e = 0; e < es; ++e) reference[e] = next();
    for (int64_t i = 0; i < int64_t(es) * num_voxels; ++i) fields[i] = next();

    auto t0 = std::chrono::steady_clock::now();
    pearson_field_cpu(reference, fields, num_voxels, es, out);
    auto t1 = std::chrono::steady_clock::now();
    double seconds = std::chrono::duration<double>(t1 - t0).count();

    delete[] reference;
    delete[] fields;
    delete[] out;
    return double(num_voxels) / seconds;
}

}  // extern "C"
