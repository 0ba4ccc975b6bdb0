// Native host kernels for f0 preprocessing (sovits_tpu.f0.dio).
//
// The DIO-family refinement walks every voiced frame and sharpens the period
// estimate with a local normalized autocorrelation + parabolic peak
// interpolation — a sequential, branchy host loop that is the hot spot of
// dataset featurization (the TPU never sees it). This is the C++ version of
// DioF0Predictor._refine; the Python/numpy implementation remains as the
// fallback and as the reference for the parity test.
//
// Build: make -C sovits_tpu/native   (g++ -O3 -shared -fPIC)

#include <cmath>
#include <cstdint>

extern "C" {

// x: waveform [n]; frame_t: frame times in seconds [n_frames];
// f0: in/out per-frame f0 in Hz (0 = unvoiced) [n_frames].
void dio_refine_f0(const double* x, int64_t n, double fs,
                   const double* frame_t, double* f0, int64_t n_frames) {
    for (int64_t i = 0; i < n_frames; ++i) {
        const double f = f0[i];
        if (f <= 0.0) continue;
        const double period = fs / f;
        const int64_t half = static_cast<int64_t>(1.5 * period);
        const int64_t c = static_cast<int64_t>(frame_t[i] * fs);
        int64_t lo = c - half;
        if (lo < 0) lo = 0;
        int64_t hi = c + half + 1;
        if (hi > n) hi = n;
        const int64_t len = hi - lo;
        if (len < static_cast<int64_t>(1.2 * period) + 3) continue;

        // mean-remove the segment on the fly
        double mean = 0.0;
        for (int64_t j = lo; j < hi; ++j) mean += x[j];
        mean /= static_cast<double>(len);

        const int64_t lag0 = static_cast<int64_t>(std::llround(period));
        const int64_t window = 4;
        int64_t lag_lo = lag0 - window;
        if (lag_lo < 1) lag_lo = 1;
        int64_t lag_hi = lag0 + window + 1;
        if (lag_hi > len - 1) lag_hi = len - 1;
        const int64_t n_lags = lag_hi - lag_lo;
        if (n_lags < 3) continue;

        double best = -2.0;
        int64_t best_k = 0;
        double ac[16];  // window <= 4 -> at most 9 lags
        for (int64_t k = 0; k < n_lags; ++k) {
            const int64_t lag = lag_lo + k;
            double dot = 0.0, na = 0.0, nb = 0.0;
            const int64_t m = len - lag;
            for (int64_t j = 0; j < m; ++j) {
                const double a = x[lo + j] - mean;
                const double b = x[lo + j + lag] - mean;
                dot += a * b;
                na += a * a;
                nb += b * b;
            }
            const double v = dot / (std::sqrt(na) * std::sqrt(nb) + 1e-12);
            ac[k] = v;
            if (v > best) { best = v; best_k = k; }
        }
        double delta = 0.0;
        if (best_k > 0 && best_k < n_lags - 1) {
            const double denom = ac[best_k - 1] - 2.0 * ac[best_k] + ac[best_k + 1];
            delta = 0.5 * (ac[best_k - 1] - ac[best_k + 1]) / (denom + 1e-12);
            if (delta > 1.0) delta = 1.0;
            if (delta < -1.0) delta = -1.0;
        }
        const double refined = static_cast<double>(lag_lo + best_k) + delta;
        if (refined > 1.0) f0[i] = fs / refined;
    }
}

}  // extern "C"
