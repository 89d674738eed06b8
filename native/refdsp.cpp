// Reference DSP oracle — sequential C++ implementations of the JUCE/
// pedalboard effect semantics (the native layer the upstream project
// gets from pedalboard; reference remfx/effects.py:297-616).
//
// These are *independent* time-domain implementations used as golden
// oracles for the JAX/TPU renderers (which use FFT-domain / scan /
// chunked algorithms). Built via `make -C native` and loaded with
// ctypes from tests and tools.

#include <cmath>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------- distortion
void ref_distortion(const float* x, float* y, long n, float drive_db) {
  const float g = std::pow(10.0f, drive_db / 20.0f);
  for (long i = 0; i < n; ++i) y[i] = std::tanh(x[i] * g);
}

// ---------------------------------------------------------------- delay
// JUCE DelayLine<Linear>: pop (interp between u[n-Di], u[n-Di-1]),
// then push u[n] = x[n] + fb*d[n]; y = (1-mix)x + mix*d.
void ref_delay(const float* x, float* y, long n, double sr,
               double delay_seconds, double feedback, double mix) {
  const double D = delay_seconds * sr;
  const long Di = (long)std::floor(D);
  const double f = D - (double)Di;
  std::vector<double> u((size_t)n, 0.0);
  for (long i = 0; i < n; ++i) {
    const long i0 = i - Di;
    const long i1 = i - Di - 1;
    const double u0 = (i0 >= 0 && i0 < n) ? u[(size_t)i0] : 0.0;
    const double u1 = (i1 >= 0 && i1 < n) ? u[(size_t)i1] : 0.0;
    const double d = (1.0 - f) * u0 + f * u1;
    u[(size_t)i] = x[i] + feedback * d;
    y[i] = (float)((1.0 - mix) * x[i] + mix * d);
  }
}

// ----------------------------------------------------------- compressor
// JUCE dsp::Compressor + BallisticsFilter (peak).
static inline double cte_of(double time_ms, double sr) {
  if (time_ms < 1.0e-3) return 0.0;
  return std::exp(-2.0 * M_PI * 1000.0 / sr / time_ms);
}

void ref_compressor(const float* x, float* y, long n, double sr,
                    double threshold_db, double ratio, double attack_ms,
                    double release_ms) {
  const double cte_at = cte_of(attack_ms, sr);
  const double cte_rl = cte_of(release_ms, sr);
  const double thresh = std::pow(10.0, threshold_db / 20.0);
  const double expo = 1.0 / ratio - 1.0;
  double env = 0.0;
  for (long i = 0; i < n; ++i) {
    const double xa = std::fabs((double)x[i]);
    const double cte = (xa > env) ? cte_at : cte_rl;
    env = xa + cte * (env - xa);
    const double gain = (env < thresh) ? 1.0 : std::pow(env / thresh, expo);
    y[i] = (float)(gain * x[i]);
  }
}

// -------------------------------------------------------------- limiter
// JUCE dsp::Limiter: fixed first stage (-10 dB, ratio 4, 2 ms / 200 ms),
// user second stage (ratio 1000, attack 1e-3 ms), then clip [-1, 1].
void ref_limiter(const float* x, float* y, long n, double sr,
                 double threshold_db, double release_ms) {
  std::vector<float> tmp((size_t)n);
  ref_compressor(x, tmp.data(), n, sr, -10.0, 4.0, 2.0, 200.0);
  ref_compressor(tmp.data(), y, n, sr, threshold_db, 1000.0, 1.0e-3,
                 release_ms);
  for (long i = 0; i < n; ++i)
    y[i] = std::fmax(-1.0f, std::fmin(1.0f, y[i]));
}

// --------------------------------------------------------------- chorus
// JUCE dsp::Chorus: shared sine LFO; delay[n] = max(1 + 0.5*depth*lfo, 0)
// * centre_ms/1000*sr; u[n] = x[n] - fb*y[n-1]; y = interp pop; linear mix.
void ref_chorus(const float* x, float* y, long n, double sr, double rate_hz,
                double depth, double centre_ms, double feedback, double mix) {
  std::vector<double> u((size_t)n, 0.0);
  double y_prev = 0.0;
  for (long i = 0; i < n; ++i) {
    const double lfo = std::sin(2.0 * M_PI * rate_hz * (double)i / sr);
    const double delay =
        std::max(1.0 + 0.5 * depth * lfo, 0.0) * centre_ms / 1000.0 * sr;
    const long Di = (long)std::floor(delay);
    const double f = delay - (double)Di;
    u[(size_t)i] = x[i] - feedback * y_prev;
    const long i0 = i - Di;
    const long i1 = i - Di - 1;
    const double u0 = (i0 >= 0) ? u[(size_t)i0] : 0.0;
    const double u1 = (i1 >= 0) ? u[(size_t)i1] : 0.0;
    const double d = (1.0 - f) * u0 + f * u1;
    y_prev = d;
    y[i] = (float)((1.0 - mix) * x[i] + mix * d);
  }
}

// --------------------------------------------------------------- reverb
// juce::Reverb (Freeverb) mono path, static parameters.
struct Comb {
  std::vector<double> buf;
  size_t idx = 0;
  double last = 0.0;
  double damp = 0.0, feedback = 0.0;
  double process(double input) {
    const double out = buf[idx];
    last = out * (1.0 - damp) + last * damp;
    buf[idx] = input + last * feedback;
    idx = (idx + 1) % buf.size();
    return out;
  }
};

struct AllPass {
  std::vector<double> buf;
  size_t idx = 0;
  double process(double input) {
    const double b = buf[idx];
    buf[idx] = input + b * 0.5;
    idx = (idx + 1) % buf.size();
    return b - input;
  }
};

void ref_reverb_mono(const float* x, float* y, long n, long sr,
                     double room_size, double damping, double wet_level,
                     double dry_level, double width) {
  static const int combT[8] = {1116, 1188, 1277, 1356, 1422, 1491, 1557, 1617};
  static const int apT[4] = {556, 441, 341, 225};
  const double fb = room_size * 0.28 + 0.7;
  const double damp = damping * 0.4;
  const double wet1 = wet_level * 3.0 * 0.5 * (1.0 + width);
  const double dry = dry_level * 2.0;
  Comb combs[8];
  AllPass aps[4];
  for (int c = 0; c < 8; ++c) {
    combs[c].buf.assign((size_t)((combT[c] * sr) / 44100), 0.0);
    combs[c].damp = damp;
    combs[c].feedback = fb;
  }
  for (int a = 0; a < 4; ++a) aps[a].buf.assign((size_t)((apT[a] * sr) / 44100), 0.0);
  for (long i = 0; i < n; ++i) {
    const double input = (double)x[i] * 0.015;
    double out = 0.0;
    for (int c = 0; c < 8; ++c) out += combs[c].process(input);
    for (int a = 0; a < 4; ++a) out = aps[a].process(out);
    y[i] = (float)(out * wet1 + (double)x[i] * dry);
  }
}

// -------------------------------------------------- biquad (scipy.lfilter)
void ref_biquad(const float* x, float* y, long n, const double* b,
                const double* a) {
  double x1 = 0, x2 = 0, y1 = 0, y2 = 0;
  for (long i = 0; i < n; ++i) {
    const double xn = x[i];
    const double yn = b[0] * xn + b[1] * x1 + b[2] * x2 - a[1] * y1 - a[2] * y2;
    x2 = x1; x1 = xn; y2 = y1; y1 = yn;
    y[i] = (float)yn;
  }
}

}  // extern "C"
