// Native host-runtime ops for mtad_gat_tpu.
//
// The TPU owns the compute path (JAX/XLA); these are the HOST-side hot loops
// around it, where pure python/numpy is the bottleneck:
//
//  - csv_dims/csv_parse_f32: fast CSV -> float32 ingestion for the SMD raw
//    files (replaces np.genfromtxt in the reference preprocess.py:11-15,
//    which is ~100x slower than a tight strtof loop).
//  - point_adjust: the OmniAnomaly point-adjust backward-fill with the exact
//    reference semantics (eval_methods.py:37-51), including the quirk that
//    the backward fill never reaches index 0.
//  - bf_search: best-F1 threshold grid search (eval_methods.py:120-157) —
//    step_num point-adjust+metrics passes over the full series, parallelized
//    across thresholds with OpenMP.
//
// Built as a shared library, bound via ctypes (no pybind11 in the image).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// CSV ingestion
// ---------------------------------------------------------------------------

// First pass: count rows and columns (columns from the first non-empty line).
// Returns 0 on success.
int csv_dims(const char* path, int64_t* rows, int64_t* cols) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  int64_t r = 0, c = 0;
  int ch, prev = '\n';
  int64_t line_cols = 1;
  bool line_has_data = false;
  while ((ch = fgetc(f)) != EOF) {
    if (ch == '\n') {
      if (line_has_data) {
        if (c == 0) c = line_cols;
        r++;
      }
      line_cols = 1;
      line_has_data = false;
    } else {
      if (ch == ',') line_cols++;
      else if (ch != '\r' && ch != ' ' && ch != '\t') line_has_data = true;
    }
    prev = ch;
  }
  if (line_has_data) {  // final line without trailing newline
    if (c == 0) c = line_cols;
    r++;
  }
  (void)prev;
  fclose(f);
  *rows = r;
  *cols = c;
  return 0;
}

// Second pass: parse into a caller-allocated rows*cols float32 buffer.
// Unparseable fields become NaN (matching np.genfromtxt). Returns 0 on
// success, 2 on ragged rows.
int csv_parse_f32(const char* path, float* out, int64_t rows, int64_t cols) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> buf(size + 1);
  size_t rd = fread(buf.data(), 1, size, f);
  fclose(f);
  buf[rd] = '\0';

  char* p = buf.data();
  char* end = buf.data() + rd;
  int64_t r = 0;
  while (p < end && r < rows) {
    // skip blank lines
    char* line_start = p;
    bool has_data = false;
    char* q = p;
    while (q < end && *q != '\n') {
      if (*q != '\r' && *q != ' ' && *q != '\t' && *q != ',') has_data = true;
      q++;
    }
    if (!has_data) {
      p = (q < end) ? q + 1 : end;
      continue;
    }
    p = line_start;
    for (int64_t c = 0; c < cols; ++c) {
      char* next = nullptr;
      float v = strtof(p, &next);
      if (next == p) {
        v = NAN;
        // advance to delimiter
        while (p < end && *p != ',' && *p != '\n') p++;
        next = p;
      }
      out[r * cols + c] = v;
      p = next;
      while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) p++;
      if (c + 1 < cols) {
        if (p < end && *p == ',') p++;
        else if (p >= end || *p == '\n') return 2;  // ragged row
      }
    }
    while (p < end && *p != '\n') p++;
    if (p < end) p++;
    r++;
  }
  return (r == rows) ? 0 : 2;
}

// ---------------------------------------------------------------------------
// Point-adjust (reference eval_methods.py:37-51 semantics, bit-exact)
// ---------------------------------------------------------------------------

double point_adjust(uint8_t* predict, const uint8_t* actual, int64_t n) {
  bool anomaly_state = false;
  int64_t anomaly_count = 0;
  int64_t latency = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (actual[i] && predict[i] && !anomaly_state) {
      anomaly_state = true;
      anomaly_count++;
      for (int64_t j = i; j > 0; --j) {  // never reaches index 0 (quirk kept)
        if (!actual[j]) break;
        if (!predict[j]) {
          predict[j] = 1;
          latency++;
        }
      }
    } else if (!actual[i]) {
      anomaly_state = false;
    }
    if (anomaly_state) predict[i] = 1;
  }
  return (double)latency / ((double)anomaly_count + 1e-4);
}

// ---------------------------------------------------------------------------
// Best-F1 threshold search
// ---------------------------------------------------------------------------

static void metrics_from(const uint8_t* predict, const uint8_t* actual,
                         int64_t n, double* out7) {
  double TP = 0, TN = 0, FP = 0, FN = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (predict[i]) {
      if (actual[i]) TP += 1;
      else FP += 1;
    } else {
      if (actual[i]) FN += 1;
      else TN += 1;
    }
  }
  double precision = TP / (TP + FP + 0.00001);
  double recall = TP / (TP + FN + 0.00001);
  double f1 = 2 * precision * recall / (precision + recall + 0.00001);
  out7[0] = f1; out7[1] = precision; out7[2] = recall;
  out7[3] = TP; out7[4] = TN; out7[5] = FP; out7[6] = FN;
}

// Reference loop semantics: ties keep the earlier (lower) threshold
// (strict > comparison on f1). The threshold GRID is computed by the Python
// caller with the reference's repeated float accumulation
// (eval_methods.py bf_search) and passed in, so the native and Python paths
// evaluate BIT-IDENTICAL thresholds — an adversarial near-tie cannot pick
// different winners depending on which path ran.
// out9 = {f1, precision, recall, TP, TN, FP, FN, threshold, latency}.
void bf_search_grid(const double* score, const uint8_t* actual, int64_t n,
                    const double* grid, int64_t step_num, double* out9) {
  std::vector<double> f1s(step_num), lats(step_num);
  std::vector<std::vector<double>> mets(step_num, std::vector<double>(7));

#ifdef _OPENMP
#pragma omp parallel
#endif
  {
    std::vector<uint8_t> predict(n);
#ifdef _OPENMP
#pragma omp for schedule(static)
#endif
    for (int64_t s = 0; s < step_num; ++s) {
      double threshold = grid[s];
      for (int64_t i = 0; i < n; ++i) predict[i] = score[i] > threshold;
      double lat = point_adjust(predict.data(), actual, n);
      metrics_from(predict.data(), actual, n, mets[s].data());
      f1s[s] = mets[s][0];
      lats[s] = lat;
    }
  }

  double best_f1 = -1.0;
  int64_t best_s = -1;
  for (int64_t s = 0; s < step_num; ++s) {
    if (f1s[s] > best_f1) {
      best_f1 = f1s[s];
      best_s = s;
    }
  }
  if (best_s < 0) {
    for (int i = 0; i < 9; ++i) out9[i] = 0;
    out9[0] = out9[1] = out9[2] = -1.0;
    return;
  }
  for (int i = 0; i < 7; ++i) out9[i] = mets[best_s][i];
  out9[7] = grid[best_s];
  out9[8] = lats[best_s];
}

}  // extern "C"
