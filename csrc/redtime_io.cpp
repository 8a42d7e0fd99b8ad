// Native data-loading runtime for redtime_tpu.
//
// The reference's IO layer is C++ (ifstream parsing in
// AU_cosmological_parameters.h and AU_tabfun.h); this is its TPU-framework
// counterpart: a fast, thread-parallel reader for CAMB transfer-function
// stacks (the per-cosmology beta_P input is ~33 files x 15k rows x 7 cols).
// Exposed through ctypes (redtime_tpu/io/native.py); numpy remains the
// fallback when the shared library is unavailable.
//
// Build: make -C csrc   (g++ -O3 -shared -fPIC -fopenmp)

#include <cerrno>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Parse a whitespace-separated numeric table, skipping '#' comment lines.
// out must hold max_rows*ncols doubles.  Returns the number of complete
// rows parsed, -1 on IO error, or -2 if the buffer filled up with data
// rows still unconsumed (caller should retry with a larger buffer).
long parse_table(const char *path, long ncols, double *out, long max_rows) {
  FILE *f = fopen(path, "rb");
  if (!f)
    return -1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  char *buf = (char *)malloc(size + 1);
  if (!buf) {
    fclose(f);
    return -1;
  }
  if ((long)fread(buf, 1, size, f) != size) {
    free(buf);
    fclose(f);
    return -1;
  }
  buf[size] = '\0';
  fclose(f);

  long rows = 0;
  char *p = buf, *end = buf + size;
  while (p < end && rows < max_rows) {
    // skip leading whitespace
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r' || *p == '\n'))
      p++;
    if (p >= end)
      break;
    if (*p == '#') { // comment line
      while (p < end && *p != '\n')
        p++;
      continue;
    }
    // parse one row, bounded to ONE line: bare strtod skips newlines,
    // silently merging a short row with the following line(s) — e.g. a
    // 7-column file read with ncols=13 would interleave garbage instead
    // of erroring
    long c = 0;
    char *q = p;
    for (; c < ncols; c++) {
      while (q < end && (*q == ' ' || *q == '\t' || *q == '\r'))
        q++;
      if (q >= end || *q == '\n' || *q == '#')
        break; // row ended before ncols values
      errno = 0;
      char *next;
      double v = strtod(q, &next);
      if (next == q)
        break; // no progress: malformed/extra text
      out[rows * ncols + c] = v;
      q = next;
    }
    if (c == ncols) {
      rows++;
    } else if (c > 0) {
      // a numeric row with fewer than ncols columns: wrong-format or
      // corrupt table — report it instead of guessing
      free(buf);
      return -3;
    }
    // advance to end of line (ignore extra columns)
    p = q;
    while (p < end && *p != '\n')
      p++;
  }
  if (rows == max_rows) {
    // signal truncation if any non-comment content remains
    while (p < end) {
      while (p < end && (*p == ' ' || *p == '\t' || *p == '\r' || *p == '\n'))
        p++;
      if (p < end && *p == '#') {
        while (p < end && *p != '\n')
          p++;
        continue;
      }
      break;
    }
    if (p < end) {
      free(buf);
      return -2;
    }
  }
  free(buf);
  return rows;
}

// Load a stack of identically-shaped tables in parallel.
// paths: array of n C strings; out holds n*max_rows*ncols doubles.
// rows_out[i] receives the per-file row count (-1 on error).
void parse_stack(const char **paths, long n, long ncols, double *out,
                 long max_rows, long *rows_out) {
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (long i = 0; i < n; i++) {
    rows_out[i] = parse_table(paths[i], ncols, out + i * max_rows * ncols,
                              max_rows);
  }
}

// Format a [nr, nc] f64 block as the reference's output rows: every value
// printf("%*.*g"), one row per line — identical bytes to C++
// `setprecision(prec) << setw(width)` default-float (redTime.cc:64,
// :1670-1741) and to Python's f"{x:.{prec}g}" right-justified to width
// (both are correctly-rounded shortest-%g renderings).  This is the hot
// half of the output path: a 64-cosmology batch is ~1.1M formatted
// values, ~0.9 s in Python f-strings vs device-solve ~1.0 s.
// Returns bytes written, or -1 if cap is too small.
long format_rows(const double *data, long nr, long nc, long width,
                 long prec, char *out, long cap) {
  long off = 0;
  for (long i = 0; i < nr; i++) {
    for (long j = 0; j < nc; j++) {
      if (cap - off < width + 40)
        return -1;
      int n = snprintf(out + off, (size_t)(cap - off), "%*.*g", (int)width,
                       (int)prec, data[i * nc + j]);
      if (n < 0)
        return -1;
      off += n;
    }
    if (cap - off < 2)
      return -1;
    out[off++] = '\n';
  }
  return off;
}

} // extern "C"
