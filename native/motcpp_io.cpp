// Native IO runtime for motcpp_tpu: fast MOT-Challenge text parsing and
// result writing.
//
// TPU-native equivalent of the reference's C++ data layer (reference:
// src/data/mot17_dataset.cpp parses det/emb text files with per-line
// istringstreams; include/motcpp/utils/mot_format.hpp appends result
// rows). The tracking compute path is JAX; this module keeps the host
// IO path native: a single-pass, zero-allocation-per-line parser feeds
// flat float buffers that numpy wraps without copies.
//
// Exposed C ABI (consumed via ctypes from motcpp_tpu/utils/native_io.py):
//   motio_parse_floats(path, max_cols, out_rows, out_cols) -> float*
//       Parses a whitespace/comma-delimited numeric text file into a
//       row-major float32 buffer of shape (rows, cols); cols is the
//       column count of the first data line (capped at max_cols); short
//       lines are zero-padded, comments (#) and blank lines skipped.
//   motio_free(ptr)
//   motio_write_mot(path, rows, n) -> int
//       Appends n MOT rows (10 floats each) in the reference's exact
//       format: ints for frame/id/box/world fields, %.6f confidence.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cctype>
#include <sys/stat.h>
#include <sys/types.h>
#include <string>
#include <vector>

extern "C" {

static bool parse_line(const char* p, float* out, int max_cols, int* n_out) {
    int n = 0;
    while (*p && n < max_cols) {
        while (*p == ' ' || *p == '\t' || *p == ',' || *p == '\r') ++p;
        if (*p == '\0' || *p == '\n') break;
        char* end = nullptr;
        float v = strtof(p, &end);
        if (end == p) {
            // trailing junk: keep the parsed prefix (matches the Python
            // fallback and the reference's stof-catch->break behavior)
            *n_out = n;
            return n > 0;
        }
        out[n++] = v;
        p = end;
    }
    *n_out = n;
    return n > 0;
}

float* motio_parse_floats(const char* path, int max_cols,
                          long* out_rows, int* out_cols) {
    *out_rows = 0;
    *out_cols = 0;
    FILE* f = fopen(path, "rb");
    if (!f) return nullptr;

    std::vector<float> data;
    data.reserve(1 << 16);
    std::vector<float> line_buf(max_cols);

    char buf[1 << 16];
    std::string carry;
    int cols = 0;

    // read file in chunks, split lines manually
    std::string content;
    size_t got;
    while ((got = fread(buf, 1, sizeof(buf), f)) > 0) {
        content.append(buf, got);
    }
    fclose(f);

    size_t pos = 0;
    const size_t len = content.size();
    while (pos < len) {
        size_t eol = content.find('\n', pos);
        if (eol == std::string::npos) eol = len;
        if (eol > pos) {
            const char* line = content.c_str() + pos;
            if (line[0] != '#') {
                int n = 0;
                // temporarily bound the line (content is mutable)
                char saved = content[eol < len ? eol : len - 1];
                if (eol < len) content[eol] = '\0';
                bool ok = parse_line(line, line_buf.data(), max_cols, &n);
                if (eol < len) content[eol] = saved;
                if (ok && n > 0) {
                    if (cols == 0) cols = n;
                    for (int i = 0; i < cols; ++i) {
                        data.push_back(i < n ? line_buf[i] : 0.0f);
                    }
                }
            }
        }
        pos = eol + 1;
    }

    if (cols == 0 || data.empty()) return nullptr;
    long rows = static_cast<long>(data.size() / cols);
    float* out = static_cast<float*>(malloc(sizeof(float) * data.size()));
    if (!out) return nullptr;
    memcpy(out, data.data(), sizeof(float) * data.size());
    *out_rows = rows;
    *out_cols = cols;
    return out;
}

void motio_free(float* ptr) { free(ptr); }

static void mkdirs(const std::string& dir) {
    if (dir.empty()) return;
    std::string cur;
    for (size_t i = 0; i < dir.size(); ++i) {
        cur += dir[i];
        if (dir[i] == '/' && cur.size() > 1) {
            mkdir(cur.c_str(), 0755);
        }
    }
    mkdir(dir.c_str(), 0755);
}

int motio_write_mot(const char* path, const float* rows, long n) {
    std::string p(path);
    size_t slash = p.find_last_of('/');
    if (slash != std::string::npos) {
        mkdirs(p.substr(0, slash));
    }
    FILE* f = fopen(path, "ab");
    if (!f) return -1;
    for (long i = 0; i < n; ++i) {
        const float* r = rows + i * 10;
        fprintf(f, "%d,%d,%d,%d,%d,%d,%.6f,%d,%d,%d\n",
                (int)r[0], (int)r[1], (int)r[2], (int)r[3], (int)r[4],
                (int)r[5], r[6], (int)r[7], (int)r[8], (int)r[9]);
    }
    fclose(f);
    return 0;
}

}  // extern "C"
