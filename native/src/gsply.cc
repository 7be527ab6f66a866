// Native gaussian-splat .ply loader.
//
// The reference's scene importer is C++ (PlyParser.cpp): header parse,
// row-major float deserialization, then per-splat activation transforms.
// This library is the TPU framework's native data loader: it performs the
// same semantic steps but emits the framework's planar SoA device layout
// directly — means/scales/colors as [3][N] rows, spherical harmonics as
// [3][K][N], rotations quantized to one uint32 — so the Python side can
// hand buffers straight to jax.device_put with zero reshaping.
//
// Exposed as a plain C API consumed via ctypes (no pybind11 dependency).

#include <cerrno>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Header {
  std::vector<std::string> properties;
  long vertex_count = -1;
  bool little_endian = false;
  long body_offset = 0;
};

// Parse the ASCII header; mirrors the acceptance rules of the Python
// importer (binary_little_endian only, float properties only, unknown
// keywords ignored, duplicate properties rejected).
bool parse_header(FILE* f, Header* h, char* err, size_t errlen) {
  char line[512];
  int iterations = 0;
  while (fgets(line, sizeof line, f)) {
    if (++iterations > 258) {
      snprintf(err, errlen, "PLY header terminator (end_header) not found.");
      return false;
    }
    // A line longer than the buffer (legal for comments) would leave its
    // tail to be re-parsed as fresh header lines; consume it here so one
    // file line is always one parsed line.
    if (!strchr(line, '\n') && !feof(f)) {
      int ch;
      while ((ch = fgetc(f)) != EOF && ch != '\n') {
      }
    }
    char w0[64] = {0}, w1[256] = {0}, w2[256] = {0};
    int n = sscanf(line, "%63s %255s %255s", w0, w1, w2);
    if (n < 1) {
      snprintf(err, errlen, "Blank line inside PLY header.");
      return false;
    }
    if (!strcmp(w0, "ply")) continue;
    if (!strcmp(w0, "format")) {
      h->little_endian = n >= 2 && !strcmp(w1, "binary_little_endian");
    } else if (!strcmp(w0, "element")) {
      if (n < 2 || strcmp(w1, "vertex")) {
        snprintf(err, errlen, "Unsupported element (only 'vertex' is accepted).");
        return false;
      }
      if (n < 3) {
        snprintf(err, errlen, "Malformed vertex count.");
        return false;
      }
      // Strict parse: atol would silently map garbage to 0 and overflow
      // to LONG_MAX (feeding unchecked allocation sizes downstream).
      char* end = nullptr;
      errno = 0;
      long count = strtol(w2, &end, 10);
      if (errno || end == w2 || *end != '\0' || count < 0) {
        snprintf(err, errlen, "Malformed vertex count.");
        return false;
      }
      h->vertex_count = count;
    } else if (!strcmp(w0, "property")) {
      if (n < 2 || strcmp(w1, "float")) {
        snprintf(err, errlen, "Unsupported property type (only float is accepted).");
        return false;
      }
      if (n < 3) {
        snprintf(err, errlen, "Property declaration lacks a name.");
        return false;
      }
      for (auto& p : h->properties) {
        if (p == w2) {
          snprintf(err, errlen, "Property declared twice: \"%s\".", w2);
          return false;
        }
      }
      h->properties.emplace_back(w2);
    } else if (!strcmp(w0, "end_header")) {
      if (!h->little_endian || h->vertex_count < 0) {
        snprintf(err, errlen, "Header lacks binary_little_endian format or a vertex count.");
        return false;
      }
      h->body_offset = ftell(f);
      return true;
    }
    // unknown keywords (comment, obj_info, ...) ignored
  }
  snprintf(err, errlen, "PLY header terminator (end_header) not found.");
  return false;
}

inline float sigmoidf(float x) { return 1.0f / (1.0f + std::exp(-x)); }

inline uint32_t quantize_byte(float v01) {
  float c = v01 < 0.f ? 0.f : (v01 > 1.f ? 1.f : v01);
  return (uint32_t)(c * 255.0f);  // truncation, like the reference's cast
}

}  // namespace

extern "C" {

typedef struct {
  long count;
  int sh_degree;
  int sh_coeffs;  // K = (degree+1)^2
  float* means;       // [3][N]
  float* scales;      // [3][N]
  uint32_t* quats;    // [N] packed x|y|z|w, 8 bits each
  float* opacities;   // [N]
  float* colors;      // [3][N] baked deg-0
  float* sh;          // [3][K][N] planar, or NULL when degree == 0
  float bounds_min[3];
  float bounds_max[3];
  char error[256];
} GsplyScene;

void gsply_release(GsplyScene* s) {
  if (!s) return;
  free(s->means);
  free(s->scales);
  free(s->quats);
  free(s->opacities);
  free(s->colors);
  free(s->sh);
  memset(s, 0, sizeof *s);
}

// Returns 0 on success; on failure fills s->error.
int gsply_load(const char* path, GsplyScene* s) {
  memset(s, 0, sizeof *s);
  FILE* f = fopen(path, "rb");
  if (!f) {
    snprintf(s->error, sizeof s->error, "cannot open %s", path);
    return 1;
  }
  Header h;
  if (!parse_header(f, &h, s->error, sizeof s->error)) {
    fclose(f);
    return 1;
  }
  const long n = h.vertex_count;
  const size_t props = h.properties.size();

  // Bound the claimed count by what the file can actually hold BEFORE
  // sizing any allocation (a hostile header can claim LONG_MAX vertices;
  // sizeof(float) * 3 * n would wrap and malloc a tiny buffer).
  if (fseek(f, 0, SEEK_END) != 0) {
    snprintf(s->error, sizeof s->error, "cannot seek %s", path);
    fclose(f);
    return 1;
  }
  const long long file_size = ftell(f);
  fseek(f, h.body_offset, SEEK_SET);
  const unsigned long long body_bytes =
      (unsigned long long)n * props * sizeof(float);
  if (props == 0 || (unsigned long long)n > (1ull << 40) ||
      body_bytes / props / sizeof(float) != (unsigned long long)n ||
      body_bytes > (unsigned long long)(file_size - h.body_offset)) {
    snprintf(s->error, sizeof s->error, "Vertex data ends early (truncated file).");
    fclose(f);
    return 1;
  }

  auto index_of = [&](const char* name) -> int {
    for (size_t i = 0; i < props; ++i)
      if (h.properties[i] == name) return (int)i;
    return -1;
  };

  static const char* required[] = {"x", "y", "z", "rot_0", "rot_1", "rot_2",
                                   "rot_3", "scale_0", "scale_1", "scale_2",
                                   "f_dc_0", "f_dc_1", "f_dc_2", "opacity"};
  int off[14];
  for (int i = 0; i < 14; ++i) {
    off[i] = index_of(required[i]);
    if (off[i] < 0) {
      snprintf(s->error, sizeof s->error, "Required property absent: \"%s\".", required[i]);
      fclose(f);
      return 1;
    }
  }
  // After the property diagnosis (same precedence as the Python
  // importer): an empty scene has no bounds — reject it.
  if (n == 0) {
    snprintf(s->error, sizeof s->error, "Vertex element declares zero vertices.");
    fclose(f);
    return 1;
  }

  // f_rest_* discovery (stop at the first gap), degree inference:
  // each degree d >= 1 contributes (2(d+1)+1)*3 coefficients.
  std::vector<int> rest;
  for (;;) {
    char name[32];
    snprintf(name, sizeof name, "f_rest_%zu", rest.size());
    int idx = index_of(name);
    if (idx < 0) break;
    rest.push_back(idx);
  }
  int degree = 0;
  long expected = 0;
  while (expected < (long)rest.size()) {
    expected += (2 * (degree + 1) + 1) * 3;
    ++degree;
  }
  if (expected != (long)rest.size()) {
    snprintf(s->error, sizeof s->error,
             "f_rest_* count %zu does not complete an SH degree "
             "(degree %d needs %ld).",
             rest.size(), degree, expected);
    fclose(f);
    return 1;
  }
  const int k = (degree + 1) * (degree + 1);
  const long per_channel = degree ? (long)rest.size() / 3 : 0;

  s->count = n;
  s->sh_degree = degree;
  s->sh_coeffs = k;
  s->means = (float*)malloc(sizeof(float) * 3 * n);
  s->scales = (float*)malloc(sizeof(float) * 3 * n);
  s->quats = (uint32_t*)malloc(sizeof(uint32_t) * n);
  s->opacities = (float*)malloc(sizeof(float) * n);
  s->colors = (float*)malloc(sizeof(float) * 3 * n);
  s->sh = degree ? (float*)malloc(sizeof(float) * 3 * k * n) : nullptr;
  if (!s->means || !s->scales || !s->quats || !s->opacities || !s->colors ||
      (degree && !s->sh)) {
    fclose(f);
    gsply_release(s);
    snprintf(s->error, sizeof s->error, "Out of memory (%ld vertices).", n);
    return 1;
  }

  float bmin[3] = {INFINITY, INFINITY, INFINITY};
  float bmax[3] = {-INFINITY, -INFINITY, -INFINITY};

  // Stream rows in chunks; transform each splat into the planar layout.
  const size_t CHUNK = 4096;
  std::vector<float> buf(CHUNK * props);
  long done = 0;
  while (done < n) {
    size_t take = (size_t)((n - done < (long)CHUNK) ? n - done : (long)CHUNK);
    if (fread(buf.data(), sizeof(float), take * props, f) != take * props) {
      fclose(f);
      // release memsets the whole struct — write the error AFTER it or
      // the caller reads an empty message.
      gsply_release(s);
      snprintf(s->error, sizeof s->error, "Vertex data ends early (truncated file).");
      return 1;
    }
    for (size_t r = 0; r < take; ++r) {
      const float* row = buf.data() + r * props;
      const long i = done + (long)r;
      for (int c = 0; c < 3; ++c) {
        float v = row[off[c]];
        s->means[c * n + i] = v;
        if (v < bmin[c]) bmin[c] = v;
        if (v > bmax[c]) bmax[c] = v;
        s->scales[c * n + i] = std::exp(row[off[7 + c]]);
      }
      // rot_0 is the scalar part; normalize, then quantize (x,y,z,w).
      float qw = row[off[3]], qx = row[off[4]], qy = row[off[5]], qz = row[off[6]];
      float norm = std::sqrt(qw * qw + qx * qx + qy * qy + qz * qz);
      if (norm > 0) {
        qw /= norm; qx /= norm; qy /= norm; qz /= norm;
      }
      s->quats[i] = (quantize_byte((qx + 1.f) * 0.5f) << 24) |
                    (quantize_byte((qy + 1.f) * 0.5f) << 16) |
                    (quantize_byte((qz + 1.f) * 0.5f) << 8) |
                    quantize_byte((qw + 1.f) * 0.5f);
      s->opacities[i] = sigmoidf(row[off[13]]);
      for (int c = 0; c < 3; ++c) {
        const float dc = row[off[10 + c]];
        s->colors[c * n + i] = dc * 0.28209479177387814f + 0.5f;
        if (degree) {
          // band 0 = f_dc, bands 1.. = f_rest (planar per channel in the
          // file; [3][K][N] planar in the output).
          s->sh[(c * k + 0) * n + i] = dc;
          for (long j = 0; j < per_channel; ++j)
            s->sh[(c * k + 1 + j) * n + i] = row[rest[c * per_channel + j]];
        }
      }
    }
    done += (long)take;
  }
  fclose(f);
  memcpy(s->bounds_min, bmin, sizeof bmin);
  memcpy(s->bounds_max, bmax, sizeof bmax);
  return 0;
}

}  // extern "C"
