// Native runtime pieces for foundationpose_cpp_tpu.
//
// The reference implements its entire runtime in C++ (mesh loading via
// Assimp, assimp_mesh_loader.cpp; IO and pipeline plumbing via
// EasyDeployTool). The TPU compute path here is JAX/XLA/Pallas, but the
// host-side runtime keeps native equivalents:
//
//  - fp_parse_obj: allocation-lean OBJ parser with the same semantics as
//    the Python meshio fallback (vertex dedup on the full (v, vt, vn)
//    triple = assimp JoinIdenticalVertices; fan triangulation =
//    aiProcess_Triangulate). Big scanned meshes (BundleSDF outputs, README
//    config #4) parse ~30x faster than the pure-Python path.
//  - fp_parse_ply: ascii / binary_little_endian PLY parser with the same
//    semantics as the Python fallback (x,y,z[,nx,ny,nz][,u|s,v|t] vertex
//    properties in any order, fan-triangulated face lists, TextureFile
//    comment). BundleSDF scan outputs are typically PLY; the Python
//    binary path decodes one struct field at a time and dominates scan
//    load time (~1.2 s for a 105k-face scan; this parser is ~50x faster).
//    Unsupported shapes (big-endian, list-typed vertex properties) return
//    nullptr and the caller falls back to Python.
//  - fp_mesh_diameter: O(V) farthest-pair HEURISTIC (13-direction extreme
//    seeding + hill climb, exact-verified only for V <= 4096) for callers
//    that prefer speed over the exactness guarantee.
//  - fp_diameter_exact: EXACT threaded pairwise max; the production
//    loader calls it on the convex-hull vertices (mesh_loader.py
//    mesh_diameter). Both replace the reference's O(V^2) loop
//    (assimp_mesh_loader.cpp:47-60).
//  - fp_ring_*: a single-producer single-consumer frame ring for the async
//    tracking loop (the reference's async_pipeline/IPipelinePackage role):
//    a camera thread deposits frames while the TPU thread consumes the
//    newest, dropping stale ones.
//
// Exposed as a plain C ABI consumed through ctypes (no pybind11 in the
// image). All returned buffers are owned by the library and freed with
// fp_free_mesh.

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

extern "C" {

struct FpMesh {
  float* positions;   // V*3
  float* normals;     // V*3 (zeros when absent; caller may recompute)
  float* uvs;         // V*2 (zeros when absent)
  int32_t* faces;     // F*3
  int64_t num_vertices;
  int64_t num_faces;
  int32_t has_normals;
  int32_t has_uvs;
  char texture_path[1024];  // resolved map_Kd from the MTL chain, or ""
};

}  // extern "C"

namespace {

struct Key {
  int64_t v, t, n;
  bool operator==(const Key& o) const { return v == o.v && t == o.t && n == o.n; }
};
struct KeyHash {
  size_t operator()(const Key& k) const {
    size_t h = std::hash<int64_t>()(k.v);
    h = h * 1000003u ^ std::hash<int64_t>()(k.t);
    h = h * 1000003u ^ std::hash<int64_t>()(k.n);
    return h;
  }
};

// fast float parser over a char cursor (strtof handles all OBJ floats)
inline float read_float(const char*& p) {
  char* end = nullptr;
  float v = strtof(p, &end);
  p = end;
  return v;
}

inline int64_t read_int(const char*& p) {
  char* end = nullptr;
  long long v = strtoll(p, &end, 10);
  p = end;
  return (int64_t)v;
}

inline void skip_ws(const char*& p, const char* e) {
  while (p < e && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
}

FpMesh* make_mesh(std::vector<float>& pos, std::vector<float>& nrm,
                  std::vector<float>& uv, std::vector<int32_t>& faces,
                  bool has_n, bool has_t, const std::string& texpath) {
  auto* m = new FpMesh();
  m->num_vertices = (int64_t)pos.size() / 3;
  m->num_faces = (int64_t)faces.size() / 3;
  m->has_normals = has_n ? 1 : 0;
  m->has_uvs = has_t ? 1 : 0;
  m->positions = new float[pos.size()];
  memcpy(m->positions, pos.data(), pos.size() * sizeof(float));
  m->normals = new float[m->num_vertices * 3]();
  if (has_n) memcpy(m->normals, nrm.data(), nrm.size() * sizeof(float));
  m->uvs = new float[m->num_vertices * 2]();
  if (has_t) memcpy(m->uvs, uv.data(), uv.size() * sizeof(float));
  m->faces = new int32_t[faces.size()];
  memcpy(m->faces, faces.data(), faces.size() * sizeof(int32_t));
  snprintf(m->texture_path, sizeof(m->texture_path), "%s", texpath.c_str());
  return m;
}

std::string dirname_of(const std::string& path) {
  size_t s = path.find_last_of("/\\");
  return s == std::string::npos ? std::string(".") : path.substr(0, s);
}

std::string parse_mtl_map_kd(const std::string& mtl_path) {
  FILE* f = fopen(mtl_path.c_str(), "rb");
  if (!f) return "";
  std::string result;
  char line[4096];
  while (fgets(line, sizeof(line), f)) {
    const char* p = line;
    while (*p == ' ' || *p == '\t') ++p;
    if (strncasecmp(p, "map_kd", 6) == 0) {
      p += 6;
      while (*p == ' ' || *p == '\t') ++p;
      std::string name(p);
      while (!name.empty() && (name.back() == '\n' || name.back() == '\r' ||
                               name.back() == ' '))
        name.pop_back();
      // take the last token (map_Kd may carry options)
      size_t sp = name.find_last_of(" \t");
      if (sp != std::string::npos) name = name.substr(sp + 1);
      result = dirname_of(mtl_path) + "/" + name;
      break;
    }
  }
  fclose(f);
  return result;
}

}  // namespace

extern "C" {

// Parse an OBJ file. Returns nullptr on failure. No C++ exception may
// escape the C ABI into ctypes (that would terminate the process), so the
// whole body is wrapped.
FpMesh* fp_parse_obj(const char* path) try {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  if (size < 0) {  // e.g. a directory named foo.obj opens but ftell fails
    fclose(f);
    return nullptr;
  }
  fseek(f, 0, SEEK_SET);
  std::string buf;
  buf.resize((size_t)size);
  if (size > 0 && fread(&buf[0], 1, (size_t)size, f) != (size_t)size) {
    fclose(f);
    return nullptr;
  }
  fclose(f);

  std::vector<float> vs, vts, vns;      // raw streams
  std::vector<float> pos, uv, nrm;      // deduped output streams
  std::vector<int32_t> faces;
  std::unordered_map<Key, int32_t, KeyHash> dedup;
  dedup.reserve(1 << 16);
  std::string texpath;
  bool any_t = false, any_n = false, miss_n = false;

  const char* p = buf.data();
  const char* e = p + buf.size();
  std::vector<int32_t> poly;
  while (p < e) {
    const char* line_end = (const char*)memchr(p, '\n', (size_t)(e - p));
    if (!line_end) line_end = e;
    skip_ws(p, line_end);
    if (p + 1 < line_end && p[0] == 'v' && (p[1] == ' ' || p[1] == '\t')) {
      p += 2;
      vs.push_back(read_float(p));
      vs.push_back(read_float(p));
      vs.push_back(read_float(p));
    } else if (p + 2 < line_end && p[0] == 'v' && p[1] == 't') {
      p += 3;
      float u = read_float(p);
      skip_ws(p, line_end);
      float v = (p < line_end && *p != '\n') ? read_float(p) : 0.0f;
      vts.push_back(u);
      vts.push_back(v);
    } else if (p + 2 < line_end && p[0] == 'v' && p[1] == 'n') {
      p += 3;
      vns.push_back(read_float(p));
      vns.push_back(read_float(p));
      vns.push_back(read_float(p));
    } else if (p < line_end && p[0] == 'f' &&
               (p + 1 == line_end || p[1] == ' ' || p[1] == '\t')) {
      p += 1;
      poly.clear();
      while (true) {
        skip_ws(p, line_end);
        if (p >= line_end || *p == '\n' || *p == '#') break;
        int64_t vi = read_int(p);
        int64_t ti = 0, ni = 0;
        if (p < line_end && *p == '/') {
          ++p;
          if (p < line_end && *p != '/') ti = read_int(p);
          if (p < line_end && *p == '/') {
            ++p;
            ni = read_int(p);
          }
        }
        int64_t nv = (int64_t)vs.size() / 3;
        int64_t nt = (int64_t)vts.size() / 2;
        int64_t nn = (int64_t)vns.size() / 3;
        vi = vi > 0 ? vi - 1 : nv + vi;
        ti = ti > 0 ? ti - 1 : (ti < 0 ? nt + ti : -1);
        ni = ni > 0 ? ni - 1 : (ni < 0 ? nn + ni : -1);
        if (vi < 0 || vi >= nv) break;
        Key k{vi, ti, ni};
        auto it = dedup.find(k);
        int32_t idx;
        if (it != dedup.end()) {
          idx = it->second;
        } else {
          idx = (int32_t)(pos.size() / 3);
          pos.push_back(vs[vi * 3 + 0]);
          pos.push_back(vs[vi * 3 + 1]);
          pos.push_back(vs[vi * 3 + 2]);
          if (ti >= 0 && ti < nt) {
            uv.push_back(vts[ti * 2 + 0]);
            uv.push_back(vts[ti * 2 + 1]);
            any_t = true;
          } else {
            uv.push_back(0.0f);
            uv.push_back(0.0f);
          }
          if (ni >= 0 && ni < nn) {
            nrm.push_back(vns[ni * 3 + 0]);
            nrm.push_back(vns[ni * 3 + 1]);
            nrm.push_back(vns[ni * 3 + 2]);
            any_n = true;
          } else {
            nrm.push_back(0.0f);
            nrm.push_back(0.0f);
            nrm.push_back(0.0f);
            miss_n = true;
          }
          dedup.emplace(k, idx);
        }
        poly.push_back(idx);
      }
      for (size_t i = 1; i + 1 < poly.size(); ++i) {  // fan triangulation
        faces.push_back(poly[0]);
        faces.push_back(poly[i]);
        faces.push_back(poly[i + 1]);
      }
    } else if (line_end - p > 7 && strncmp(p, "mtllib", 6) == 0 &&
               (p[6] == ' ' || p[6] == '\t') && texpath.empty()) {
      // tag may be followed by space OR tab (both are OBJ whitespace; the
      // Python fallback's line.split() accepts both)
      std::string name(p + 7, (size_t)(line_end - p - 7));
      while (!name.empty() && (name.front() == ' ' || name.front() == '\t'))
        name.erase(name.begin());
      while (!name.empty() && (name.back() == '\r' || name.back() == ' ' ||
                               name.back() == '\t'))
        name.pop_back();
      texpath = parse_mtl_map_kd(dirname_of(path) + "/" + name);
    }
    p = line_end + 1;
  }

  if (pos.empty() || faces.empty()) return nullptr;
  // match the Python fallback's rule: normals count only when EVERY output
  // vertex carried one (a partial set would leave zero-normals that shade
  // black); uvs count when ANY vertex carried one (missing ones are (0,0))
  return make_mesh(pos, nrm, uv, faces, any_n && !miss_n, any_t, texpath);
} catch (...) {
  return nullptr;  // bad_alloc/length_error must not cross into ctypes
}

// ---------------------------------------------------------------------------
// PLY parser (fp_parse_ply)

namespace {

enum PlyType : int {
  PT_F32, PT_F64, PT_U8, PT_I8, PT_U16, PT_I16, PT_U32, PT_I32, PT_BAD
};

struct PlyProp {
  std::string name;
  PlyType type = PT_BAD;
  bool is_list = false;
  PlyType count_type = PT_BAD;  // list count type
};

struct PlyElement {
  std::string name;
  int64_t count = 0;
  std::vector<PlyProp> props;
};

PlyType ply_type(const std::string& t) {
  if (t == "float" || t == "float32") return PT_F32;
  if (t == "double" || t == "float64") return PT_F64;
  if (t == "uchar" || t == "uint8") return PT_U8;
  if (t == "char" || t == "int8") return PT_I8;
  if (t == "ushort" || t == "uint16") return PT_U16;
  if (t == "short" || t == "int16") return PT_I16;
  if (t == "uint" || t == "uint32") return PT_U32;
  if (t == "int" || t == "int32") return PT_I32;
  return PT_BAD;
}

inline size_t ply_size(PlyType t) {
  switch (t) {
    case PT_F32: case PT_U32: case PT_I32: return 4;
    case PT_F64: return 8;
    case PT_U8: case PT_I8: return 1;
    case PT_U16: case PT_I16: return 2;
    default: return 0;
  }
}

// little-endian scalar load (host is LE on every supported platform)
inline double ply_load(const uint8_t* p, PlyType t) {
  switch (t) {
    case PT_F32: { float v; memcpy(&v, p, 4); return v; }
    case PT_F64: { double v; memcpy(&v, p, 8); return v; }
    case PT_U8: return *p;
    case PT_I8: return (int8_t)*p;
    case PT_U16: { uint16_t v; memcpy(&v, p, 2); return v; }
    case PT_I16: { int16_t v; memcpy(&v, p, 2); return v; }
    case PT_U32: { uint32_t v; memcpy(&v, p, 4); return v; }
    case PT_I32: { int32_t v; memcpy(&v, p, 4); return v; }
    default: return 0.0;
  }
}

}  // namespace

FpMesh* fp_parse_ply(const char* path) try {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  if (size < 0) { fclose(f); return nullptr; }
  fseek(f, 0, SEEK_SET);
  std::string buf;
  buf.resize((size_t)size);
  if (size > 0 && fread(&buf[0], 1, (size_t)size, f) != (size_t)size) {
    fclose(f);
    return nullptr;
  }
  fclose(f);

  size_t hdr_end = buf.find("end_header\n");
  if (hdr_end == std::string::npos) return nullptr;
  size_t body_off = hdr_end + strlen("end_header\n");

  bool ascii = false, binary_le = false;
  std::vector<PlyElement> elements;
  std::string texpath;
  {
    size_t pos_l = 0;
    while (pos_l < hdr_end) {
      size_t nl = buf.find('\n', pos_l);
      if (nl == std::string::npos || nl > hdr_end) nl = hdr_end;
      std::string line = buf.substr(pos_l, nl - pos_l);
      pos_l = nl + 1;
      if (!line.empty() && line.back() == '\r') line.pop_back();
      // tokenize
      std::vector<std::string> tok;
      size_t i = 0;
      while (i < line.size()) {
        while (i < line.size() && (line[i] == ' ' || line[i] == '\t')) ++i;
        size_t j = i;
        while (j < line.size() && line[j] != ' ' && line[j] != '\t') ++j;
        if (j > i) tok.push_back(line.substr(i, j - i));
        i = j;
      }
      if (tok.empty()) continue;
      if (tok[0] == "format" && tok.size() >= 2) {
        ascii = tok[1] == "ascii";
        binary_le = tok[1] == "binary_little_endian";
      } else if (tok[0] == "comment" && tok.size() >= 3 &&
                 (tok[1] == "TextureFile" || tok[1] == "texturefile" ||
                  tok[1] == "TextureName")) {
        std::string name = tok[2];
        for (size_t k = 3; k < tok.size(); ++k) name += " " + tok[k];
        texpath = dirname_of(path) + "/" + name;
      } else if (tok[0] == "element" && tok.size() >= 3) {
        PlyElement el;
        el.name = tok[1];
        el.count = strtoll(tok[2].c_str(), nullptr, 10);
        if (el.count < 0) return nullptr;
        elements.push_back(el);
      } else if (tok[0] == "property" && !elements.empty()) {
        PlyProp pr;
        if (tok.size() >= 5 && tok[1] == "list") {
          pr.is_list = true;
          pr.count_type = ply_type(tok[2]);
          pr.type = ply_type(tok[3]);
          pr.name = tok[4];
          if (pr.count_type == PT_BAD) return nullptr;
        } else if (tok.size() >= 3) {
          pr.type = ply_type(tok[1]);
          pr.name = tok[2];
        } else {
          return nullptr;
        }
        if (pr.type == PT_BAD) return nullptr;
        elements.back().props.push_back(pr);
      }
    }
  }
  if (!ascii && !binary_le) return nullptr;  // big-endian: Python fallback

  std::vector<float> pos, nrm, uv;
  std::vector<int32_t> faces;
  bool has_n = false, has_t = false;

  const char* p = buf.data() + body_off;
  const char* e = buf.data() + buf.size();

  for (const auto& el : elements) {
    const bool is_vertex = el.name == "vertex";
    const bool is_face = el.name == "face";
    // vertex record layout (binary): scalar props only, fixed stride
    int ox = -1, oy = -1, oz = -1, onx = -1, ony = -1, onz = -1, ou = -1,
        ov = -1;
    std::vector<int> offs;
    int stride = 0;
    bool fixed = true;
    for (const auto& pr : el.props) {
      offs.push_back(stride);
      if (pr.is_list) {
        fixed = false;
      } else {
        stride += (int)ply_size(pr.type);
      }
    }
    if (is_vertex) {
      if (!fixed) return nullptr;  // list-typed vertex prop: fallback
      for (size_t k = 0; k < el.props.size(); ++k) {
        const std::string& n = el.props[k].name;
        if (n == "x") ox = (int)k;
        else if (n == "y") oy = (int)k;
        else if (n == "z") oz = (int)k;
        else if (n == "nx") onx = (int)k;
        else if (n == "ny") ony = (int)k;
        else if (n == "nz") onz = (int)k;
        else if (n == "u" || n == "s") { if (ou < 0) ou = (int)k; }
        else if (n == "v" || n == "t") { if (ov < 0) ov = (int)k; }
      }
      if (ox < 0 || oy < 0 || oz < 0) return nullptr;
      // the ASCII reader's vals[] scratch holds 64 properties; exotic
      // vertex layouts beyond that fall back to the Python parser rather
      // than reading stale/out-of-bounds slots
      if (el.props.size() > 64) return nullptr;
      has_n = onx >= 0 && ony >= 0 && onz >= 0;
      has_t = ou >= 0 && ov >= 0;
      pos.reserve(pos.size() + el.count * 3);
    }

    if (ascii) {
      for (int64_t r = 0; r < el.count; ++r) {
        // one record per line
        const char* le = (const char*)memchr(p, '\n', (size_t)(e - p));
        if (!le) le = e;
        if (is_vertex) {
          double vals[64];
          const char* q = p;
          size_t np_ = el.props.size() < 64 ? el.props.size() : 64;
          for (size_t k = 0; k < np_; ++k) vals[k] = strtod(q, (char**)&q);
          pos.push_back((float)vals[ox]);
          pos.push_back((float)vals[oy]);
          pos.push_back((float)vals[oz]);
          if (has_n) {
            nrm.push_back((float)vals[onx]);
            nrm.push_back((float)vals[ony]);
            nrm.push_back((float)vals[onz]);
          }
          if (has_t) {
            uv.push_back((float)vals[ou]);
            uv.push_back((float)vals[ov]);
          }
        } else if (is_face) {
          const char* q = p;
          long long n = strtoll(q, (char**)&q, 10);
          if (n < 0 || n > 255) return nullptr;
          int32_t idx[256];
          for (long long k = 0; k < n; ++k)
            idx[k] = (int32_t)strtoll(q, (char**)&q, 10);
          for (long long k = 1; k + 1 < n; ++k) {
            faces.push_back(idx[0]);
            faces.push_back(idx[k]);
            faces.push_back(idx[k + 1]);
          }
        }
        p = le < e ? le + 1 : e;
      }
    } else {
      for (int64_t r = 0; r < el.count; ++r) {
        if (is_vertex) {
          if (p + stride > e) return nullptr;
          const uint8_t* rec = (const uint8_t*)p;
          auto val = [&](int k) {
            return ply_load(rec + offs[k], el.props[k].type);
          };
          pos.push_back((float)val(ox));
          pos.push_back((float)val(oy));
          pos.push_back((float)val(oz));
          if (has_n) {
            nrm.push_back((float)val(onx));
            nrm.push_back((float)val(ony));
            nrm.push_back((float)val(onz));
          }
          if (has_t) {
            uv.push_back((float)val(ou));
            uv.push_back((float)val(ov));
          }
          p += stride;
        } else {
          // generic record walk (faces and unknown elements alike); like
          // the Python fallback, the FIRST list property of a face record
          // carries the vertex indices, whatever its name
          int32_t idx[256];
          bool first_list = true;
          for (const auto& pr : el.props) {
            if (pr.is_list) {
              size_t csz = ply_size(pr.count_type);
              if (p + csz > e) return nullptr;
              long long n = (long long)ply_load((const uint8_t*)p,
                                                pr.count_type);
              p += csz;
              size_t isz = ply_size(pr.type);
              if (n < 0 || p + isz * n > e) return nullptr;
              if (is_face && first_list) {
                // >256-gon: bail to the Python parser (which fans any n)
                // rather than silently dropping the polygon -- matches
                // the ASCII path's rejection above
                if (n > 256) return nullptr;
                for (long long k = 0; k < n; ++k)
                  idx[k] = (int32_t)ply_load((const uint8_t*)p + isz * k,
                                             pr.type);
                for (long long k = 1; k + 1 < n; ++k) {
                  faces.push_back(idx[0]);
                  faces.push_back(idx[k]);
                  faces.push_back(idx[k + 1]);
                }
              }
              first_list = false;
              p += isz * n;
            } else {
              p += ply_size(pr.type);
              if (p > e) return nullptr;
            }
          }
        }
      }
    }
  }

  if (pos.empty() || faces.empty()) return nullptr;
  int64_t nv = (int64_t)pos.size() / 3;
  for (size_t i = 0; i < faces.size(); ++i)
    if (faces[i] < 0 || faces[i] >= nv) return nullptr;
  return make_mesh(pos, nrm, uv, faces, has_n, has_t, texpath);
} catch (...) {
  return nullptr;
}

void fp_free_mesh(FpMesh* m) {
  if (!m) return;
  delete[] m->positions;
  delete[] m->normals;
  delete[] m->uvs;
  delete[] m->faces;
  delete m;
}

// Farthest-pair HEURISTIC (not exact in general): extreme points along 13
// directions seed a hill climb of alternating farthest-point sweeps; a
// full O(V^2) verification runs only for V <= 4096, so large adversarial
// inputs can return an underestimate. The production mesh loader uses the
// exact Python mesh_diameter (hull + pairwise scan); see the header note.
double fp_mesh_diameter(const float* pos, int64_t v) {
  if (v < 2) return 0.0;
  // extremes along 13 directions form a candidate set whose pairwise max is
  // exact for convex position sets in practice; verify/refine with hill
  // climbing from the best pair.
  static const float dirs[13][3] = {
      {1, 0, 0}, {0, 1, 0}, {0, 0, 1}, {1, 1, 0}, {1, -1, 0}, {1, 0, 1},
      {1, 0, -1}, {0, 1, 1}, {0, 1, -1}, {1, 1, 1}, {1, 1, -1}, {1, -1, 1},
      {-1, 1, 1}};
  std::vector<int64_t> cand;
  for (auto& d : dirs) {
    int64_t lo = 0, hi = 0;
    float lov = 1e30f, hiv = -1e30f;
    for (int64_t i = 0; i < v; ++i) {
      float s = pos[i * 3] * d[0] + pos[i * 3 + 1] * d[1] + pos[i * 3 + 2] * d[2];
      if (s < lov) { lov = s; lo = i; }
      if (s > hiv) { hiv = s; hi = i; }
    }
    cand.push_back(lo);
    cand.push_back(hi);
  }
  auto dist2 = [&](int64_t a, int64_t b) {
    double dx = pos[a * 3] - pos[b * 3];
    double dy = pos[a * 3 + 1] - pos[b * 3 + 1];
    double dz = pos[a * 3 + 2] - pos[b * 3 + 2];
    return dx * dx + dy * dy + dz * dz;
  };
  double best = 0.0;
  int64_t ba = 0, bb = 0;
  for (size_t i = 0; i < cand.size(); ++i)
    for (size_t j = i + 1; j < cand.size(); ++j) {
      double d2 = dist2(cand[i], cand[j]);
      if (d2 > best) { best = d2; ba = cand[i]; bb = cand[j]; }
    }
  // hill climb: alternate farthest-point queries until fixed point (exact
  // diameter for all practical meshes; each sweep is O(V))
  for (int iter = 0; iter < 16; ++iter) {
    bool improved = false;
    int64_t fa = ba;
    for (int64_t i = 0; i < v; ++i)
      if (dist2(i, bb) > best) { best = dist2(i, bb); fa = i; improved = true; }
    ba = fa;
    int64_t fb = bb;
    for (int64_t i = 0; i < v; ++i)
      if (dist2(ba, i) > best) { best = dist2(ba, i); fb = i; improved = true; }
    bb = fb;
    if (!improved) break;
  }
  if (v <= 4096) {  // exact verification for small meshes
    for (int64_t i = 0; i < v; ++i)
      for (int64_t j = i + 1; j < v; ++j) {
        double d2 = dist2(i, j);
        if (d2 > best) best = d2;
      }
  }
  return std::sqrt(best);
}

// EXACT max pairwise distance over the given points (the caller passes
// convex-hull vertices, whose farthest pair equals the full set's --
// AssimpMeshLoader::CalcMeshDiameter semantics, assimp_mesh_loader.cpp:
// 47-60). Row-blocked and threaded: the inner j-loop is a straight-line
// float->double sweep g++ auto-vectorizes, so an ~18k-point scan hull
// (162M pairs) finishes in tens of milliseconds where the blockwise scipy
// cdist path took ~1.7 s. Distances accumulate in double from float
// inputs, bit-identical to the Python f64 path on f32 data.
double fp_diameter_exact(const float* pos, int64_t v) {
  if (v < 2) return 0.0;
  // SoA transpose: the inner sweep reads x/y/z as unit-stride double
  // streams, letting g++ vectorize the subtract/multiply/max chain. A
  // float d2 sweep would be faster, but f32 max accumulation can
  // tie-break differently than the Python f64 path; the double sweep
  // matches it bit-for-bit on f32 inputs (~1.3 ns/pair measured).
  std::vector<double> xs(v), ys(v), zs(v);
  for (int64_t i = 0; i < v; ++i) {
    xs[i] = pos[i * 3];
    ys[i] = pos[i * 3 + 1];
    zs[i] = pos[i * 3 + 2];
  }
  int nthreads = (int)std::thread::hardware_concurrency();
  if (nthreads < 1) nthreads = 1;
  if (nthreads > 16) nthreads = 16;
  if (v < 2048) nthreads = 1;
  std::vector<double> best(nthreads, 0.0);
  // interleaved rows balance the triangular workload (row i pairs with
  // v-1-i points; stride-nthreads assignment keeps threads within ~1 row
  // of each other instead of giving thread 0 all the long rows)
  auto worker = [&](int t) {
    double b = 0.0;
    for (int64_t i = t; i < v - 1; i += nthreads) {
      const double xi = xs[i], yi = ys[i], zi = zs[i];
      for (int64_t j = i + 1; j < v; ++j) {
        const double dx = xi - xs[j];
        const double dy = yi - ys[j];
        const double dz = zi - zs[j];
        const double d2 = dx * dx + dy * dy + dz * dz;
        if (d2 > b) b = d2;
      }
    }
    best[t] = b;
  };
  if (nthreads == 1) {
    worker(0);
  } else {
    std::vector<std::thread> ts;
    ts.reserve(nthreads);
    for (int t = 0; t < nthreads; ++t) ts.emplace_back(worker, t);
    for (auto& th : ts) th.join();
  }
  double b = 0.0;
  for (double x : best) b = std::max(b, x);
  return std::sqrt(b);
}

// ---------------------------------------------------------------------------
// SPSC frame ring (async tracking feeder)

// Ownership: `head` is producer-owned, `tail` is consumer-owned — neither
// side ever stores the other's index.  The producer never blocks: when the
// ring is full it simply overwrites the oldest slot (drop-oldest real-time
// policy).  Torn reads are prevented by a per-slot seqlock: the producer
// marks a slot odd while writing, and the consumer re-validates the
// sequence after its memcpy, retrying on a newer frame if the producer
// lapped it mid-copy.
struct FpRing {
  uint8_t* storage;
  std::atomic<uint64_t>* seq;  // per-slot seqlock; odd = write in progress
  int64_t frame_bytes;
  int64_t capacity;
  std::atomic<int64_t> head;  // next write index (producer-owned)
  std::atomic<int64_t> tail;  // next read index (consumer-owned)
  std::atomic<int64_t> dropped;
};

FpRing* fp_ring_create(int64_t frame_bytes, int64_t capacity) try {
  // capacity 0 would make every push/pop compute `x % 0` (SIGFPE); a
  // negative value corrupts the allocation size
  if (frame_bytes <= 0 || capacity <= 0) return nullptr;
  auto* r = new FpRing();
  r->storage = new uint8_t[frame_bytes * capacity];
  r->seq = new std::atomic<uint64_t>[capacity];
  for (int64_t i = 0; i < capacity; ++i) r->seq[i].store(0);
  r->frame_bytes = frame_bytes;
  r->capacity = capacity;
  r->head.store(0);
  r->tail.store(0);
  r->dropped.store(0);
  return r;
} catch (...) {
  return nullptr;  // bad_alloc must not cross into ctypes
}

void fp_ring_destroy(FpRing* r) {
  if (!r) return;
  delete[] r->storage;
  delete[] r->seq;
  delete r;
}

// producer: push a frame; overwrites the oldest when full (drop-oldest
// real-time policy, counted in `dropped`).  Never touches `tail`.
void fp_ring_push(FpRing* r, const uint8_t* frame) {
  int64_t h = r->head.load(std::memory_order_relaxed);
  int64_t t = r->tail.load(std::memory_order_acquire);
  if (h - t >= r->capacity)
    r->dropped.fetch_add(1, std::memory_order_relaxed);  // oldest overwritten
  int64_t slot = h % r->capacity;
  uint64_t s0 = r->seq[slot].load(std::memory_order_relaxed);
  r->seq[slot].store(s0 + 1, std::memory_order_relaxed);  // odd: writing
  std::atomic_thread_fence(std::memory_order_seq_cst);
  memcpy(r->storage + slot * r->frame_bytes, frame, (size_t)r->frame_bytes);
  std::atomic_thread_fence(std::memory_order_seq_cst);
  r->seq[slot].store(s0 + 2, std::memory_order_release);  // even: stable
  r->head.store(h + 1, std::memory_order_release);
}

// consumer: pop the NEWEST frame (skipping stale ones); returns number of
// frames skipped, or -1 if empty.  Seqlock-validated against mid-copy
// overwrite by a wrapping producer.
int64_t fp_ring_pop_latest(FpRing* r, uint8_t* out) {
  int64_t t = r->tail.load(std::memory_order_relaxed);
  for (int attempt = 0; attempt < 1024; ++attempt) {
    int64_t h = r->head.load(std::memory_order_acquire);
    if (t >= h) return -1;
    int64_t newest = h - 1;
    int64_t slot = newest % r->capacity;
    uint64_t s1 = r->seq[slot].load(std::memory_order_acquire);
    if (s1 & 1) continue;  // producer mid-write on this slot; re-read head
    memcpy(out, r->storage + slot * r->frame_bytes, (size_t)r->frame_bytes);
    std::atomic_thread_fence(std::memory_order_seq_cst);
    uint64_t s2 = r->seq[slot].load(std::memory_order_acquire);
    if (s1 == s2) {  // copy is coherent: slot untouched during memcpy
      r->tail.store(h, std::memory_order_release);
      return newest - t;  // frames skipped (incl. any overwritten)
    }
    // torn: producer lapped us mid-copy; retry against a fresher head
  }
  return -1;  // producer stalled mid-write; treat as empty
}

int64_t fp_ring_size(FpRing* r) {
  int64_t n = r->head.load(std::memory_order_acquire) -
              r->tail.load(std::memory_order_acquire);
  if (n < 0) n = 0;
  return n > r->capacity ? r->capacity : n;
}

int64_t fp_ring_dropped(FpRing* r) { return r->dropped.load(); }

}  // extern "C"
