// Native isotropic-remeshing core.
//
// The reference delegates remeshing to the meshlabserver C++ binary via a
// subprocess + temp files (optim.py:34-52). This library provides the same
// Botsch-Kobbelt local operators in-process: one call runs a single
// iteration of split / collapse / flip / tangential-smooth on a triangle
// soup (reprojection onto the original surface stays on the Python side,
// which owns the spatial index). Sequential sweeps with local connectivity
// updates — exact, unlike the batched independent-set rounds of the Python
// fallback (drt_tpu/remesh/isotropic.py), and ~100x faster on 100k-face
// meshes.
//
// C ABI (ctypes): see remesh_iteration() at the bottom.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <array>
#include <unordered_map>
#include <unordered_set>
#include <algorithm>

namespace {

using V3 = std::array<double, 3>;
using Tri = std::array<int32_t, 3>;

inline V3 sub(const V3& a, const V3& b) {
  return {a[0] - b[0], a[1] - b[1], a[2] - b[2]};
}
inline V3 add(const V3& a, const V3& b) {
  return {a[0] + b[0], a[1] + b[1], a[2] + b[2]};
}
inline V3 mul(const V3& a, double s) { return {a[0] * s, a[1] * s, a[2] * s}; }
inline double dot(const V3& a, const V3& b) {
  return a[0] * b[0] + a[1] * b[1] + a[2] * b[2];
}
inline V3 cross(const V3& a, const V3& b) {
  return {a[1] * b[2] - a[2] * b[1], a[2] * b[0] - a[0] * b[2],
          a[0] * b[1] - a[1] * b[0]};
}
inline double norm(const V3& a) { return std::sqrt(dot(a, a)); }

inline uint64_t ekey(int32_t a, int32_t b) {
  if (a > b) std::swap(a, b);
  return (uint64_t(uint32_t(a)) << 32) | uint32_t(b);
}

struct Mesh {
  std::vector<V3> v;
  std::vector<Tri> f;
  std::vector<char> face_alive;
  // vertex -> incident alive faces
  std::vector<std::vector<int32_t>> vfaces;

  void build_incidence() {
    vfaces.assign(v.size(), {});
    for (int32_t fi = 0; fi < (int32_t)f.size(); ++fi) {
      if (!face_alive[fi]) continue;
      for (int c = 0; c < 3; ++c) vfaces[f[fi][c]].push_back(fi);
    }
  }

  void add_face(const Tri& t) {
    int32_t fi = (int32_t)f.size();
    f.push_back(t);
    face_alive.push_back(1);
    for (int c = 0; c < 3; ++c) vfaces[t[c]].push_back(fi);
  }

  void kill_face(int32_t fi) {
    face_alive[fi] = 0;
    for (int c = 0; c < 3; ++c) {
      auto& lst = vfaces[f[fi][c]];
      lst.erase(std::remove(lst.begin(), lst.end(), fi), lst.end());
    }
  }

  // neighbors of a via incident faces
  void neighbors(int32_t a, std::vector<int32_t>& out) const {
    out.clear();
    for (int32_t fi : vfaces[a]) {
      for (int c = 0; c < 3; ++c) {
        int32_t w = f[fi][c];
        if (w != a && std::find(out.begin(), out.end(), w) == out.end())
          out.push_back(w);
      }
    }
  }

  // the two faces sharing edge (a,b), -1 padded; returns count
  int edge_faces(int32_t a, int32_t b, int32_t out[2]) const {
    int n = 0;
    for (int32_t fi : vfaces[a]) {
      const Tri& t = f[fi];
      if (t[0] == b || t[1] == b || t[2] == b) {
        if (n < 2) out[n] = fi;
        ++n;
      }
    }
    return n;
  }
};

int32_t third_vertex(const Tri& t, int32_t a, int32_t b) {
  for (int c = 0; c < 3; ++c)
    if (t[c] != a && t[c] != b) return t[c];
  return -1;
}

// true iff an alive face over exactly the vertex set {x, y, z} exists
bool has_face(const Mesh& m, int32_t x, int32_t y, int32_t z) {
  for (int32_t fi : m.vfaces[x]) {
    const Tri& t = m.f[fi];
    bool hy = false, hz = false;
    for (int c = 0; c < 3; ++c) {
      hy |= t[c] == y;
      hz |= t[c] == z;
    }
    if (hy && hz) return true;
  }
  return false;
}

// ---- original-surface distance guard --------------------------------------
//
// The reference's meshlabserver filter runs with CheckSurfDist=true and
// MaxSurfDist=1 (absolute units, optim.py:16-17 of the MLX script): every
// local operation must leave the surface within MaxSurfDist of the ORIGINAL
// mesh. Without this guard, coarse-target collapses eat thin features (the
// mouse's tail, the hand's fingers) and each LOD pass drifts the surface.
// SurfaceGrid is a uniform-grid point-to-triangle threshold query over the
// input mesh: within(p, maxd) <=> dist(p, original surface) <= maxd.

double point_tri_dist2(const V3& p, const V3& a, const V3& b, const V3& c) {
  // Ericson, Real-Time Collision Detection, closest point on triangle.
  V3 ab = sub(b, a), ac = sub(c, a), ap = sub(p, a);
  double d1 = dot(ab, ap), d2 = dot(ac, ap);
  if (d1 <= 0 && d2 <= 0) { V3 d = sub(p, a); return dot(d, d); }
  V3 bp = sub(p, b);
  double d3 = dot(ab, bp), d4 = dot(ac, bp);
  if (d3 >= 0 && d4 <= d3) { V3 d = sub(p, b); return dot(d, d); }
  double vc = d1 * d4 - d3 * d2;
  if (vc <= 0 && d1 >= 0 && d3 <= 0) {
    double t = d1 / (d1 - d3);
    V3 d = sub(p, add(a, mul(ab, t)));
    return dot(d, d);
  }
  V3 cp = sub(p, c);
  double d5 = dot(ab, cp), d6 = dot(ac, cp);
  if (d6 >= 0 && d5 <= d6) { V3 d = sub(p, c); return dot(d, d); }
  double vb = d5 * d2 - d1 * d6;
  if (vb <= 0 && d2 >= 0 && d6 <= 0) {
    double t = d2 / (d2 - d6);
    V3 d = sub(p, add(a, mul(ac, t)));
    return dot(d, d);
  }
  double va = d3 * d6 - d5 * d4;
  if (va <= 0 && (d4 - d3) >= 0 && (d5 - d6) >= 0) {
    double t = (d4 - d3) / ((d4 - d3) + (d5 - d6));
    V3 d = sub(p, add(b, mul(sub(c, b), t)));
    return dot(d, d);
  }
  double denom = 1.0 / (va + vb + vc);
  double v = vb * denom, w = vc * denom;
  V3 q = add(a, add(mul(ab, v), mul(ac, w)));
  V3 d = sub(p, q);
  return dot(d, d);
}

struct SurfaceGrid {
  std::vector<V3> v;
  std::vector<Tri> f;
  V3 lo{0, 0, 0};
  double cell = 1.0;
  int nx = 1, ny = 1, nz = 1;
  std::vector<std::vector<int32_t>> bins;
  bool enabled = false;

  void build(const double* v_in, int64_t nv, const int32_t* f_in, int64_t nf,
             double maxd) {
    if (maxd <= 0 || nv == 0 || nf == 0) return;
    enabled = true;
    v.resize(nv);
    std::memcpy(v.data(), v_in, sizeof(double) * 3 * nv);
    f.resize(nf);
    std::memcpy(f.data(), f_in, sizeof(int32_t) * 3 * nf);
    V3 hi = v[0];
    lo = v[0];
    for (const V3& p : v)
      for (int k = 0; k < 3; ++k) {
        lo[k] = std::min(lo[k], p[k]);
        hi[k] = std::max(hi[k], p[k]);
      }
    double diag = norm(sub(hi, lo));
    // cell >= 2*maxd keeps threshold queries to <= 2 cells per axis;
    // cap the grid at 96^3 for degenerate maxd values.
    cell = std::max(2.0 * maxd, diag / 96.0);
    nx = std::max(1, (int)((hi[0] - lo[0]) / cell) + 1);
    ny = std::max(1, (int)((hi[1] - lo[1]) / cell) + 1);
    nz = std::max(1, (int)((hi[2] - lo[2]) / cell) + 1);
    bins.assign((size_t)nx * ny * nz, {});
    for (int32_t fi = 0; fi < (int32_t)f.size(); ++fi) {
      V3 a = v[f[fi][0]], b = v[f[fi][1]], c = v[f[fi][2]];
      int cl[3], ch[3];
      for (int k = 0; k < 3; ++k) {
        double mn = std::min({a[k], b[k], c[k]});
        double mx = std::max({a[k], b[k], c[k]});
        cl[k] = clampi((int)((mn - lo[k]) / cell), k);
        ch[k] = clampi((int)((mx - lo[k]) / cell), k);
      }
      for (int x = cl[0]; x <= ch[0]; ++x)
        for (int y = cl[1]; y <= ch[1]; ++y)
          for (int z = cl[2]; z <= ch[2]; ++z)
            bins[((size_t)x * ny + y) * nz + z].push_back(fi);
    }
  }

  int clampi(int i, int axis) const {
    int n = axis == 0 ? nx : (axis == 1 ? ny : nz);
    return std::max(0, std::min(n - 1, i));
  }

  // true iff dist(p, surface) <= maxd (or the guard is disabled)
  bool within(const V3& p, double maxd) const {
    if (!enabled) return true;
    double m2 = maxd * maxd;
    int cl[3], ch[3];
    for (int k = 0; k < 3; ++k) {
      cl[k] = clampi((int)((p[k] - maxd - lo[k]) / cell), k);
      ch[k] = clampi((int)((p[k] + maxd - lo[k]) / cell), k);
    }
    for (int x = cl[0]; x <= ch[0]; ++x)
      for (int y = cl[1]; y <= ch[1]; ++y)
        for (int z = cl[2]; z <= ch[2]; ++z)
          for (int32_t fi : bins[((size_t)x * ny + y) * nz + z])
            if (point_tri_dist2(p, v[f[fi][0]], v[f[fi][1]], v[f[fi][2]])
                <= m2)
              return true;
    return false;
  }
};

// ---- split ---------------------------------------------------------------

void split_long_edges(Mesh& m, double lmax) {
  // collect unique edges once; splitting creates shorter edges, so a single
  // sweep plus handling of newly-created faces via a worklist of edges.
  std::vector<std::pair<int32_t, int32_t>> work;
  {
    std::unordered_set<uint64_t> seen;
    for (int32_t fi = 0; fi < (int32_t)m.f.size(); ++fi) {
      if (!m.face_alive[fi]) continue;
      const Tri& t = m.f[fi];
      for (int c = 0; c < 3; ++c) {
        int32_t a = t[c], b = t[(c + 1) % 3];
        if (seen.insert(ekey(a, b)).second) work.push_back({a, b});
      }
    }
  }
  for (size_t wi = 0; wi < work.size(); ++wi) {
    int32_t a = work[wi].first, b = work[wi].second;
    V3 pa = m.v[a], pb = m.v[b];
    if (norm(sub(pa, pb)) <= lmax) continue;
    int32_t fs[2];
    if (m.edge_faces(a, b, fs) != 2) continue;  // non-manifold / stale
    int32_t mid = (int32_t)m.v.size();
    m.v.push_back(mul(add(pa, pb), 0.5));
    m.vfaces.push_back({});
    for (int k = 0; k < 2; ++k) {
      int32_t fi = fs[k];
      Tri t = m.f[fi];
      int32_t c = third_vertex(t, a, b);
      m.kill_face(fi);
      // preserve winding: find position of a; check if b follows a
      int ia = (t[0] == a) ? 0 : (t[1] == a ? 1 : 2);
      bool ab = t[(ia + 1) % 3] == b;
      if (ab) {
        m.add_face({a, mid, c});
        m.add_face({mid, b, c});
      } else {
        m.add_face({a, c, mid});
        m.add_face({mid, c, b});
      }
      // the new cross edge mid-c may itself be long
      work.push_back({mid, c});
    }
    // halves of the split edge may still be long (original > 2*lmax)
    work.push_back({mid, a});
    work.push_back({mid, b});
  }
}

// ---- collapse ------------------------------------------------------------

void collapse_short_edges(Mesh& m, double lmin, double lmax,
                          const SurfaceGrid& grid, double maxd) {
  std::vector<std::pair<int32_t, int32_t>> work;
  {
    std::unordered_set<uint64_t> seen;
    for (int32_t fi = 0; fi < (int32_t)m.f.size(); ++fi) {
      if (!m.face_alive[fi]) continue;
      const Tri& t = m.f[fi];
      for (int c = 0; c < 3; ++c) {
        int32_t a = t[c], b = t[(c + 1) % 3];
        if (seen.insert(ekey(a, b)).second) work.push_back({a, b});
      }
    }
  }
  std::vector<int32_t> na, nb;
  for (size_t wi = 0; wi < work.size(); ++wi) {
    int32_t a = work[wi].first, b = work[wi].second;
    if (a == b) continue;
    if (m.vfaces[a].empty() || m.vfaces[b].empty()) continue;
    V3 pa = m.v[a], pb = m.v[b];
    if (norm(sub(pa, pb)) >= lmin) continue;
    int32_t fs[2];
    if (m.edge_faces(a, b, fs) != 2) continue;
    int32_t c1 = third_vertex(m.f[fs[0]], a, b);
    int32_t c2 = third_vertex(m.f[fs[1]], a, b);
    if (c1 == c2 || c1 < 0 || c2 < 0) continue;
    // link condition: N(a) ∩ N(b) == {c1, c2}
    m.neighbors(a, na);
    m.neighbors(b, nb);
    int inter = 0;
    bool bad = false;
    for (int32_t x : na) {
      if (std::find(nb.begin(), nb.end(), x) != nb.end()) {
        ++inter;
        if (x != c1 && x != c2) { bad = true; break; }
      }
    }
    if (bad || inter != 2) continue;
    // Duplicate-face guard (tetrahedron endgame): if faces {a,c1,c2} and
    // {b,c1,c2} both exist, rewriting b's faces to a would duplicate
    // {a,c1,c2} — a degenerate two-face "pillow" whose edges still count 2
    // (so edge-based watertight checks pass) but whose later split explodes
    // into 4-face edges. Observed on dog/pig carved inits (round 3).
    if (has_face(m, a, c1, c2) && has_face(m, b, c1, c2)) continue;
    V3 mid = mul(add(pa, pb), 0.5);
    // CheckSurfDist: the collapsed vertex must stay near the original
    // surface (meshlabserver MaxSurfDist, optim.py MLX script)
    if (!grid.within(mid, maxd)) continue;
    // no new over-long edges
    bool toolong = false;
    // CheckSurfDist on the re-formed ring: each surviving face around a/b
    // gets a corner moved to mid — its new centroid (and the midpoints of
    // its edges to mid) must stay near the original surface, otherwise a
    // rim collapse can bridge a concavity while its midpoint sits on the
    // surface (the interior of the new faces is what deviates).
    if (grid.enabled) {
      bool dev = false;
      for (int side = 0; side < 2 && !dev; ++side) {
        int32_t w = side == 0 ? a : b;
        for (int32_t fi : m.vfaces[w]) {
          if (fi == fs[0] || fi == fs[1]) continue;
          const Tri& t = m.f[fi];
          V3 q[3];
          for (int c2 = 0; c2 < 3; ++c2)
            q[c2] = (t[c2] == a || t[c2] == b) ? mid : m.v[t[c2]];
          V3 cen = mul(add(add(q[0], q[1]), q[2]), 1.0 / 3.0);
          if (!grid.within(cen, maxd)) { dev = true; break; }
        }
      }
      if (dev) continue;
    }
    for (int32_t x : na)
      if (x != b && norm(sub(m.v[x], mid)) > lmax) { toolong = true; break; }
    if (!toolong)
      for (int32_t x : nb)
        if (x != a && norm(sub(m.v[x], mid)) > lmax) { toolong = true; break; }
    if (toolong) continue;
    // normal-flip guard: faces around a and b must not invert
    bool flips = false;
    for (int32_t fi : m.vfaces[a]) {
      const Tri& t = m.f[fi];
      if (fi == fs[0] || fi == fs[1]) continue;
      V3 p0 = m.v[t[0]], p1 = m.v[t[1]], p2 = m.v[t[2]];
      V3 n_old = cross(sub(p1, p0), sub(p2, p0));
      V3 q0 = (t[0] == a) ? mid : p0;
      V3 q1 = (t[1] == a) ? mid : p1;
      V3 q2 = (t[2] == a) ? mid : p2;
      V3 n_new = cross(sub(q1, q0), sub(q2, q0));
      if (dot(n_old, n_new) <= 0) { flips = true; break; }
    }
    if (!flips) {
      for (int32_t fi : m.vfaces[b]) {
        const Tri& t = m.f[fi];
        if (fi == fs[0] || fi == fs[1]) continue;
        V3 p0 = m.v[t[0]], p1 = m.v[t[1]], p2 = m.v[t[2]];
        V3 n_old = cross(sub(p1, p0), sub(p2, p0));
        V3 q0 = (t[0] == b) ? mid : p0;
        V3 q1 = (t[1] == b) ? mid : p1;
        V3 q2 = (t[2] == b) ? mid : p2;
        V3 n_new = cross(sub(q1, q0), sub(q2, q0));
        if (dot(n_old, n_new) <= 0) { flips = true; break; }
      }
    }
    if (flips) continue;
    // perform: b -> a, a moves to mid
    m.v[a] = mid;
    m.kill_face(fs[0]);
    m.kill_face(fs[1]);
    // rewrite b's faces to a
    std::vector<int32_t> bf = m.vfaces[b];
    for (int32_t fi : bf) {
      m.kill_face(fi);
      Tri t = m.f[fi];
      for (int c = 0; c < 3; ++c)
        if (t[c] == b) t[c] = a;
      m.add_face(t);
    }
    // re-examine edges around the merged vertex
    m.neighbors(a, na);
    for (int32_t x : na) work.push_back({a, x});
  }
}

// ---- flip ----------------------------------------------------------------

void flip_edges(Mesh& m, const SurfaceGrid& grid, double maxd) {
  std::vector<int32_t> valence(m.v.size(), 0);
  {
    std::unordered_set<uint64_t> seen;
    for (int32_t fi = 0; fi < (int32_t)m.f.size(); ++fi) {
      if (!m.face_alive[fi]) continue;
      const Tri& t = m.f[fi];
      for (int c = 0; c < 3; ++c) {
        int32_t a = t[c], b = t[(c + 1) % 3];
        if (seen.insert(ekey(a, b)).second) {
          valence[a]++;
          valence[b]++;
        }
      }
    }
  }
  auto dev = [](int32_t x) { int d = x - 6; return d * d; };

  std::vector<std::pair<int32_t, int32_t>> work;
  {
    std::unordered_set<uint64_t> seen;
    for (int32_t fi = 0; fi < (int32_t)m.f.size(); ++fi) {
      if (!m.face_alive[fi]) continue;
      const Tri& t = m.f[fi];
      for (int c = 0; c < 3; ++c) {
        int32_t a = t[c], b = t[(c + 1) % 3];
        if (seen.insert(ekey(a, b)).second) work.push_back({a, b});
      }
    }
  }
  for (auto& [a, b] : work) {
    int32_t fs[2];
    if (m.edge_faces(a, b, fs) != 2) continue;
    int32_t c = third_vertex(m.f[fs[0]], a, b);
    int32_t d = third_vertex(m.f[fs[1]], a, b);
    if (c < 0 || d < 0 || c == d) continue;
    int32_t cd[2];
    if (m.edge_faces(c, d, cd) != 0) continue;  // edge c-d already exists
    int before = dev(valence[a]) + dev(valence[b]) + dev(valence[c]) +
                 dev(valence[d]);
    int after = dev(valence[a] - 1) + dev(valence[b] - 1) +
                dev(valence[c] + 1) + dev(valence[d] + 1);
    if (after >= before) continue;
    // geometric guard: keep orientation consistent
    V3 pa = m.v[a], pb = m.v[b], pc = m.v[c], pd = m.v[d];
    V3 n_old = add(cross(sub(pb, pa), sub(pc, pa)),
                   cross(sub(pa, pb), sub(pd, pb)));
    V3 n1 = cross(sub(pa, pc), sub(pd, pc));
    V3 n2 = cross(sub(pb, pd), sub(pc, pd));
    // degenerate new triangles guard
    if (norm(n1) < 1e-14 || norm(n2) < 1e-14) continue;
    if (dot(n1, n_old) <= 0 || dot(n2, n_old) <= 0) continue;
    // CheckSurfDist: the new edge's midpoint and both new face centroids
    // must stay near the original surface (a flip across a ridge bridges
    // concavities otherwise)
    if (!grid.within(mul(add(pc, pd), 0.5), maxd)) continue;
    if (grid.enabled) {
      V3 cen1 = mul(add(add(pa, pd), pc), 1.0 / 3.0);
      V3 cen2 = mul(add(add(pb, pc), pd), 1.0 / 3.0);
      if (!grid.within(cen1, maxd) || !grid.within(cen2, maxd)) continue;
    }
    Tri t1 = m.f[fs[0]];
    int ia = (t1[0] == a) ? 0 : (t1[1] == a ? 1 : 2);
    bool ab = t1[(ia + 1) % 3] == b;
    m.kill_face(fs[0]);
    m.kill_face(fs[1]);
    if (ab) {
      m.add_face({a, d, c});
      m.add_face({b, c, d});
    } else {
      m.add_face({a, c, d});
      m.add_face({b, d, c});
    }
    valence[a]--; valence[b]--; valence[c]++; valence[d]++;
  }
}

// ---- smooth --------------------------------------------------------------

void tangential_smooth(Mesh& m, double lam) {
  size_t n = m.v.size();
  std::vector<V3> sum(n, {0, 0, 0});
  std::vector<int> cnt(n, 0);
  std::vector<V3> vn(n, {0, 0, 0});
  std::unordered_set<uint64_t> seen;
  for (int32_t fi = 0; fi < (int32_t)m.f.size(); ++fi) {
    if (!m.face_alive[fi]) continue;
    const Tri& t = m.f[fi];
    V3 fnorm = cross(sub(m.v[t[1]], m.v[t[0]]), sub(m.v[t[2]], m.v[t[0]]));
    for (int c = 0; c < 3; ++c) {
      vn[t[c]] = add(vn[t[c]], fnorm);
      int32_t a = t[c], b = t[(c + 1) % 3];
      if (seen.insert(ekey(a, b)).second) {
        sum[a] = add(sum[a], m.v[b]);
        sum[b] = add(sum[b], m.v[a]);
        cnt[a]++;
        cnt[b]++;
      }
    }
  }
  for (size_t i = 0; i < n; ++i) {
    if (!cnt[i]) continue;
    V3 avg = mul(sum[i], 1.0 / cnt[i]);
    V3 nrm = vn[i];
    double ln = norm(nrm);
    if (ln > 1e-20) nrm = mul(nrm, 1.0 / ln);
    V3 d = sub(avg, m.v[i]);
    V3 d_tan = sub(d, mul(nrm, dot(d, nrm)));
    m.v[i] = add(m.v[i], mul(d_tan, lam));
  }
}

}  // namespace

extern "C" {

// One Botsch-Kobbelt iteration (split -> collapse -> flip -> smooth).
// In:  v_in [nv*3] double, f_in [nf*3] int32, target_len, smooth_lambda;
//      orig_v/orig_f: the ORIGINAL surface for the CheckSurfDist guard
//      (meshlabserver MaxSurfDist semantics) — pass max_surf_dist <= 0 to
//      disable the guard.
// Out: v_out (capacity cap_v*3), f_out (capacity cap_f*3).
// Returns 0 on success and writes *nv_out/*nf_out; returns -1 if capacity
// is insufficient (caller should retry with more).
int remesh_iteration(const double* v_in, int64_t nv, const int32_t* f_in,
                     int64_t nf, double target_len, double smooth_lambda,
                     const double* orig_v, int64_t orig_nv,
                     const int32_t* orig_f, int64_t orig_nf,
                     double max_surf_dist,
                     double* v_out, int64_t cap_v, int64_t* nv_out,
                     int32_t* f_out, int64_t cap_f, int64_t* nf_out) {
  Mesh m;
  m.v.resize(nv);
  std::memcpy(m.v.data(), v_in, sizeof(double) * 3 * nv);
  m.f.resize(nf);
  std::memcpy(m.f.data(), f_in, sizeof(int32_t) * 3 * nf);
  m.face_alive.assign(nf, 1);
  m.build_incidence();

  SurfaceGrid grid;
  grid.build(orig_v, orig_nv, orig_f, orig_nf, max_surf_dist);

  const double lmax = 4.0 / 3.0 * target_len;
  const double lmin = 4.0 / 5.0 * target_len;
  split_long_edges(m, lmax);
  collapse_short_edges(m, lmin, lmax, grid, max_surf_dist);
  flip_edges(m, grid, max_surf_dist);
  tangential_smooth(m, smooth_lambda);

  // compact
  std::vector<int32_t> vmap(m.v.size(), -1);
  int64_t nv2 = 0, nf2 = 0;
  for (int32_t fi = 0; fi < (int32_t)m.f.size(); ++fi)
    if (m.face_alive[fi]) ++nf2;
  if (nf2 > cap_f) return -1;
  for (int32_t fi = 0; fi < (int32_t)m.f.size(); ++fi) {
    if (!m.face_alive[fi]) continue;
    for (int c = 0; c < 3; ++c) {
      int32_t vi = m.f[fi][c];
      if (vmap[vi] < 0) {
        if (nv2 >= cap_v) return -1;
        vmap[vi] = (int32_t)nv2;
        std::memcpy(v_out + 3 * nv2, m.v[vi].data(), sizeof(double) * 3);
        ++nv2;
      }
    }
  }
  int64_t fo = 0;
  for (int32_t fi = 0; fi < (int32_t)m.f.size(); ++fi) {
    if (!m.face_alive[fi]) continue;
    for (int c = 0; c < 3; ++c) f_out[3 * fo + c] = vmap[m.f[fi][c]];
    ++fo;
  }
  *nv_out = nv2;
  *nf_out = nf2;
  return 0;
}

}  // extern "C"
