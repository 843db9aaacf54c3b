// zrt_native — native runtime library for zrenderer-tpu.
//
// The reference links vendored C/C++ for its data path: cgltf (glTF parse),
// meshoptimizer (index/vertex-cache optimization), stb_image (image decode)
// — see SURVEY.md §2.2.  This library is the TPU-era equivalent, written
// from scratch: fast binary asset IO, mesh optimization (index
// deduplication, FIFO-cache-aware triangle reordering, LOD index
// generation groundwork), and PNG encode for high-rate frame dumping.
// Exposed as a plain C ABI consumed from Python via ctypes
// (zrenderer_tpu/utils/native.py).
//
// Build: cd native && make    (produces libzrt.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <vector>
#include <unordered_map>
#include <algorithm>
#include <utility>
#include <array>
#include <cmath>
#include <map>
#include <queue>
#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------------------
// Binary asset IO (the scene.bin / meshes.bin fast path)
// ---------------------------------------------------------------------------

// Validates a meshes.bin header and returns counts without loading data.
// Returns 0 on success, negative error code otherwise.
int zrt_meshes_probe(const uint8_t* data, uint64_t size,
                     uint32_t* num_meshes, uint32_t* num_vertices_f32,
                     uint32_t* num_indices) {
    if (size < 20) return -1;
    uint32_t magic, nm, dbs, isz, vsz;
    memcpy(&magic, data + 0, 4);
    memcpy(&nm, data + 4, 4);
    memcpy(&dbs, data + 8, 4);
    memcpy(&isz, data + 12, 4);
    memcpy(&vsz, data + 16, 4);
    if (magic != 0x12345678u) return -2;
    // Validate in 64-bit: nm * 148 wraps u32 for nm >= ~29M, which would
    // accept a crafted header and drive zrt_meshes_load out of bounds.
    if (nm > (size - 20) / 148) return -3;
    if ((uint64_t)dbs != 20 + (uint64_t)nm * 148) return -3;
    if ((uint64_t)dbs + vsz + isz > size) return -4;
    *num_meshes = nm;
    *num_vertices_f32 = vsz / 4;
    *num_indices = isz / 4;
    return 0;
}

// Copies the vertex/index blocks out of a meshes.bin blob (zero parse
// overhead beyond the header; the caller allocates from the probe sizes).
int zrt_meshes_load(const uint8_t* data, uint64_t size,
                    float* vertices_out, uint32_t* indices_out) {
    uint32_t nm, nvf, ni;
    int rc = zrt_meshes_probe(data, size, &nm, &nvf, &ni);
    if (rc != 0) return rc;
    uint64_t off = 20 + (uint64_t)nm * 148;
    memcpy(vertices_out, data + off, (uint64_t)nvf * 4);
    memcpy(indices_out, data + off + (uint64_t)nvf * 4, (uint64_t)ni * 4);
    return 0;
}

// ---------------------------------------------------------------------------
// Mesh optimization (the meshoptimizer-equivalent algorithms)
// ---------------------------------------------------------------------------

// Index generation: deduplicate identical vertices (bytewise) and remap the
// index buffer — the indexgenerator capability.  Returns the deduplicated
// vertex count; remap_out[i] = new index of original vertex i.
uint32_t zrt_generate_vertex_remap(const float* vertices,
                                   uint32_t vertex_count,
                                   uint32_t floats_per_vertex,
                                   uint32_t* remap_out) {
    struct KeyHash {
        size_t operator()(const std::vector<uint32_t>& k) const {
            size_t h = 1469598103934665603ull;
            for (uint32_t w : k) { h ^= w; h *= 1099511628211ull; }
            return h;
        }
    };
    std::unordered_map<std::vector<uint32_t>, uint32_t, KeyHash> seen;
    seen.reserve(vertex_count * 2);
    uint32_t next = 0;
    std::vector<uint32_t> key(floats_per_vertex);
    for (uint32_t i = 0; i < vertex_count; i++) {
        memcpy(key.data(), vertices + (uint64_t)i * floats_per_vertex,
               floats_per_vertex * 4);
        auto it = seen.find(key);
        if (it == seen.end()) {
            seen.emplace(key, next);
            remap_out[i] = next++;
        } else {
            remap_out[i] = it->second;
        }
    }
    return next;
}

// Apply a remap: compact vertices and rewrite indices in place.
void zrt_apply_remap(const float* vertices_in, float* vertices_out,
                     uint32_t vertex_count, uint32_t floats_per_vertex,
                     const uint32_t* remap, uint32_t* indices,
                     uint32_t index_count) {
    for (uint32_t i = 0; i < vertex_count; i++) {
        memcpy(vertices_out + (uint64_t)remap[i] * floats_per_vertex,
               vertices_in + (uint64_t)i * floats_per_vertex,
               floats_per_vertex * 4);
    }
    for (uint32_t i = 0; i < index_count; i++) indices[i] = remap[indices[i]];
}

// Vertex-cache-aware triangle reordering (FIFO cache score, greedy):
// the vcacheoptimizer capability.  Orders triangles to maximize re-use of
// recently used vertices.  In-place on the index buffer.
void zrt_optimize_vertex_cache(uint32_t* indices, uint32_t index_count,
                               uint32_t vertex_count, uint32_t cache_size) {
    if (cache_size == 0) cache_size = 32;
    uint32_t tri_count = index_count / 3;
    if (tri_count == 0) return;

    // Build vertex -> triangle adjacency.
    std::vector<uint32_t> valence(vertex_count, 0);
    for (uint32_t i = 0; i < index_count; i++) valence[indices[i]]++;
    std::vector<uint32_t> adj_offset(vertex_count + 1, 0);
    for (uint32_t v = 0; v < vertex_count; v++)
        adj_offset[v + 1] = adj_offset[v] + valence[v];
    std::vector<uint32_t> adj(index_count);
    {
        std::vector<uint32_t> fill(vertex_count, 0);
        for (uint32_t t = 0; t < tri_count; t++)
            for (int k = 0; k < 3; k++) {
                uint32_t v = indices[t * 3 + k];
                adj[adj_offset[v] + fill[v]++] = t;
            }
    }

    std::vector<uint8_t> emitted(tri_count, 0);
    std::vector<int32_t> cache_pos(vertex_count, -1);
    std::vector<uint32_t> fifo;           // FIFO cache of vertices
    std::vector<uint32_t> out;
    out.reserve(index_count);
    std::vector<uint32_t> live(valence);  // remaining un-emitted uses

    auto tri_score = [&](uint32_t t) -> int {
        int in_cache = 0;
        for (int k = 0; k < 3; k++)
            if (cache_pos[indices[t * 3 + k]] >= 0) in_cache++;
        return in_cache;
    };

    uint32_t emitted_count = 0;
    uint32_t cursor = 0;  // scan cursor for cold restarts
    while (emitted_count < tri_count) {
        int best = -1;
        int best_score = -1;
        // Prefer triangles touching cached vertices.
        for (uint32_t ci = 0; ci < fifo.size(); ci++) {
            uint32_t v = fifo[ci];
            for (uint32_t a = adj_offset[v]; a < adj_offset[v + 1]; a++) {
                uint32_t t = adj[a];
                if (emitted[t]) continue;
                int s = tri_score(t);
                if (s > best_score) { best_score = s; best = (int)t; }
            }
        }
        if (best < 0) {  // cold restart: next un-emitted triangle
            while (emitted[cursor]) cursor++;
            best = (int)cursor;
        }
        emitted[best] = 1;
        emitted_count++;
        for (int k = 0; k < 3; k++) {
            uint32_t v = indices[best * 3 + k];
            out.push_back(v);
            live[v]--;
            if (cache_pos[v] < 0) {
                fifo.push_back(v);
                cache_pos[v] = 1;
                if (fifo.size() > cache_size) {
                    cache_pos[fifo.front()] = -1;
                    fifo.erase(fifo.begin());
                }
            }
        }
    }
    memcpy(indices, out.data(), index_count * 4);
}

// Average cache miss rate (ACMR) of an index buffer for a FIFO cache —
// the vcacheanalyzer capability.  Returns misses per triangle * 1000.
uint32_t zrt_analyze_vertex_cache(const uint32_t* indices,
                                  uint32_t index_count,
                                  uint32_t vertex_count,
                                  uint32_t cache_size) {
    if (cache_size == 0) cache_size = 32;
    std::vector<int64_t> last_use(vertex_count, -1);
    int64_t time = 0;
    uint64_t misses = 0;
    for (uint32_t i = 0; i < index_count; i++) {
        uint32_t v = indices[i];
        if (last_use[v] < 0 || time - last_use[v] > (int64_t)cache_size) {
            misses++;
            last_use[v] = time;
            time++;
        }
        // hits do not advance the FIFO
    }
    uint32_t tris = index_count / 3;
    return tris ? (uint32_t)(misses * 1000 / tris) : 0;
}

// Spatial triangle reordering (the spatialorder capability): sort triangles
// by the Morton code of their centroid so consecutive triangles occupy
// compact spatial clusters — what the renderer's block/superblock binning
// exploits.  In-place on the index buffer (groups of 3).
static uint64_t spread3(uint32_t v) {
    uint64_t x = v & 0x1FFFFF;  // 21 bits per axis
    x = (x | (x << 32)) & 0x1F00000000FFFFull;
    x = (x | (x << 16)) & 0x1F0000FF0000FFull;
    x = (x | (x << 8)) & 0x100F00F00F00F00Full;
    x = (x | (x << 4)) & 0x10C30C30C30C30C3ull;
    x = (x | (x << 2)) & 0x1249249249249249ull;
    return x;
}

void zrt_spatial_sort_triangles(uint32_t* indices, uint32_t index_count,
                                const float* vertices,
                                uint32_t floats_per_vertex) {
    uint32_t tri_count = index_count / 3;
    if (tri_count < 2) return;

    // Bounding box of all centroids.
    float mn[3] = {1e30f, 1e30f, 1e30f}, mx[3] = {-1e30f, -1e30f, -1e30f};
    std::vector<float> cent(tri_count * 3);
    for (uint32_t t = 0; t < tri_count; t++) {
        for (int a = 0; a < 3; a++) {
            float c = 0;
            for (int k = 0; k < 3; k++)
                c += vertices[(uint64_t)indices[t * 3 + k] * floats_per_vertex + a];
            c /= 3.0f;
            cent[t * 3 + a] = c;
            if (c < mn[a]) mn[a] = c;
            if (c > mx[a]) mx[a] = c;
        }
    }
    float scale[3];
    for (int a = 0; a < 3; a++) {
        float ext = mx[a] - mn[a];
        scale[a] = ext > 0 ? 2097151.0f / ext : 0.0f;  // 21-bit range
    }

    std::vector<std::pair<uint64_t, uint32_t>> keys(tri_count);
    for (uint32_t t = 0; t < tri_count; t++) {
        uint32_t q[3];
        for (int a = 0; a < 3; a++)
            q[a] = (uint32_t)((cent[t * 3 + a] - mn[a]) * scale[a]);
        keys[t] = {spread3(q[0]) | (spread3(q[1]) << 1) | (spread3(q[2]) << 2), t};
    }
    std::sort(keys.begin(), keys.end());

    std::vector<uint32_t> out(index_count);
    for (uint32_t t = 0; t < tri_count; t++)
        memcpy(&out[t * 3], &indices[keys[t].second * 3], 12);
    memcpy(indices, out.data(), index_count * 4);
}

// ---------------------------------------------------------------------------
// PNG encode (frame dump fast path; stb_image-capability counterpart)
// ---------------------------------------------------------------------------

static void png_chunk(std::vector<uint8_t>& out, const char tag[4],
                      const uint8_t* payload, uint32_t len) {
    uint8_t hdr[8] = {
        (uint8_t)(len >> 24), (uint8_t)(len >> 16),
        (uint8_t)(len >> 8), (uint8_t)len,
        (uint8_t)tag[0], (uint8_t)tag[1], (uint8_t)tag[2], (uint8_t)tag[3],
    };
    out.insert(out.end(), hdr, hdr + 8);
    if (len) out.insert(out.end(), payload, payload + len);
    uint32_t crc = crc32(0, out.data() + out.size() - len - 4, len + 4);
    uint8_t c[4] = {(uint8_t)(crc >> 24), (uint8_t)(crc >> 16),
                    (uint8_t)(crc >> 8), (uint8_t)crc};
    out.insert(out.end(), c, c + 4);
}

// Encode (h, w, 4) RGBA8 into a PNG in caller-provided buffer.
// Returns the encoded size, or 0 if out_capacity is too small.
uint64_t zrt_encode_png(const uint8_t* rgba, uint32_t width, uint32_t height,
                        uint8_t* out, uint64_t out_capacity) {
    std::vector<uint8_t> raw((uint64_t)height * (width * 4 + 1));
    for (uint32_t y = 0; y < height; y++) {
        raw[(uint64_t)y * (width * 4 + 1)] = 0;  // filter: none
        memcpy(&raw[(uint64_t)y * (width * 4 + 1) + 1],
               rgba + (uint64_t)y * width * 4, width * 4);
    }
    uLongf comp_cap = compressBound(raw.size());
    std::vector<uint8_t> comp(comp_cap);
    if (compress2(comp.data(), &comp_cap, raw.data(), raw.size(), 6) != Z_OK)
        return 0;

    std::vector<uint8_t> png;
    static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A};
    png.insert(png.end(), sig, sig + 8);
    uint8_t ihdr[13] = {
        (uint8_t)(width >> 24), (uint8_t)(width >> 16),
        (uint8_t)(width >> 8), (uint8_t)width,
        (uint8_t)(height >> 24), (uint8_t)(height >> 16),
        (uint8_t)(height >> 8), (uint8_t)height,
        8, 6, 0, 0, 0,  // 8-bit RGBA
    };
    png_chunk(png, "IHDR", ihdr, 13);
    png_chunk(png, "IDAT", comp.data(), (uint32_t)comp_cap);
    png_chunk(png, "IEND", nullptr, 0);
    if (png.size() > out_capacity) return 0;
    memcpy(out, png.data(), png.size());
    return png.size();
}

// ---------------------------------------------------------------------------
// Mesh simplification (LOD generation) — quadric-error edge collapse
// ---------------------------------------------------------------------------
// The meshoptimizer-simplification capability (linked but never called in
// the reference, gltf_converter.zig:155 TODO; LOD slots exist in the mesh
// format).  Original implementation: classic Garland–Heckbert quadrics with
// half-edge collapses onto EXISTING vertices (no new positions, so the
// simplified LODs share the vertex buffer — exactly what the format's
// per-LOD index ranges need).  Border vertices are locked to preserve
// silhouettes and open edges.

namespace {

struct Quadric {
    // Symmetric 4x4: a*x^2 + ... stored as 10 coefficients.
    double q[10] = {0, 0, 0, 0, 0, 0, 0, 0, 0, 0};

    void add_plane(double a, double b, double c, double d, double w) {
        q[0] += w * a * a; q[1] += w * a * b; q[2] += w * a * c;
        q[3] += w * a * d; q[4] += w * b * b; q[5] += w * b * c;
        q[6] += w * b * d; q[7] += w * c * c; q[8] += w * c * d;
        q[9] += w * d * d;
    }
    void add(const Quadric& o) { for (int i = 0; i < 10; i++) q[i] += o.q[i]; }
    double eval(double x, double y, double z) const {
        return q[0]*x*x + 2*q[1]*x*y + 2*q[2]*x*z + 2*q[3]*x
             + q[4]*y*y + 2*q[5]*y*z + 2*q[6]*y
             + q[7]*z*z + 2*q[8]*z + q[9];
    }
};

struct Collapse {
    double error;
    uint32_t from, to;
    uint32_t gen;  // staleness check against vertex generations
    bool operator<(const Collapse& o) const { return error > o.error; }  // min-heap
};

}  // namespace

// Simplify an indexed triangle list to <= target_index_count indices.
// positions: xyz at the head of each stride_floats record.  Returns the new
// index count (multiple of 3) written to out_indices; 0 on error.
// max_error: relative to the mesh bounding-box diagonal (squared inside).
uint32_t zrt_simplify(const uint32_t* indices, uint32_t n_idx,
                      const float* positions, uint32_t n_verts,
                      uint32_t stride_floats, uint32_t target_index_count,
                      float max_error, uint32_t* out_indices) {
    if (n_idx % 3 != 0 || stride_floats < 3) return 0;
    const uint32_t n_tris = n_idx / 3;

    auto px = [&](uint32_t v) { return (double)positions[v * stride_floats + 0]; };
    auto py = [&](uint32_t v) { return (double)positions[v * stride_floats + 1]; };
    auto pz = [&](uint32_t v) { return (double)positions[v * stride_floats + 2]; };

    // Bounding-box diagonal for the relative error cutoff.
    double lo[3] = {1e300, 1e300, 1e300}, hi[3] = {-1e300, -1e300, -1e300};
    for (uint32_t v = 0; v < n_verts; v++) {
        double p[3] = {px(v), py(v), pz(v)};
        for (int k = 0; k < 3; k++) {
            lo[k] = std::min(lo[k], p[k]);
            hi[k] = std::max(hi[k], p[k]);
        }
    }
    double diag2 = 0;
    for (int k = 0; k < 3; k++) diag2 += (hi[k] - lo[k]) * (hi[k] - lo[k]);
    const double error_limit = (double)max_error * (double)max_error * diag2;

    // Per-vertex quadrics from incident triangle planes (area-weighted) and
    // edge adjacency counts for border detection.
    std::vector<Quadric> quad(n_verts);
    std::map<std::pair<uint32_t, uint32_t>, int> edge_count;
    std::vector<std::vector<uint32_t>> vtx_tris(n_verts);
    std::vector<std::array<uint32_t, 3>> tris(n_tris);
    std::vector<bool> tri_dead(n_tris, false);

    for (uint32_t t = 0; t < n_tris; t++) {
        uint32_t a = indices[3*t], b = indices[3*t+1], c = indices[3*t+2];
        if (a >= n_verts || b >= n_verts || c >= n_verts) return 0;
        tris[t] = {a, b, c};
        double ux = px(b)-px(a), uy = py(b)-py(a), uz = pz(b)-pz(a);
        double vx = px(c)-px(a), vy = py(c)-py(a), vz = pz(c)-pz(a);
        double nx = uy*vz - uz*vy, ny = uz*vx - ux*vz, nz = ux*vy - uy*vx;
        double len = std::sqrt(nx*nx + ny*ny + nz*nz);
        double area = 0.5 * len;
        if (len > 1e-30) { nx /= len; ny /= len; nz /= len; }
        double d = -(nx*px(a) + ny*py(a) + nz*pz(a));
        for (uint32_t v : {a, b, c}) {
            quad[v].add_plane(nx, ny, nz, d, area);
            vtx_tris[v].push_back(t);
        }
        auto edge = [&](uint32_t u, uint32_t w) {
            if (u > w) std::swap(u, w);
            edge_count[{u, w}]++;
        };
        edge(a, b); edge(b, c); edge(c, a);
    }

    std::vector<bool> border(n_verts, false);
    for (auto& [e, cnt] : edge_count)
        if (cnt == 1) { border[e.first] = true; border[e.second] = true; }

    // Union-find style remap: vertex -> current representative.
    std::vector<uint32_t> remap(n_verts);
    for (uint32_t v = 0; v < n_verts; v++) remap[v] = v;
    auto find = [&](uint32_t v) {
        while (remap[v] != v) { remap[v] = remap[remap[v]]; v = remap[v]; }
        return v;
    };

    std::vector<uint32_t> gen(n_verts, 0);
    std::priority_queue<Collapse> heap;
    auto push_candidates = [&](uint32_t v) {
        v = find(v);
        if (border[v]) return;  // locked: never collapse FROM a border vertex
        for (uint32_t t : vtx_tris[v]) {
            if (tri_dead[t]) continue;
            for (uint32_t w0 : tris[t]) {
                uint32_t w = find(w0);
                if (w == v) continue;
                Quadric q = quad[v];
                q.add(quad[w]);
                double err = q.eval(px(w), py(w), pz(w));
                heap.push({err, v, w, gen[v] + gen[w]});
            }
        }
    };
    for (uint32_t v = 0; v < n_verts; v++) push_candidates(v);

    uint32_t live_tris = n_tris;
    const uint32_t target_tris = target_index_count / 3;

    while (live_tris > target_tris && !heap.empty()) {
        Collapse c = heap.top();
        heap.pop();
        uint32_t from = find(c.from), to = find(c.to);
        if (from != c.from || to != c.to) continue;  // stale representative
        if (c.gen != gen[from] + gen[to]) continue;  // stale error
        if (from == to || border[from]) continue;
        if (c.error > error_limit) break;  // error budget exhausted

        // Collapse from -> to.
        remap[from] = to;
        quad[to].add(quad[from]);
        gen[to]++;
        // Merge triangle lists; kill degenerates.
        for (uint32_t t : vtx_tris[from]) {
            if (tri_dead[t]) continue;
            uint32_t a = find(tris[t][0]), b = find(tris[t][1]),
                     d = find(tris[t][2]);
            if (a == b || b == d || d == a) {
                tri_dead[t] = true;
                live_tris--;
            } else {
                vtx_tris[to].push_back(t);
            }
        }
        push_candidates(to);
        // Neighbors' candidate errors changed: refresh them lazily.
        for (uint32_t t : vtx_tris[to]) {
            if (tri_dead[t]) continue;
            for (uint32_t w : tris[t]) push_candidates(find(w));
        }
    }

    uint32_t out = 0;
    for (uint32_t t = 0; t < n_tris; t++) {
        if (tri_dead[t]) continue;
        uint32_t a = find(tris[t][0]), b = find(tris[t][1]), d = find(tris[t][2]);
        if (a == b || b == d || d == a) continue;
        out_indices[out++] = a;
        out_indices[out++] = b;
        out_indices[out++] = d;
    }
    return out;
}

// Vertex-fetch optimization (the vfetchoptimizer capability,
// common/build.zig:49-52): reorder VERTICES into first-use order of the
// (already cache-optimized) index buffer so the GPU/DMA vertex fetch
// walks memory near-sequentially, and remap indices accordingly.  Unused
// vertices are dropped.  Returns the new vertex count.
uint32_t zrt_optimize_vertex_fetch(const float* vertices_in,
                                   float* vertices_out,
                                   uint32_t* indices, uint32_t index_count,
                                   uint32_t vertex_count,
                                   uint32_t floats_per_vertex) {
    const uint32_t kUnused = 0xFFFFFFFFu;
    std::vector<uint32_t> remap(vertex_count, kUnused);
    uint32_t next = 0;
    for (uint32_t i = 0; i < index_count; i++) {
        uint32_t v = indices[i];
        if (v >= vertex_count) continue;  // defensive: skip corrupt index
        if (remap[v] == kUnused) {
            remap[v] = next++;
            std::memcpy(vertices_out + (uint64_t)remap[v] * floats_per_vertex,
                        vertices_in + (uint64_t)v * floats_per_vertex,
                        sizeof(float) * floats_per_vertex);
        }
        indices[i] = remap[v];
    }
    return next;
}

// Vertex-fetch analyzer (the vfetchanalyzer capability): bytes fetched
// through a 64-byte-line, 16-line FIFO cache while walking the index
// buffer, as permille of the ideal (each used vertex fetched once).
// Lower is better; 1000 = perfect locality.
uint32_t zrt_analyze_vertex_fetch(const uint32_t* indices,
                                  uint32_t index_count,
                                  uint32_t vertex_count,
                                  uint32_t bytes_per_vertex) {
    const uint64_t kLine = 64;
    const int kLines = 16;
    uint64_t lines[kLines];
    int head = 0, filled = 0;
    uint64_t fetched = 0;
    std::vector<uint8_t> used(vertex_count, 0);
    uint64_t unique = 0;
    for (uint32_t i = 0; i < index_count; i++) {
        uint32_t v = indices[i];
        if (v >= vertex_count) continue;
        if (!used[v]) { used[v] = 1; unique++; }
        uint64_t b0 = (uint64_t)v * bytes_per_vertex;
        uint64_t b1 = b0 + bytes_per_vertex - 1;
        for (uint64_t line = b0 / kLine; line <= b1 / kLine; line++) {
            bool hit = false;
            for (int k = 0; k < filled; k++)
                if (lines[k] == line) { hit = true; break; }
            if (!hit) {
                fetched += kLine;
                lines[head] = line;
                head = (head + 1) % kLines;
                if (filled < kLines) filled++;
            }
        }
    }
    uint64_t ideal = unique * (uint64_t)bytes_per_vertex;
    return ideal ? (uint32_t)(fetched * 1000 / ideal) : 0;
}


// ---------------------------------------------------------------------------
// Meshlet clusterizer (the meshoptimizer clusterizer capability — compiled
// in the reference, never called: common/build.zig:49-52; kept for full
// compiled-set parity).  Original greedy design, not meshopt's:
//
//   * seeds walk triangles in Morton order of their centroids (spatial
//     coherence between consecutive meshlets);
//   * a meshlet grows through vertex-shared adjacency, each step taking
//     the candidate that introduces the FEWEST new unique vertices
//     (tie: lowest Morton rank), until the vertex or triangle cap;
//   * membership/candidate bookkeeping is epoch-stamped so per-meshlet
//     state never needs clearing.
//
// Outputs (caller-allocated, worst case: tri_count meshlets, 3*tri_count
// meshlet-vertex slots): per-meshlet descriptor quad (vertex_offset,
// triangle_offset, vertex_count, triangle_count), a global-vertex-id
// pool, and uint8 local corner indices.  Returns the meshlet count.
uint32_t zrt_build_meshlets(const uint32_t* indices, uint32_t index_count,
                            const float* vertices, uint32_t vertex_count,
                            uint32_t floats_per_vertex,
                            uint32_t max_vertices, uint32_t max_triangles,
                            uint32_t* meshlet_desc,     // [n][4]
                            uint32_t* meshlet_vertices, // vertex id pool
                            uint8_t* meshlet_triangles  // [3 * tri_count]
) {
    uint32_t tri_count = index_count / 3;
    if (!tri_count || max_vertices < 3 || max_vertices > 256 ||
        !max_triangles)
        return 0;

    // Morton rank per triangle (reuses the spatial-sort quantization).
    std::vector<uint32_t> rank(tri_count), order(tri_count);
    {
        std::vector<std::pair<uint64_t, uint32_t>> keys(tri_count);
        float mn[3] = {1e30f, 1e30f, 1e30f};
        float mx[3] = {-1e30f, -1e30f, -1e30f};
        std::vector<float> cent(tri_count * 3);
        for (uint32_t t = 0; t < tri_count; t++)
            for (int a = 0; a < 3; a++) {
                float c = 0;
                for (int k = 0; k < 3; k++)
                    c += vertices[(uint64_t)indices[t * 3 + k] *
                                  floats_per_vertex + a];
                c /= 3.0f;
                cent[t * 3 + a] = c;
                if (c < mn[a]) mn[a] = c;
                if (c > mx[a]) mx[a] = c;
            }
        float scale[3];
        for (int a = 0; a < 3; a++) {
            float ext = mx[a] - mn[a];
            scale[a] = ext > 0 ? 2097151.0f / ext : 0.0f;
        }
        for (uint32_t t = 0; t < tri_count; t++) {
            uint32_t q[3];
            for (int a = 0; a < 3; a++)
                q[a] = (uint32_t)((cent[t * 3 + a] - mn[a]) * scale[a]);
            keys[t] = {spread3(q[0]) | (spread3(q[1]) << 1) |
                       (spread3(q[2]) << 2), t};
        }
        std::sort(keys.begin(), keys.end());
        for (uint32_t i = 0; i < tri_count; i++) {
            order[i] = keys[i].second;
            rank[keys[i].second] = i;
        }
    }

    // Vertex -> incident triangle lists (CSR).
    std::vector<uint32_t> vt_off(vertex_count + 1, 0);
    for (uint32_t i = 0; i < index_count; i++)
        if (indices[i] < vertex_count) vt_off[indices[i] + 1]++;
    for (uint32_t v = 0; v < vertex_count; v++) vt_off[v + 1] += vt_off[v];
    std::vector<uint32_t> vt(index_count);
    {
        std::vector<uint32_t> cur(vt_off.begin(), vt_off.end() - 1);
        for (uint32_t t = 0; t < tri_count; t++)
            for (int k = 0; k < 3; k++) {
                uint32_t v = indices[t * 3 + k];
                if (v < vertex_count) vt[cur[v]++] = t;
            }
    }

    std::vector<uint8_t> tri_used(tri_count, 0);
    std::vector<uint32_t> vert_epoch(vertex_count, 0);
    std::vector<uint32_t> vert_local(vertex_count, 0);
    std::vector<uint32_t> cand_epoch(tri_count, 0);
    std::vector<uint32_t> cand;

    uint32_t n_meshlets = 0;
    uint32_t vpool = 0, tpool = 0;
    uint32_t seed_cursor = 0;
    uint32_t epoch = 0;

    while (true) {
        while (seed_cursor < tri_count && tri_used[order[seed_cursor]])
            seed_cursor++;
        if (seed_cursor >= tri_count) break;

        epoch++;
        cand.clear();
        uint32_t mv = 0, mt = 0;  // counts in the current meshlet
        uint32_t vbase = vpool, tbase = tpool;
        uint32_t next_tri = order[seed_cursor];

        while (next_tri != 0xFFFFFFFFu) {
            uint32_t t = next_tri;
            tri_used[t] = 1;
            for (int k = 0; k < 3; k++) {
                uint32_t v = indices[t * 3 + k];
                if (vert_epoch[v] != epoch) {
                    vert_epoch[v] = epoch;
                    vert_local[v] = mv;
                    meshlet_vertices[vpool + mv] = v;
                    mv++;
                    // New vertex: its incident unused triangles become
                    // candidates (each at most once per meshlet).
                    for (uint32_t j = vt_off[v]; j < vt_off[v + 1]; j++) {
                        uint32_t t2 = vt[j];
                        if (!tri_used[t2] && cand_epoch[t2] != epoch) {
                            cand_epoch[t2] = epoch;
                            cand.push_back(t2);
                        }
                    }
                }
                meshlet_triangles[(uint64_t)(tpool + mt) * 3 + k] =
                    (uint8_t)vert_local[v];
            }
            mt++;

            // Pick the next candidate: fewest new vertices, then lowest
            // Morton rank.  Compact used/over-cap candidates away.
            next_tri = 0xFFFFFFFFu;
            if (mt < max_triangles) {
                uint32_t best_new = 4, best_rank = 0xFFFFFFFFu;
                size_t w = 0;
                for (size_t i = 0; i < cand.size(); i++) {
                    uint32_t t2 = cand[i];
                    if (tri_used[t2]) continue;
                    cand[w++] = t2;
                    uint32_t nn = 0;
                    for (int k = 0; k < 3; k++)
                        if (vert_epoch[indices[t2 * 3 + k]] != epoch) nn++;
                    if (mv + nn > max_vertices) continue;
                    if (nn < best_new ||
                        (nn == best_new && rank[t2] < best_rank)) {
                        best_new = nn;
                        best_rank = rank[t2];
                        next_tri = t2;
                    }
                }
                cand.resize(w);
            }
        }

        meshlet_desc[(uint64_t)n_meshlets * 4 + 0] = vbase;
        meshlet_desc[(uint64_t)n_meshlets * 4 + 1] = tbase;
        meshlet_desc[(uint64_t)n_meshlets * 4 + 2] = mv;
        meshlet_desc[(uint64_t)n_meshlets * 4 + 3] = mt;
        n_meshlets++;
        vpool += mv;
        tpool += mt;
    }
    return n_meshlets;
}

// Per-meshlet culling bounds: bounding sphere of the meshlet vertices
// (centroid center) + a normal cone (unit axis = normalized mean of the
// triangle geometric normals; cutoff = the minimum dot(axis, normal)
// over the meshlet, so a meshlet is back-facing when
// dot(axis, view) < -sqrt(1 - cutoff^2) for cutoff >= 0).
// Writes [cx, cy, cz, radius, ax, ay, az, cutoff] per meshlet.
void zrt_compute_meshlet_bounds(const uint32_t* meshlet_desc,
                                uint32_t n_meshlets,
                                const uint32_t* meshlet_vertices,
                                const uint8_t* meshlet_triangles,
                                const float* vertices,
                                uint32_t floats_per_vertex,
                                float* bounds  // [n][8]
) {
    for (uint32_t m = 0; m < n_meshlets; m++) {
        uint32_t vbase = meshlet_desc[m * 4 + 0];
        uint32_t tbase = meshlet_desc[m * 4 + 1];
        uint32_t mv = meshlet_desc[m * 4 + 2];
        uint32_t mt = meshlet_desc[m * 4 + 3];
        float c[3] = {0, 0, 0};
        for (uint32_t i = 0; i < mv; i++) {
            const float* p = vertices +
                (uint64_t)meshlet_vertices[vbase + i] * floats_per_vertex;
            for (int a = 0; a < 3; a++) c[a] += p[a];
        }
        for (int a = 0; a < 3; a++) c[a] /= mv ? (float)mv : 1.0f;
        float r2 = 0;
        for (uint32_t i = 0; i < mv; i++) {
            const float* p = vertices +
                (uint64_t)meshlet_vertices[vbase + i] * floats_per_vertex;
            float d2 = 0;
            for (int a = 0; a < 3; a++)
                d2 += (p[a] - c[a]) * (p[a] - c[a]);
            if (d2 > r2) r2 = d2;
        }

        // Triangle geometric normals (unit), accumulated axis.
        std::vector<std::array<float, 3>> nrm(mt);
        float axis[3] = {0, 0, 0};
        for (uint32_t t = 0; t < mt; t++) {
            const float* p[3];
            for (int k = 0; k < 3; k++)
                p[k] = vertices + (uint64_t)meshlet_vertices[
                    vbase + meshlet_triangles[(uint64_t)(tbase + t) * 3 + k]
                ] * floats_per_vertex;
            float e1[3], e2[3], n[3];
            for (int a = 0; a < 3; a++) {
                e1[a] = p[1][a] - p[0][a];
                e2[a] = p[2][a] - p[0][a];
            }
            n[0] = e1[1] * e2[2] - e1[2] * e2[1];
            n[1] = e1[2] * e2[0] - e1[0] * e2[2];
            n[2] = e1[0] * e2[1] - e1[1] * e2[0];
            float len = std::sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2]);
            float inv = len > 0 ? 1.0f / len : 0.0f;
            for (int a = 0; a < 3; a++) {
                nrm[t][a] = n[a] * inv;
                axis[a] += n[a] * inv;
            }
        }
        float alen = std::sqrt(axis[0] * axis[0] + axis[1] * axis[1] +
                               axis[2] * axis[2]);
        float ainv = alen > 1e-20f ? 1.0f / alen : 0.0f;
        for (int a = 0; a < 3; a++) axis[a] *= ainv;
        float cutoff = 1.0f;
        for (uint32_t t = 0; t < mt; t++) {
            float d = axis[0] * nrm[t][0] + axis[1] * nrm[t][1] +
                      axis[2] * nrm[t][2];
            if (d < cutoff) cutoff = d;
        }
        if (alen <= 1e-20f) cutoff = -1.0f;  // degenerate: never cullable

        bounds[m * 8 + 0] = c[0];
        bounds[m * 8 + 1] = c[1];
        bounds[m * 8 + 2] = c[2];
        bounds[m * 8 + 3] = std::sqrt(r2);
        bounds[m * 8 + 4] = axis[0];
        bounds[m * 8 + 5] = axis[1];
        bounds[m * 8 + 6] = axis[2];
        bounds[m * 8 + 7] = cutoff;
    }
}

// Library version/sanity probe.
uint32_t zrt_version() { return 13; }

}  // extern "C"
