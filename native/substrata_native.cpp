// substrata_native: host-side runtime hot paths in C++.
//
// The reference's runtime layer is C++ (glare-core utils/allocators, codec
// plumbing, lock-free queues feeding the audio device callback).  This
// library provides the equivalents for the TPU build's host orchestrator,
// exposed through a plain C ABI consumed via ctypes
// (substrata_tpu/runtime/native.py):
//
//  - snapshot packet codec: pack/unpack N ObjectPhysicsTransformUpdate
//    payloads in one call (the per-tick wire hot path; reference:
//    per-message serialisation in WorkerThread/ClientThread)
//  - lock-free SPSC ring buffer for audio output (reference: mutex-guarded
//    ring drained by the miniaudio callback, AudioEngine.cpp:191-226 —
//    here a true single-producer/single-consumer lock-free ring)
//  - greedy voxel mesher (reference: shared/VoxelMeshBuilding.cpp) for
//    large voxel groups where the Python mesher is too slow
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <atomic>
#include <cstdint>
#include <cstring>
#include <new>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Snapshot codec
// ---------------------------------------------------------------------------
// Record layout (little-endian, matches runtime/native.py _SNAPSHOT_DTYPE):
//   u64 uid | f32 state[13] (pos3 quat4 linvel3 angvel3) | f64 client_time
struct SnapshotRec {
    uint64_t uid;
    float state[13];
    double t;
} __attribute__((packed));

// uids [n], block [n*13] f32 (pos|quat|linvel|angvel), times [n], out [n*68]
void pack_snapshots(int n, const uint64_t* uids, const float* block,
                    const double* times, uint8_t* out) {
    SnapshotRec* recs = reinterpret_cast<SnapshotRec*>(out);
    for (int i = 0; i < n; ++i) {
        recs[i].uid = uids[i];
        std::memcpy(recs[i].state, block + i * 13, 13 * sizeof(float));
        recs[i].t = times[i];
    }
}

void unpack_snapshots(int n, const uint8_t* data, uint64_t* uids, float* block,
                      double* times) {
    const SnapshotRec* recs = reinterpret_cast<const SnapshotRec*>(data);
    for (int i = 0; i < n; ++i) {
        uids[i] = recs[i].uid;
        std::memcpy(block + i * 13, recs[i].state, 13 * sizeof(float));
        times[i] = recs[i].t;
    }
}

// ---------------------------------------------------------------------------
// Lock-free SPSC audio ring (frames of stereo f32)
// ---------------------------------------------------------------------------
struct AudioRing {
    float* data;                 // capacity * 2 floats
    uint32_t capacity;           // frames, power of two
    std::atomic<uint64_t> write_pos;
    std::atomic<uint64_t> read_pos;
};

void* audio_ring_create(uint32_t capacity_frames) {
    // Round up to a power of two for cheap masking.
    uint32_t cap = 1;
    while (cap < capacity_frames) cap <<= 1;
    AudioRing* r = new (std::nothrow) AudioRing();
    if (!r) return nullptr;
    r->data = new (std::nothrow) float[size_t(cap) * 2]();
    if (!r->data) { delete r; return nullptr; }
    r->capacity = cap;
    r->write_pos.store(0);
    r->read_pos.store(0);
    return r;
}

void audio_ring_destroy(void* ring) {
    AudioRing* r = static_cast<AudioRing*>(ring);
    if (!r) return;
    delete[] r->data;
    delete r;
}

uint32_t audio_ring_queued(void* ring) {
    AudioRing* r = static_cast<AudioRing*>(ring);
    return uint32_t(r->write_pos.load(std::memory_order_acquire)
                    - r->read_pos.load(std::memory_order_acquire));
}

// Producer: push n frames; returns frames actually written.
uint32_t audio_ring_write(void* ring, const float* frames, uint32_t n) {
    AudioRing* r = static_cast<AudioRing*>(ring);
    uint64_t w = r->write_pos.load(std::memory_order_relaxed);
    uint64_t rd = r->read_pos.load(std::memory_order_acquire);
    uint32_t free_frames = r->capacity - uint32_t(w - rd);
    if (n > free_frames) n = free_frames;
    uint32_t mask = r->capacity - 1;
    for (uint32_t i = 0; i < n; ++i) {
        uint32_t slot = uint32_t(w + i) & mask;
        r->data[size_t(slot) * 2 + 0] = frames[size_t(i) * 2 + 0];
        r->data[size_t(slot) * 2 + 1] = frames[size_t(i) * 2 + 1];
    }
    r->write_pos.store(w + n, std::memory_order_release);
    return n;
}

// Consumer (device callback): pop n frames, zero-padding underflow
// (AudioEngine.cpp:191-226 semantics).  Returns frames actually available.
uint32_t audio_ring_read(void* ring, float* frames, uint32_t n) {
    AudioRing* r = static_cast<AudioRing*>(ring);
    uint64_t rd = r->read_pos.load(std::memory_order_relaxed);
    uint64_t w = r->write_pos.load(std::memory_order_acquire);
    uint32_t avail = uint32_t(w - rd);
    uint32_t take = n < avail ? n : avail;
    uint32_t mask = r->capacity - 1;
    for (uint32_t i = 0; i < take; ++i) {
        uint32_t slot = uint32_t(rd + i) & mask;
        // Clamp to [-1, 1] like the reference device callback.
        float l = r->data[size_t(slot) * 2 + 0];
        float rr = r->data[size_t(slot) * 2 + 1];
        frames[size_t(i) * 2 + 0] = l < -1.f ? -1.f : (l > 1.f ? 1.f : l);
        frames[size_t(i) * 2 + 1] = rr < -1.f ? -1.f : (rr > 1.f ? 1.f : rr);
    }
    for (uint32_t i = take; i < n; ++i) {
        frames[size_t(i) * 2 + 0] = 0.f;
        frames[size_t(i) * 2 + 1] = 0.f;
    }
    r->read_pos.store(rd + take, std::memory_order_release);
    return take;
}

// ---------------------------------------------------------------------------
// Greedy voxel mesher
// ---------------------------------------------------------------------------
// coords [n*3] i32, mats [n] i32.  Outputs are written into caller buffers;
// returns 0 on success, -1 if an output buffer was too small.
// verts_out capacity: max_verts * 3 f32; tris_out: max_tris * 3 i32;
// tri_mats_out: max_tris i32.  Actual counts in n_verts_out / n_tris_out.
int greedy_mesh_voxels(int n, const int32_t* coords, const int32_t* mats,
                       float voxel_size,
                       float* verts_out, int32_t max_verts, int32_t* n_verts_out,
                       int32_t* tris_out, int32_t* tri_mats_out,
                       int32_t max_tris, int32_t* n_tris_out) {
    if (n <= 0) { *n_verts_out = 0; *n_tris_out = 0; return 0; }
    int32_t mn[3] = {INT32_MAX, INT32_MAX, INT32_MAX};
    int32_t mx[3] = {INT32_MIN, INT32_MIN, INT32_MIN};
    for (int i = 0; i < n; ++i)
        for (int a = 0; a < 3; ++a) {
            int32_t c = coords[i * 3 + a];
            if (c < mn[a]) mn[a] = c;
            if (c > mx[a]) mx[a] = c;
        }
    int64_t dims[3] = {mx[0] - mn[0] + 1, mx[1] - mn[1] + 1, mx[2] - mn[2] + 1};
    if (dims[0] * dims[1] * dims[2] > int64_t(1) << 30) return -2;  // too big
    std::vector<int32_t> grid(size_t(dims[0] * dims[1] * dims[2]), 0);
    auto at = [&](int64_t x, int64_t y, int64_t z) -> int32_t& {
        return grid[size_t((x * dims[1] + y) * dims[2] + z)];
    };
    for (int i = 0; i < n; ++i)
        at(coords[i * 3] - mn[0], coords[i * 3 + 1] - mn[1],
           coords[i * 3 + 2] - mn[2]) = mats[i] + 1;

    std::unordered_map<uint64_t, int32_t> vert_index;
    vert_index.reserve(size_t(n) * 4);
    int32_t n_verts = 0, n_tris = 0;

    auto vid = [&](int64_t x, int64_t y, int64_t z) -> int32_t {
        uint64_t key = (uint64_t(uint16_t(x)) << 32)
                     | (uint64_t(uint16_t(y)) << 16) | uint16_t(z);
        auto it = vert_index.find(key);
        if (it != vert_index.end()) return it->second;
        int32_t idx = n_verts++;
        if (idx < max_verts) {
            verts_out[size_t(idx) * 3 + 0] = float(x + mn[0]) * voxel_size;
            verts_out[size_t(idx) * 3 + 1] = float(y + mn[1]) * voxel_size;
            verts_out[size_t(idx) * 3 + 2] = float(z + mn[2]) * voxel_size;
        }
        vert_index.emplace(key, idx);
        return idx;
    };

    std::vector<int32_t> mask;
    for (int axis = 0; axis < 3; ++axis) {
        int u = (axis + 1) % 3, v = (axis + 2) % 3;
        int64_t du = dims[u], dv = dims[v];
        mask.assign(size_t(du * dv), 0);
        for (int sign = 0; sign < 2; ++sign) {
            int dir = sign == 0 ? 1 : -1;
            for (int64_t s = 0; s < dims[axis]; ++s) {
                bool any = false;
                for (int64_t i = 0; i < du; ++i)
                    for (int64_t j = 0; j < dv; ++j) {
                        int64_t p[3];
                        p[axis] = s; p[u] = i; p[v] = j;
                        int32_t cur = at(p[0], p[1], p[2]);
                        int32_t nb = 0;
                        int64_t q[3] = {p[0], p[1], p[2]};
                        q[axis] += dir;
                        if (q[axis] >= 0 && q[axis] < dims[axis])
                            nb = at(q[0], q[1], q[2]);
                        int32_t m = (cur != 0 && nb == 0) ? cur : 0;
                        mask[size_t(i * dv + j)] = m;
                        any |= (m != 0);
                    }
                if (!any) continue;
                for (int64_t i0 = 0; i0 < du; ++i0) {
                    for (int64_t j0 = 0; j0 < dv;) {
                        int32_t m = mask[size_t(i0 * dv + j0)];
                        if (m == 0) { ++j0; continue; }
                        int64_t w = 1;
                        while (j0 + w < dv && mask[size_t(i0 * dv + j0 + w)] == m) ++w;
                        int64_t h = 1;
                        for (; i0 + h < du; ++h) {
                            bool row_ok = true;
                            for (int64_t k = 0; k < w; ++k)
                                if (mask[size_t((i0 + h) * dv + j0 + k)] != m) {
                                    row_ok = false; break;
                                }
                            if (!row_ok) break;
                        }
                        for (int64_t a = 0; a < h; ++a)
                            for (int64_t b = 0; b < w; ++b)
                                mask[size_t((i0 + a) * dv + j0 + b)] = 0;
                        int64_t base[3];
                        base[axis] = s + (dir > 0 ? 1 : 0);
                        base[u] = i0; base[v] = j0;
                        int64_t p0[3] = {base[0], base[1], base[2]};
                        int64_t p1[3] = {base[0], base[1], base[2]}; p1[u] += h;
                        int64_t p2[3] = {p1[0], p1[1], p1[2]};       p2[v] += w;
                        int64_t p3[3] = {base[0], base[1], base[2]}; p3[v] += w;
                        int32_t a0 = vid(p0[0], p0[1], p0[2]);
                        int32_t a1 = vid(p1[0], p1[1], p1[2]);
                        int32_t a2 = vid(p2[0], p2[1], p2[2]);
                        int32_t a3 = vid(p3[0], p3[1], p3[2]);
                        bool flipw = (dir > 0) == (axis != 1);
                        int32_t t0[3], t1[3];
                        if (flipw) {
                            t0[0] = a0; t0[1] = a1; t0[2] = a2;
                            t1[0] = a0; t1[1] = a2; t1[2] = a3;
                        } else {
                            t0[0] = a0; t0[1] = a2; t0[2] = a1;
                            t1[0] = a0; t1[1] = a3; t1[2] = a2;
                        }
                        if (n_tris + 2 <= max_tris) {
                            std::memcpy(tris_out + size_t(n_tris) * 3, t0, 12);
                            std::memcpy(tris_out + size_t(n_tris + 1) * 3, t1, 12);
                            tri_mats_out[n_tris] = m - 1;
                            tri_mats_out[n_tris + 1] = m - 1;
                        }
                        n_tris += 2;
                        j0 += w;
                    }
                }
            }
        }
    }
    *n_verts_out = n_verts;
    *n_tris_out = n_tris;
    return (n_verts <= max_verts && n_tris <= max_tris) ? 0 : -1;
}

}  // extern "C"
