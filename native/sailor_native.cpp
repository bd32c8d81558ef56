// Sailor-TPU native runtime: task scheduler, arena allocator, BVH builders.
//
// Counterpart of the reference's native foundation:
//  - Runtime/Tasks/Scheduler.h   -> thread-class pool with dependency DAGs
//  - Runtime/Memory/*            -> arena/pool allocation for task payloads
//  - Runtime/Raytracing/BVH.cpp  -> binned-SAH BVH build (+ the 8-wide
//                                   packed-table collapse used by the TPU
//                                   traversal kernel, see bvh8.py)
//
// Exposed through a plain C ABI consumed via ctypes (sailor_tpu/native_bridge.py).
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <functional>
#include <mutex>
#include <thread>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Arena allocator (Runtime/Memory/HeapAllocator.h analog: page-chained bump
// arena with O(1) reset; feeds task payloads and scratch buffers).
// ---------------------------------------------------------------------------

struct Arena {
    std::vector<char*> pages;
    size_t page_size;
    size_t offset = 0;  // within current page
    std::mutex mu;
};

void* sailor_arena_create(size_t page_size) {
    auto* a = new Arena();
    a->page_size = page_size ? page_size : (1u << 20);
    a->pages.push_back(new char[a->page_size]);
    return a;
}

void* sailor_arena_alloc(void* arena, size_t size, size_t align) {
    auto* a = static_cast<Arena*>(arena);
    std::lock_guard<std::mutex> lock(a->mu);
    if (align == 0) align = 16;
    size_t off = (a->offset + align - 1) & ~(align - 1);
    if (off + size > a->page_size) {
        size_t psz = std::max(a->page_size, size + align);
        a->pages.push_back(new char[psz]);
        a->offset = 0;
        off = 0;
    }
    char* p = a->pages.back() + off;
    a->offset = off + size;
    return p;
}

void sailor_arena_reset(void* arena) {
    auto* a = static_cast<Arena*>(arena);
    std::lock_guard<std::mutex> lock(a->mu);
    for (size_t i = 1; i < a->pages.size(); ++i) delete[] a->pages[i];
    a->pages.resize(1);
    a->offset = 0;
}

void sailor_arena_destroy(void* arena) {
    auto* a = static_cast<Arena*>(arena);
    for (char* p : a->pages) delete[] p;
    delete a;
}

// ---------------------------------------------------------------------------
// Pool / multi-pool allocators (Runtime/Memory/Memory.h TPoolAllocator /
// TMultiPoolAllocator analogs): fixed-size blocks carved from pages with an
// intrusive free list, and a size-class router over pools. Occupancy stats
// feed the `stats.memory` console command (Renderer.cpp GPU-arena stats).
// ---------------------------------------------------------------------------

struct Pool {
    size_t block_size;
    size_t blocks_per_page;
    std::vector<char*> pages;
    void* free_list = nullptr;   // intrusive: first word of a free block
    size_t capacity = 0;         // total blocks
    size_t used = 0;             // live blocks
    std::mutex mu;
};

static void pool_grow(Pool* p) {
    size_t bs = p->block_size < sizeof(void*) ? sizeof(void*) : p->block_size;
    char* page = new char[bs * p->blocks_per_page];
    p->pages.push_back(page);
    for (size_t i = p->blocks_per_page; i-- > 0;) {
        void** blk = reinterpret_cast<void**>(page + i * bs);
        *blk = p->free_list;
        p->free_list = blk;
    }
    p->capacity += p->blocks_per_page;
}

void* sailor_pool_create(size_t block_size, size_t blocks_per_page) {
    auto* p = new Pool();
    p->block_size = block_size ? block_size : 64;
    p->blocks_per_page = blocks_per_page ? blocks_per_page : 256;
    return p;
}

void* sailor_pool_alloc(void* pool) {
    auto* p = static_cast<Pool*>(pool);
    std::lock_guard<std::mutex> lock(p->mu);
    if (!p->free_list) pool_grow(p);
    void** blk = static_cast<void**>(p->free_list);
    p->free_list = *blk;
    p->used++;
    return blk;
}

void sailor_pool_free(void* pool, void* blk) {
    auto* p = static_cast<Pool*>(pool);
    std::lock_guard<std::mutex> lock(p->mu);
    *static_cast<void**>(blk) = p->free_list;
    p->free_list = blk;
    p->used--;
}

// out[0]=pages, out[1]=capacity blocks, out[2]=used blocks, out[3]=reserved bytes
void sailor_pool_stats(void* pool, size_t* out) {
    auto* p = static_cast<Pool*>(pool);
    std::lock_guard<std::mutex> lock(p->mu);
    size_t bs = p->block_size < sizeof(void*) ? sizeof(void*) : p->block_size;
    out[0] = p->pages.size();
    out[1] = p->capacity;
    out[2] = p->used;
    out[3] = p->pages.size() * bs * p->blocks_per_page;
}

void sailor_pool_destroy(void* pool) {
    auto* p = static_cast<Pool*>(pool);
    for (char* pg : p->pages) delete[] pg;
    delete p;
}

struct MultiPool {
    // size classes: 16, 32, 64, ... 65536 (12 classes); larger -> malloc
    static const int kClasses = 12;
    Pool* pools[kClasses];
    std::atomic<size_t> oversize_bytes{0};
};

static int mpool_class(size_t size) {
    size_t c = 16; int idx = 0;
    while (c < size && idx < MultiPool::kClasses) { c <<= 1; ++idx; }
    return idx < MultiPool::kClasses ? idx : -1;
}

void* sailor_mpool_create() {
    auto* mp = new MultiPool();
    size_t c = 16;
    for (int i = 0; i < MultiPool::kClasses; ++i, c <<= 1)
        mp->pools[i] = static_cast<Pool*>(sailor_pool_create(c, 4096 / (i + 1) + 16));
    return mp;
}

void* sailor_mpool_alloc(void* mpool, size_t size) {
    auto* mp = static_cast<MultiPool*>(mpool);
    int idx = mpool_class(size);
    if (idx < 0) { mp->oversize_bytes += size; return new char[size]; }
    return sailor_pool_alloc(mp->pools[idx]);
}

void sailor_mpool_free(void* mpool, void* blk, size_t size) {
    auto* mp = static_cast<MultiPool*>(mpool);
    int idx = mpool_class(size);
    if (idx < 0) { mp->oversize_bytes -= size; delete[] static_cast<char*>(blk); return; }
    sailor_pool_free(mp->pools[idx], blk);
}

// out[0]=total pages, out[1]=capacity blocks, out[2]=used blocks,
// out[3]=reserved bytes (incl. oversize)
void sailor_mpool_stats(void* mpool, size_t* out) {
    auto* mp = static_cast<MultiPool*>(mpool);
    out[0] = out[1] = out[2] = out[3] = 0;
    for (int i = 0; i < MultiPool::kClasses; ++i) {
        size_t s[4];
        sailor_pool_stats(mp->pools[i], s);
        out[0] += s[0]; out[1] += s[1]; out[2] += s[2]; out[3] += s[3];
    }
    out[3] += mp->oversize_bytes.load();
}

void sailor_mpool_destroy(void* mpool) {
    auto* mp = static_cast<MultiPool*>(mpool);
    for (int i = 0; i < MultiPool::kClasses; ++i) sailor_pool_destroy(mp->pools[i]);
    delete mp;
}

// ---------------------------------------------------------------------------
// Task scheduler (Runtime/Tasks/Scheduler.h analog).
// Thread classes mirror the reference's Main(2)/Worker(1)/Render(0)/RHI(3)
// affinities; tasks carry dependency lists (Join) and completion waits.
// ---------------------------------------------------------------------------

typedef void (*task_fn)(void*);

struct Task {
    uint64_t id;
    task_fn fn;
    void* arg;
    std::vector<uint64_t> deps;
    int thread_class;
};

struct Scheduler {
    std::vector<std::thread> workers;
    std::deque<Task> queue;                    // shared queue (class-filtered)
    std::unordered_map<uint64_t, bool> done;   // id -> completed
    std::mutex mu;
    std::condition_variable cv;
    std::condition_variable done_cv;
    std::atomic<uint64_t> next_id{1};
    std::atomic<int> active{0};
    bool stopping = false;

    bool deps_ready(const Task& t) {
        for (uint64_t d : t.deps) {
            auto it = done.find(d);
            if (it == done.end() || !it->second) return false;
        }
        return true;
    }

    void worker_loop(int thread_class) {
        for (;;) {
            Task task{};
            {
                std::unique_lock<std::mutex> lock(mu);
                cv.wait(lock, [&] {
                    if (stopping) return true;
                    for (auto& t : queue)
                        if ((t.thread_class == thread_class || t.thread_class < 0) &&
                            deps_ready(t))
                            return true;
                    return false;
                });
                if (stopping) return;
                for (auto it = queue.begin(); it != queue.end(); ++it) {
                    if ((it->thread_class == thread_class || it->thread_class < 0) &&
                        deps_ready(*it)) {
                        task = *it;
                        queue.erase(it);
                        break;
                    }
                }
                if (!task.fn) continue;
                active++;
            }
            task.fn(task.arg);
            {
                std::lock_guard<std::mutex> lock(mu);
                done[task.id] = true;
                active--;
            }
            cv.notify_all();
            done_cv.notify_all();
        }
    }
};

void* sailor_scheduler_create(int num_workers) {
    auto* s = new Scheduler();
    if (num_workers <= 0)
        num_workers = std::max(2u, std::thread::hardware_concurrency());
    for (int i = 0; i < num_workers; ++i)
        s->workers.emplace_back([s] { s->worker_loop(1); });  // Worker class
    // one render-class + one rhi-class thread (reference thread taxonomy)
    s->workers.emplace_back([s] { s->worker_loop(0); });
    s->workers.emplace_back([s] { s->worker_loop(3); });
    return s;
}

uint64_t sailor_scheduler_submit(void* sched, task_fn fn, void* arg,
                                 const uint64_t* deps, int ndeps,
                                 int thread_class) {
    auto* s = static_cast<Scheduler*>(sched);
    Task t;
    t.id = s->next_id++;
    t.fn = fn;
    t.arg = arg;
    t.thread_class = thread_class;
    for (int i = 0; i < ndeps; ++i) t.deps.push_back(deps[i]);
    {
        std::lock_guard<std::mutex> lock(s->mu);
        s->done[t.id] = false;
        s->queue.push_back(std::move(t));
    }
    s->cv.notify_all();
    return s->next_id - 1;
}

int sailor_scheduler_is_done(void* sched, uint64_t id) {
    auto* s = static_cast<Scheduler*>(sched);
    std::lock_guard<std::mutex> lock(s->mu);
    auto it = s->done.find(id);
    return (it != s->done.end() && it->second) ? 1 : 0;
}

void sailor_scheduler_wait(void* sched, uint64_t id) {
    auto* s = static_cast<Scheduler*>(sched);
    std::unique_lock<std::mutex> lock(s->mu);
    s->done_cv.wait(lock, [&] {
        auto it = s->done.find(id);
        return it != s->done.end() && it->second;
    });
}

void sailor_scheduler_wait_idle(void* sched) {
    auto* s = static_cast<Scheduler*>(sched);
    std::unique_lock<std::mutex> lock(s->mu);
    s->done_cv.wait(lock, [&] { return s->queue.empty() && s->active == 0; });
}

int sailor_scheduler_num_pending(void* sched) {
    auto* s = static_cast<Scheduler*>(sched);
    std::lock_guard<std::mutex> lock(s->mu);
    return (int)s->queue.size() + s->active.load();
}

void sailor_scheduler_destroy(void* sched) {
    auto* s = static_cast<Scheduler*>(sched);
    {
        std::lock_guard<std::mutex> lock(s->mu);
        s->stopping = true;
    }
    s->cv.notify_all();
    for (auto& w : s->workers) w.join();
    delete s;
}

// ---------------------------------------------------------------------------
// Binned-SAH BVH build (Runtime/Raytracing/BVH.cpp counterpart).
// Flat output layout matches sailor_tpu/raytracing/bvh.py exactly.
// ---------------------------------------------------------------------------

namespace {

struct V3 {
    float x, y, z;
    V3 min(const V3& o) const { return {std::min(x, o.x), std::min(y, o.y), std::min(z, o.z)}; }
    V3 max(const V3& o) const { return {std::max(x, o.x), std::max(y, o.y), std::max(z, o.z)}; }
};

constexpr int kSahBins = 16;
constexpr int kLeafSize = 7;  // matches bvh8.MAX_LEAF

struct BuildCtx {
    const float *v0, *v1, *v2;
    std::vector<V3> cent, tmin, tmax;
    int32_t* order;
    float* nmin;
    float* nmax;
    int32_t* nleft;
    int32_t* nstart;
    int32_t* ncount;
    int n_nodes = 0;
    int cap;
    int leaf_size;
};

float half_area(const V3& lo, const V3& hi) {
    float dx = std::max(hi.x - lo.x, 0.f);
    float dy = std::max(hi.y - lo.y, 0.f);
    float dz = std::max(hi.z - lo.z, 0.f);
    return dx * dy + dy * dz + dz * dx;
}

void build_range(BuildCtx& c, int node, int start, int end) {
    V3 lo{1e30f, 1e30f, 1e30f}, hi{-1e30f, -1e30f, -1e30f};
    for (int i = start; i < end; ++i) {
        lo = lo.min(c.tmin[c.order[i]]);
        hi = hi.max(c.tmax[c.order[i]]);
    }
    c.nmin[node * 3 + 0] = lo.x;
    c.nmin[node * 3 + 1] = lo.y;
    c.nmin[node * 3 + 2] = lo.z;
    c.nmax[node * 3 + 0] = hi.x;
    c.nmax[node * 3 + 1] = hi.y;
    c.nmax[node * 3 + 2] = hi.z;
    int count = end - start;
    if (count <= c.leaf_size) {
        c.nstart[node] = start;
        c.ncount[node] = count;
        c.nleft[node] = 0;
        return;
    }
    // centroid bounds + largest axis
    V3 clo{1e30f, 1e30f, 1e30f}, chi{-1e30f, -1e30f, -1e30f};
    for (int i = start; i < end; ++i) {
        clo = clo.min(c.cent[c.order[i]]);
        chi = chi.max(c.cent[c.order[i]]);
    }
    float ext[3] = {chi.x - clo.x, chi.y - clo.y, chi.z - clo.z};
    int axis = ext[1] > ext[0] ? 1 : 0;
    if (ext[2] > ext[axis]) axis = 2;
    int mid;
    if (ext[axis] < 1e-12f) {
        mid = start + count / 2;
    } else {
        float base = axis == 0 ? clo.x : (axis == 1 ? clo.y : clo.z);
        float scale = kSahBins * (1.f - 1e-6f) / ext[axis];
        int bin_count[kSahBins] = {0};
        V3 bin_lo[kSahBins], bin_hi[kSahBins];
        for (int b = 0; b < kSahBins; ++b) {
            bin_lo[b] = {1e30f, 1e30f, 1e30f};
            bin_hi[b] = {-1e30f, -1e30f, -1e30f};
        }
        auto bin_of = [&](int tri) {
            const V3& ce = c.cent[tri];
            float v = axis == 0 ? ce.x : (axis == 1 ? ce.y : ce.z);
            int b = (int)((v - base) * scale);
            return std::min(std::max(b, 0), kSahBins - 1);
        };
        for (int i = start; i < end; ++i) {
            int tri = c.order[i];
            int b = bin_of(tri);
            bin_count[b]++;
            bin_lo[b] = bin_lo[b].min(c.tmin[tri]);
            bin_hi[b] = bin_hi[b].max(c.tmax[tri]);
        }
        // prefix/suffix areas
        float lcost[kSahBins], rcost[kSahBins];
        {
            V3 alo{1e30f, 1e30f, 1e30f}, ahi{-1e30f, -1e30f, -1e30f};
            int n = 0;
            for (int b = 0; b < kSahBins; ++b) {
                alo = alo.min(bin_lo[b]);
                ahi = ahi.max(bin_hi[b]);
                n += bin_count[b];
                lcost[b] = n ? half_area(alo, ahi) * n : 0.f;
            }
            alo = {1e30f, 1e30f, 1e30f};
            ahi = {-1e30f, -1e30f, -1e30f};
            n = 0;
            for (int b = kSahBins - 1; b >= 0; --b) {
                alo = alo.min(bin_lo[b]);
                ahi = ahi.max(bin_hi[b]);
                n += bin_count[b];
                rcost[b] = n ? half_area(alo, ahi) * n : 0.f;
            }
        }
        int best = -1;
        float best_cost = 1e30f;
        int nl = 0;
        for (int b = 0; b < kSahBins - 1; ++b) {
            nl += bin_count[b];
            if (nl == 0 || nl == count) continue;
            float cost = lcost[b] + rcost[b + 1];
            if (cost < best_cost) {
                best_cost = cost;
                best = b;
            }
        }
        if (best < 0) {
            mid = start + count / 2;
        } else {
            // partition by bin
            int i = start, j = end - 1;
            while (i <= j) {
                if (bin_of(c.order[i]) <= best) {
                    ++i;
                } else {
                    std::swap(c.order[i], c.order[j]);
                    --j;
                }
            }
            mid = i;
            if (mid == start || mid == end) mid = start + count / 2;
        }
    }
    if (mid == start || mid == end) {
        // median fallback: nth_element on axis
        mid = start + count / 2;
        std::nth_element(
            c.order + start, c.order + mid, c.order + end,
            [&](int a, int b) {
                const V3 &ca = c.cent[a], &cb = c.cent[b];
                float va = axis == 0 ? ca.x : (axis == 1 ? ca.y : ca.z);
                float vb = axis == 0 ? cb.x : (axis == 1 ? cb.y : cb.z);
                return va < vb;
            });
    }
    int left = c.n_nodes;
    c.n_nodes += 2;
    c.nleft[node] = left;
    c.nstart[node] = 0;
    c.ncount[node] = 0;
    build_range(c, left, start, mid);
    build_range(c, left + 1, mid, end);
}

}  // namespace

// Builds the flat binary BVH. Arrays must be preallocated with capacity
// 2*num_tris nodes (num_tris for `order`). Returns the node count.
int sailor_bvh_build(const float* v0, const float* v1, const float* v2,
                     int num_tris, int leaf_size, float* node_min,
                     float* node_max, int32_t* node_left, int32_t* node_start,
                     int32_t* node_count, int32_t* order) {
    BuildCtx c;
    c.v0 = v0;
    c.v1 = v1;
    c.v2 = v2;
    c.order = order;
    c.nmin = node_min;
    c.nmax = node_max;
    c.nleft = node_left;
    c.nstart = node_start;
    c.ncount = node_count;
    c.cap = 2 * std::max(num_tris, 1);
    c.leaf_size = leaf_size > 0 ? leaf_size : kLeafSize;
    c.cent.resize(num_tris);
    c.tmin.resize(num_tris);
    c.tmax.resize(num_tris);
    for (int i = 0; i < num_tris; ++i) {
        V3 a{v0[i * 3], v0[i * 3 + 1], v0[i * 3 + 2]};
        V3 b{v1[i * 3], v1[i * 3 + 1], v1[i * 3 + 2]};
        V3 d{v2[i * 3], v2[i * 3 + 1], v2[i * 3 + 2]};
        c.tmin[i] = a.min(b).min(d);
        c.tmax[i] = a.max(b).max(d);
        c.cent[i] = {(a.x + b.x + d.x) / 3.f, (a.y + b.y + d.y) / 3.f,
                     (a.z + b.z + d.z) / 3.f};
        order[i] = i;
    }
    c.n_nodes = 1;
    build_range(c, 0, 0, num_tris);
    return c.n_nodes;
}

// ---------------------------------------------------------------------------
// BVH8 packed-row collapse (layout parity with sailor_tpu/raytracing/bvh8.py:
// ROW=72 floats; internal: 8xAABB SoA + child ids + flag; leaf: 7 triangles
// in Moller-Trumbore form + ids + flag).
// ---------------------------------------------------------------------------

namespace {

constexpr int kRow = 72;
constexpr int kIMin = 0, kIMax = 24, kIChild = 48, kFlag = 71;
constexpr int kLV0 = 0, kLE1 = 21, kLE2 = 42, kLId = 63;

struct Collapse {
    const float *nmin, *nmax;
    const int32_t *nleft, *nstart, *ncount;
    const float *v0, *v1, *v2;  // ORIGINAL (unordered) triangle arrays
    const int32_t* order;
    std::vector<float> rows;
    int n_rows = 0;

    int new_row() {
        rows.resize(rows.size() + kRow, 0.f);
        return n_rows++;
    }

    void pack_leaf(int row_id, int start, int count) {
        float* row = &rows[(size_t)row_id * kRow];
        int32_t ids[7];
        for (int k = 0; k < 7; ++k) ids[k] = -1;
        for (int k = 0; k < count && k < 7; ++k) {
            int t = order[start + k];
            const float* a = &v0[t * 3];
            const float* b = &v1[t * 3];
            const float* d = &v2[t * 3];
            row[kLV0 + k] = a[0];
            row[kLV0 + 7 + k] = a[1];
            row[kLV0 + 14 + k] = a[2];
            row[kLE1 + k] = b[0] - a[0];
            row[kLE1 + 7 + k] = b[1] - a[1];
            row[kLE1 + 14 + k] = b[2] - a[2];
            row[kLE2 + k] = d[0] - a[0];
            row[kLE2 + 7 + k] = d[1] - a[1];
            row[kLE2 + 14 + k] = d[2] - a[2];
            ids[k] = t;
        }
        std::memcpy(&row[kLId], ids, sizeof(ids));
        row[kFlag] = 1.0f;
    }

    float area_of(int n) const {
        V3 lo{nmin[n * 3], nmin[n * 3 + 1], nmin[n * 3 + 2]};
        V3 hi{nmax[n * 3], nmax[n * 3 + 1], nmax[n * 3 + 2]};
        return half_area(lo, hi);
    }

    void gather_children(int node, int* slots, int* n_slots) {
        slots[0] = node;
        *n_slots = 1;
        for (;;) {
            int best = -1;
            float best_area = -1.f;
            for (int i = 0; i < *n_slots; ++i) {
                int s = slots[i];
                if (ncount[s] == 0 && area_of(s) > best_area) {
                    best = i;
                    best_area = area_of(s);
                }
            }
            if (best < 0 || *n_slots + 1 > 8) break;
            int s = slots[best];
            slots[best] = nleft[s];
            slots[(*n_slots)++] = nleft[s] + 1;
        }
    }

    void fill(int row_id, int node) {
        if (ncount[node] > 0) {
            pack_leaf(row_id, nstart[node], ncount[node]);
            return;
        }
        int slots[8], n_slots;
        gather_children(node, slots, &n_slots);
        int child_rows[8];
        for (int k = 0; k < n_slots; ++k) child_rows[k] = new_row();
        int32_t child_ids[8];
        for (int k = 0; k < 8; ++k) child_ids[k] = -1;
        float* row = &rows[(size_t)row_id * kRow];
        for (int k = 0; k < n_slots; ++k) {
            fill(child_rows[k], slots[k]);
            row = &rows[(size_t)row_id * kRow];  // rows may have reallocated
            child_ids[k] = child_rows[k];
            int s = slots[k];
            row[kIMin + k] = nmin[s * 3];
            row[kIMin + 8 + k] = nmin[s * 3 + 1];
            row[kIMin + 16 + k] = nmin[s * 3 + 2];
            row[kIMax + k] = nmax[s * 3];
            row[kIMax + 8 + k] = nmax[s * 3 + 1];
            row[kIMax + 16 + k] = nmax[s * 3 + 2];
        }
        for (int k = n_slots; k < 8; ++k) {
            row[kIMin + k] = 1.f;
            row[kIMin + 8 + k] = 1.f;
            row[kIMin + 16 + k] = 1.f;
            row[kIMax + k] = -1.f;
            row[kIMax + 8 + k] = -1.f;
            row[kIMax + 16 + k] = -1.f;
        }
        std::memcpy(&row[kIChild], child_ids, sizeof(child_ids));
        row[kFlag] = 0.0f;
    }
};

}  // namespace

// Builds the packed 8-wide table directly from a triangle soup. Writes up to
// max_rows rows into `table` (kRow floats each); returns the row count, or
// -needed if max_rows was too small.
int sailor_bvh8_build(const float* v0, const float* v1, const float* v2,
                      int num_tris, float* table, int max_rows) {
    int cap = 2 * std::max(num_tris, 1);
    std::vector<float> nmin(cap * 3), nmax(cap * 3);
    std::vector<int32_t> nleft(cap), nstart(cap), ncount(cap), order(std::max(num_tris, 1));
    sailor_bvh_build(v0, v1, v2, num_tris, kLeafSize, nmin.data(), nmax.data(),
                     nleft.data(), nstart.data(), ncount.data(), order.data());
    Collapse c;
    c.nmin = nmin.data();
    c.nmax = nmax.data();
    c.nleft = nleft.data();
    c.nstart = nstart.data();
    c.ncount = ncount.data();
    c.v0 = v0;
    c.v1 = v1;
    c.v2 = v2;
    c.order = order.data();
    int root = c.new_row();
    c.fill(root, 0);
    if (c.n_rows > max_rows) return -c.n_rows;
    std::memcpy(table, c.rows.data(), (size_t)c.n_rows * kRow * sizeof(float));
    return c.n_rows;
}

}  // extern "C"
