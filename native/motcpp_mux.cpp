// Native stream multiplexer for the serving runtime.
//
// The TPU tracker core consumes fixed-shape batches: S stream slots x N
// detection slots per frame. Production ingest is the opposite shape —
// many independent camera feeds pushing variable-length detection lists
// at their own cadence, from their own threads. This module is the
// runtime between the two: per-slot bounded frame queues guarded by
// per-slot mutexes, and an `assemble` call that gathers the oldest
// queued frame of every live stream directly into caller-provided
// (numpy) batch buffers — one memcpy per frame, no Python-side loop.
//
// The reference library has no serving layer (it is a single-threaded
// per-frame C++ library; its scaling advice is one tracker instance per
// thread, reference: docs/guides/architecture.md:246-258). This is the
// TPU-native equivalent of that advice: threads feed slots, one device
// steps all slots at once.
//
// Concurrency contract:
//   * motmux_submit may be called concurrently from any number of
//     threads, including for the same slot.
//   * motmux_assemble may run concurrently with submits (it takes each
//     slot lock in turn); only one assemble at a time per mux.
//   * attach/detach are serialized by the allocator lock.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 motcpp_mux.cpp -o libmotcpp_mux.so
// (motcpp_tpu/serving/mux.py builds it on first use, with a pure-Python
// fallback when no toolchain is available.)

#include <atomic>
#include <cstdint>
#include <cstring>
#include <memory>
#include <mutex>
#include <vector>

namespace {

constexpr int kDetCols = 6;  // x1, y1, x2, y2, conf, cls

constexpr int kWarpElems = 6;  // 2x3 partial-affine camera warp

struct Slot {
  std::mutex m;
  bool attached = false;
  uint64_t generation = 0;  // bumped on every attach; stale handles fail
  int head = 0;             // ring index of the oldest queued frame
  int count = 0;            // queued frames
  std::vector<float> dets;   // depth * N * 6
  std::vector<float> embs;   // depth * N * D (empty when D == 0)
  std::vector<uint8_t> crops;  // depth * N * C (empty when C == 0)
  std::vector<float> warps;  // depth * 6 (identity when not supplied)
  std::vector<int> ndet;     // detections in each queued frame
  uint64_t submitted = 0;
  uint64_t dropped = 0;  // frames evicted by drop-oldest on overflow
};

struct Mux {
  int S, N, D, depth;
  int C = 0;  // bytes per detection crop (Hc * Wc * 3); 0 = no crops leg
  std::unique_ptr<Slot[]> slots;
  std::mutex alloc_m;
  int next_probe = 0;  // round-robin attach cursor
  std::atomic<uint64_t> assembled{0};
};

Mux* as_mux(void* h) { return static_cast<Mux*>(h); }

}  // namespace

extern "C" {

// Bumped on every exported-signature change (create grew crop_bytes and
// submit/assemble grew crop pointers at v2). The Python loader refuses
// a library whose version differs from its own expectation — a stale
// .so that survives an mtime check (e.g. tar/rsync-deployed trees)
// would otherwise be called through mismatched ctypes signatures and
// silently drop arguments.
int motmux_abi_version(void) { return 2; }

// Create a mux with S stream slots, N detection slots per frame,
// embedding dim D (0 = no embeddings), per-slot queue depth, and
// crop_bytes per detection (Hc * Wc * 3 uint8 for the live-ReID crops
// leg; 0 = no crops). The crops leg is how raw pixels reach the
// in-graph ReID CNN at serving scale (the reference instead crops
// inside update() on the host, reference: onnx_backend.cpp:110-223).
void* motmux_create(int S, int N, int D, int depth, int crop_bytes) {
  if (S <= 0 || N <= 0 || D < 0 || depth <= 0 || crop_bytes < 0)
    return nullptr;
  auto* mux = new (std::nothrow) Mux();
  if (!mux) return nullptr;
  mux->S = S;
  mux->N = N;
  mux->D = D;
  mux->depth = depth;
  mux->C = crop_bytes;
  mux->slots = std::make_unique<Slot[]>(S);
  for (int s = 0; s < S; ++s) {
    mux->slots[s].dets.resize(size_t(depth) * N * kDetCols);
    if (D > 0) mux->slots[s].embs.resize(size_t(depth) * N * D);
    if (crop_bytes > 0)
      mux->slots[s].crops.resize(size_t(depth) * N * crop_bytes);
    mux->slots[s].warps.resize(size_t(depth) * kWarpElems);
    mux->slots[s].ndet.resize(depth);
  }
  return mux;
}

void motmux_destroy(void* h) { delete as_mux(h); }

// Claim a free slot; returns the slot index or -1 when full. The new
// generation is readable via motmux_generation.
int motmux_attach(void* h) {
  Mux* mux = as_mux(h);
  std::lock_guard<std::mutex> g(mux->alloc_m);
  for (int k = 0; k < mux->S; ++k) {
    int s = (mux->next_probe + k) % mux->S;
    Slot& slot = mux->slots[s];
    std::lock_guard<std::mutex> sg(slot.m);
    if (!slot.attached) {
      slot.attached = true;
      slot.generation += 1;
      slot.head = 0;
      slot.count = 0;
      mux->next_probe = s + 1;
      return s;
    }
  }
  return -1;
}

// Release a slot; queued frames are discarded. Returns 0, or -1 for an
// invalid/unattached slot.
int motmux_detach(void* h, int slot_id) {
  Mux* mux = as_mux(h);
  if (slot_id < 0 || slot_id >= mux->S) return -1;
  Slot& slot = mux->slots[slot_id];
  std::lock_guard<std::mutex> sg(slot.m);
  if (!slot.attached) return -1;
  slot.attached = false;
  slot.count = 0;
  return 0;
}

long motmux_generation(void* h, int slot_id) {
  Mux* mux = as_mux(h);
  if (slot_id < 0 || slot_id >= mux->S) return -1;
  Slot& slot = mux->slots[slot_id];
  std::lock_guard<std::mutex> sg(slot.m);
  return long(slot.generation);
}

// Queue one frame for a slot. dets is (n, 6) row-major float32; embs is
// (n, D) or null; warp is a (2, 3) row-major camera warp or null
// (identity). Rows beyond the mux's N capacity are truncated. When
// the queue is full the OLDEST frame is evicted (live streams prefer
// freshness over completeness). Returns the number of queued frames
// after the submit, or -1 for an invalid slot.
int motmux_submit(void* h, int slot_id, const float* dets, int n,
                  const float* embs, const float* warp,
                  const unsigned char* crops) {
  Mux* mux = as_mux(h);
  if (slot_id < 0 || slot_id >= mux->S || n < 0 || !dets) return -1;
  Slot& slot = mux->slots[slot_id];
  std::lock_guard<std::mutex> sg(slot.m);
  if (!slot.attached) return -1;
  if (n > mux->N) n = mux->N;
  if (slot.count == mux->depth) {  // drop-oldest
    slot.head = (slot.head + 1) % mux->depth;
    slot.count -= 1;
    slot.dropped += 1;
  }
  int pos = (slot.head + slot.count) % mux->depth;
  std::memcpy(slot.dets.data() + size_t(pos) * mux->N * kDetCols, dets,
              size_t(n) * kDetCols * sizeof(float));
  if (mux->D > 0) {
    float* dst = slot.embs.data() + size_t(pos) * mux->N * mux->D;
    if (embs) {
      std::memcpy(dst, embs, size_t(n) * mux->D * sizeof(float));
    } else {
      std::memset(dst, 0, size_t(n) * mux->D * sizeof(float));
    }
  }
  if (mux->C > 0) {
    unsigned char* dst = slot.crops.data() + size_t(pos) * mux->N * mux->C;
    if (crops) {
      std::memcpy(dst, crops, size_t(n) * mux->C);
    } else {
      std::memset(dst, 0, size_t(n) * mux->C);
    }
  }
  {
    static const float kIdentity[kWarpElems] = {1, 0, 0, 0, 1, 0};
    std::memcpy(slot.warps.data() + size_t(pos) * kWarpElems,
                warp ? warp : kIdentity, kWarpElems * sizeof(float));
  }
  slot.ndet[pos] = n;
  slot.count += 1;
  slot.submitted += 1;
  return slot.count;
}

// Pop the oldest queued frame of every attached slot into the batch
// buffers: dets_out (S, N, 6) f32, mask_out (S, N) u8, embs_out
// (S, N, D) f32 or null when D == 0, warps_out (S, 2, 3) f32 or null,
// present_out (S,) u8. Slots with an empty queue (or unattached) get
// present = 0, an all-false mask, and the identity warp. Returns the
// number of present streams.
int motmux_assemble(void* h, float* dets_out, unsigned char* mask_out,
                    float* embs_out, float* warps_out,
                    unsigned char* present_out, unsigned char* crops_out) {
  Mux* mux = as_mux(h);
  if (!dets_out || !mask_out || !present_out) return -1;
  if (mux->D > 0 && !embs_out) return -1;
  if (mux->C > 0 && !crops_out) return -1;
  const int N = mux->N, D = mux->D, C = mux->C;
  static const float kIdentity[kWarpElems] = {1, 0, 0, 0, 1, 0};
  int n_present = 0;
  for (int s = 0; s < mux->S; ++s) {
    Slot& slot = mux->slots[s];
    float* drow = dets_out + size_t(s) * N * kDetCols;
    unsigned char* mrow = mask_out + size_t(s) * N;
    float* erow = D > 0 ? embs_out + size_t(s) * N * D : nullptr;
    unsigned char* crow = C > 0 ? crops_out + size_t(s) * N * C : nullptr;
    float* wrow = warps_out ? warps_out + size_t(s) * kWarpElems : nullptr;
    std::lock_guard<std::mutex> sg(slot.m);
    if (!slot.attached || slot.count == 0) {
      present_out[s] = 0;
      std::memset(mrow, 0, size_t(N));
      if (wrow) std::memcpy(wrow, kIdentity, kWarpElems * sizeof(float));
      continue;
    }
    int pos = slot.head;
    int n = slot.ndet[pos];
    std::memcpy(drow, slot.dets.data() + size_t(pos) * N * kDetCols,
                size_t(n) * kDetCols * sizeof(float));
    std::memset(drow + size_t(n) * kDetCols, 0,
                size_t(N - n) * kDetCols * sizeof(float));
    if (D > 0) {
      std::memcpy(erow, slot.embs.data() + size_t(pos) * N * D,
                  size_t(n) * D * sizeof(float));
      std::memset(erow + size_t(n) * D, 0, size_t(N - n) * D * sizeof(float));
    }
    if (C > 0) {
      std::memcpy(crow, slot.crops.data() + size_t(pos) * N * C,
                  size_t(n) * C);
      std::memset(crow + size_t(n) * C, 0, size_t(N - n) * C);
    }
    if (wrow) {
      std::memcpy(wrow, slot.warps.data() + size_t(pos) * kWarpElems,
                  kWarpElems * sizeof(float));
    }
    std::memset(mrow, 1, size_t(n));
    std::memset(mrow + n, 0, size_t(N - n));
    present_out[s] = 1;
    slot.head = (slot.head + 1) % mux->depth;
    slot.count -= 1;
    ++n_present;
  }
  mux->assembled.fetch_add(1, std::memory_order_relaxed);
  return n_present;
}

// Queued frames for one slot (-1 for invalid slot).
int motmux_pending(void* h, int slot_id) {
  Mux* mux = as_mux(h);
  if (slot_id < 0 || slot_id >= mux->S) return -1;
  Slot& slot = mux->slots[slot_id];
  std::lock_guard<std::mutex> sg(slot.m);
  return slot.attached ? slot.count : -1;
}

// Aggregate counters: 0 = frames submitted, 1 = frames dropped
// (overflow evictions), 2 = assemble calls, 3 = attached slots.
long motmux_stats(void* h, int which) {
  Mux* mux = as_mux(h);
  if (which == 2) return long(mux->assembled.load(std::memory_order_relaxed));
  long total = 0;
  for (int s = 0; s < mux->S; ++s) {
    Slot& slot = mux->slots[s];
    std::lock_guard<std::mutex> sg(slot.m);
    if (which == 0) total += long(slot.submitted);
    if (which == 1) total += long(slot.dropped);
    if (which == 3) total += slot.attached ? 1 : 0;
  }
  return total;
}

}  // extern "C"
