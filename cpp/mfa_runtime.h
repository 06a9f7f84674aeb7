// mfa_runtime — native runtime for metal_flash_attention_plus_tpu.
//
// TPU-native counterpart of the reference's C++ engine layer
// (Documentation/CppReference/: GEMMDescriptor/GEMMKernelDescriptor
// resolution, GEMMShaderCache, CoreCount).  On TPU the device code is
// Pallas/XLA, so the native layer owns what remains host-side and
// latency-critical:
//
//   1. Descriptor -> block-config resolution (the VMEM-budget model that
//      mirrors attention/tuning.py's cold-start table).
//   2. A calibration cache with on-disk persistence (flat key/value file;
//      the JSON store stays on the Python side — one canonical schema each).
//   3. A paged KV-cache allocator (fixed-size page pool, per-sequence page
//      lists, O(1) alloc/free) for the serving engine.
//   4. A continuous-batching scheduler: request admission, prefill/decode
//      batch assembly under token budgets, completion/eviction.
//
// Pure C ABI (extern "C") so Python binds with ctypes — no pybind11 in this
// environment.  All handles are opaque int64 ids; thread-safe via one lock
// per subsystem.

#ifndef MFA_RUNTIME_H_
#define MFA_RUNTIME_H_

#include <cstdint>

extern "C" {

// ---------------------------------------------------------------------------
// 1. Block-config resolution
// ---------------------------------------------------------------------------

typedef struct {
  int32_t block_q;
  int32_t block_kv;
  int32_t block_kv_major;  // two-level KV slab (0 = single-level)
  int32_t block_q_dkv;
  int32_t block_kv_dkv;
  int32_t block_q_dq;
  int32_t block_kv_dq;
} MfaBlockConfig;

// kind: 0 = fwd, 1 = fwd_q (quantized), 2 = bwd.
// Returns 0 on success.
/* kind: 0 fwd, 1 fwd quantized, 2 bwd.  causal: 1 = ragged (packed-pair)
 * schedule table, 0 = full-mask dense table. */
int mfa_resolve_blocks(int32_t head_dim, int32_t bits, int32_t kind,
                       int32_t causal, int64_t vmem_budget_bytes,
                       MfaBlockConfig* out);

// VMEM bytes one forward grid step needs (double-buffered tiles + fp32
// accumulator + stats), for feasibility checks / tuner pruning.
int64_t mfa_fwd_step_vmem_bytes(int32_t block_q, int32_t block_kv,
                                int32_t head_dim, int32_t bits);

// Device-generation → resolver VMEM budget (bytes): the per-generation
// parameter-table key (reference: apple9 vs older,
// AttentionDescriptor+Parameters.swift:13-42).  Unknown kinds get a
// conservative budget.  Pass the raw jax device_kind string.
int64_t mfa_device_vmem_budget(const char* device_kind);

typedef struct {
  int32_t block_m;
  int32_t block_n;
  int32_t block_k;
} MfaGemmBlockConfig;

/* Quantized-GEMM block resolution (counterpart of the Python
 * attention/tuning.py::default_gemm_blocks m-bucketed table).
 * mode: 0 = dynamic (W8A8/W4A8 runtime activation quant),
 *       1 = weight-only dequant-on-load.
 * bits: weight width (8 or 4; int4 keeps block_k % 256 for the
 * group-planar unpack).  Returns 0 on success. */
int mfa_resolve_gemm_blocks(int32_t m, int32_t bits, int32_t mode,
                            int64_t vmem_budget_bytes,
                            MfaGemmBlockConfig* out);

// ---------------------------------------------------------------------------
// 2. Calibration cache (flat "key value..." text file)
// ---------------------------------------------------------------------------

typedef struct MfaCalibCache MfaCalibCache;

MfaCalibCache* mfa_calib_open(const char* path);
void mfa_calib_close(MfaCalibCache* c);
// Returns 1 if found (fills out + tflops), 0 otherwise.
int mfa_calib_get(MfaCalibCache* c, const char* key, MfaBlockConfig* out,
                  double* tflops);
void mfa_calib_put(MfaCalibCache* c, const char* key,
                   const MfaBlockConfig* cfg, double tflops);
int mfa_calib_save(MfaCalibCache* c);  // 0 on success
int mfa_calib_size(MfaCalibCache* c);

// ---------------------------------------------------------------------------
// 3. Paged KV-cache allocator
// ---------------------------------------------------------------------------

typedef struct MfaPagePool MfaPagePool;

MfaPagePool* mfa_pool_create(int32_t num_pages, int32_t page_tokens);
void mfa_pool_destroy(MfaPagePool* p);
int32_t mfa_pool_free_pages(MfaPagePool* p);

// Sequences: returns seq handle >= 0, or -1 if no sequence slots.
int64_t mfa_seq_create(MfaPagePool* p);
// Extends seq to hold `num_tokens` total; returns 0, or -1 if OOM (no pages).
int mfa_seq_reserve(MfaPagePool* p, int64_t seq, int32_t num_tokens);
// Current page list (physical page ids per logical page slot).
// Returns number of pages written (<= max_out).
int32_t mfa_seq_pages(MfaPagePool* p, int64_t seq, int32_t* out,
                      int32_t max_out);
int32_t mfa_seq_len(MfaPagePool* p, int64_t seq);
void mfa_seq_set_len(MfaPagePool* p, int64_t seq, int32_t len);
void mfa_seq_release(MfaPagePool* p, int64_t seq);

// ---------------------------------------------------------------------------
// 4. Continuous-batching scheduler
// ---------------------------------------------------------------------------

typedef struct MfaScheduler MfaScheduler;

typedef struct {
  int64_t request_id;
  int32_t prompt_len;
  int32_t max_new_tokens;
} MfaRequest;

typedef struct {
  int64_t request_id;
  int64_t seq_handle;   // page-pool sequence
  int32_t kind;         // 0 = prefill, 1 = decode
  int32_t chunk_start;  // prefill chunk offset into the prompt
  int32_t chunk_len;    // prefill tokens this step (0 for decode)
} MfaScheduledItem;

// max_batch: max concurrent sequences; token_budget: max prefill tokens
// per step (chunked prefill); pool: page allocator backing the KV cache.
MfaScheduler* mfa_sched_create(MfaPagePool* pool, int32_t max_batch,
                               int32_t token_budget);
void mfa_sched_destroy(MfaScheduler* s);

// Enqueue a request. Returns 0, or -1 if the queue is full.
int mfa_sched_submit(MfaScheduler* s, const MfaRequest* req);

// Decode tokens granted (and KV slots reserved) per decode item per step
// (default 1).  >1 lets the host fuse that many decode iterations into a
// single device dispatch; the grant rides the item's chunk_len.
void mfa_sched_set_decode_chunk(MfaScheduler* s, int32_t n);

// Assemble the next step: fills up to max_out items, returns the count.
// Prefill chunks are scheduled before decodes; decodes cover every running
// sequence (decode items carry the multi-token grant in chunk_len).
// Reserves KV pages as needed; requests that cannot get pages stay queued.
int32_t mfa_sched_next_step(MfaScheduler* s, MfaScheduledItem* out,
                            int32_t max_out);

// Report one generated token for a running request (after a decode step).
// finished != 0 completes the request and releases its pages.
int mfa_sched_token(MfaScheduler* s, int64_t request_id, int finished);

// Total mid-stream preemptions (recompute policy: when EVERY runner is
// page-blocked, the youngest is evicted, its pages released, and it is
// re-queued at the waiting front with generated tokens folded into
// prompt_len — the host must re-prefill prompt+generated tokens).
int64_t mfa_sched_num_preempted(MfaScheduler* s);

int32_t mfa_sched_num_waiting(MfaScheduler* s);
int32_t mfa_sched_num_running(MfaScheduler* s);

}  // extern "C"

#endif  // MFA_RUNTIME_H_
