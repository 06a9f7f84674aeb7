// mfa_runtime implementation.  See mfa_runtime.h for the architecture notes.

#include "mfa_runtime.h"

#include <algorithm>
#include <cstdio>
#include <cstring>
#include <deque>
#include <fstream>
#include <map>
#include <mutex>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

// ---------------------------------------------------------------------------
// 1. Block-config resolution
// ---------------------------------------------------------------------------

namespace {

int32_t round_up(int32_t a, int32_t b) { return ((a + b - 1) / b) * b; }

}  // namespace

extern "C" int64_t mfa_fwd_step_vmem_bytes(int32_t block_q, int32_t block_kv,
                                           int32_t head_dim, int32_t bits) {
  const int64_t d = std::max<int32_t>(head_dim, 128);
  const int64_t in_bytes = bits <= 8 ? 1 : 2;  // payload width
  // Double-buffered Q/K/V tiles + fp32 accumulator + 2 stats tiles (bq x 128)
  // + fp32 score tile (bq x bkv) live during the step.
  int64_t q_tile = 2LL * block_q * d * 2;         // q is bf16 at widest
  int64_t kv_tiles = 2LL * 2 * block_kv * d * in_bytes;
  int64_t acc = 4LL * block_q * d;
  int64_t stats = 2LL * 4 * block_q * 128;
  int64_t scores = 4LL * block_q * block_kv;
  return q_tile + kv_tiles + acc + stats + scores;
}

// Device-generation → VMEM budget (bytes) for the resolver — the TPU
// analog of the reference's per-generation parameter-table key (apple9 vs
// older, AttentionDescriptor+Parameters.swift:13-42).  v5e is the measured
// basis; v6e-class chips carry a roomier VMEM (deeper major slab); an
// unrecognized device kind gets a CONSERVATIVE budget so the cold table
// never over-allocates on unknown hardware (the calibration cache then
// specializes per device).  Mirrors attention/tuning.py::_GEN_VMEM_MIB.
extern "C" int64_t mfa_device_vmem_budget(const char* device_kind) {
  if (device_kind == nullptr) return 14LL << 20;
  std::string k(device_kind);
  for (auto& c : k) c = static_cast<char>(std::tolower(c));
  auto has = [&](const char* s) { return k.find(s) != std::string::npos; };
  if (has("v5 lite") || has("v5e") || has("v5lite")) return 14LL << 20;
  if (has("v6") || has("trillium")) return 28LL << 20;
  if (has("v5p") || has("v5")) return 14LL << 20;
  if (has("v4")) return 14LL << 20;
  return 7LL << 20;  // unknown: conservative
}

extern "C" int mfa_resolve_blocks(int32_t head_dim, int32_t bits,
                                  int32_t kind, int32_t causal,
                                  int64_t vmem_budget_bytes,
                                  MfaBlockConfig* out) {
  if (out == nullptr || head_dim <= 0) return -1;
  if (vmem_budget_bytes <= 0) vmem_budget_bytes = 14LL << 20;  // ~16MB - slack

  // Cold-start table mirroring attention/tuning.py::default_block_sizes —
  // round-2 two-level rework measured on v5e (docs/perf_notes.md
  // "Two-level KV tiling"): block_kv_major is the per-grid-step KV slab.
  int32_t bq, bkv, bkvm;
  if (bits <= 8) {
    if (head_dim <= 64) {
      bq = 1024; bkv = 512; bkvm = 1024;
    } else if (head_dim <= 128) {
      bq = 1024; bkv = 1024; bkvm = 2048;
    } else if (bits == 4) {
      // Folded int4 path optimum (slope-measured, exp23, two sessions):
      // M2048 beats M1024 within-run (113.3 vs 106.6 TF/s K4V4).
      bq = 512; bkv = 512; bkvm = 2048;
    } else {
      bq = 512; bkv = 512; bkvm = 2048;
    }
  } else if (head_dim > 128) {
    bq = 1024; bkv = 512; bkvm = 1024;
  } else if (causal != 0 && head_dim <= 64) {
    bq = 512; bkv = 512; bkvm = 4096;
  } else if (head_dim <= 64) {
    bq = 1024; bkv = 1024; bkvm = 2048;
  } else {
    bq = 512; bkv = 512; bkvm = 2048;
  }

  // A roomier-than-v5e budget admits a deeper major slab (more inner
  // unroll = more MXU/VPU overlap), capped at 4 inner tiles — the Mosaic
  // mega-body crash boundary (docs/perf_notes.md round 2).
  if (vmem_budget_bytes > (20LL << 20)) {
    bkvm = std::min(bkvm * 2, 4 * bkv);
  }

  // Shrink (major slab first, then kv, then q) until the VMEM model —
  // with the MAJOR slab as the double-buffered KV resident — fits.
  auto step_bytes = [&]() {
    const int64_t d = std::max<int32_t>(head_dim, 128);
    const int64_t in_bytes = bits <= 8 ? 1 : 2;
    int64_t q_tile = 2LL * bq * d * 2;
    int64_t kv_tiles = 2LL * 2 * bkvm * d * in_bytes;
    int64_t acc = 4LL * bq * d;
    int64_t stats = 2LL * 4 * bq * 128;
    int64_t scores = 4LL * bq * bkv;
    return q_tile + kv_tiles + acc + stats + scores;
  };
  while (step_bytes() > vmem_budget_bytes &&
         (bq > 128 || bkv > 128 || bkvm > bkv)) {
    if (bkvm > bkv) {
      bkvm /= 2;
    } else if (bkv > bq && bkv > 128) {
      bkv /= 2;
      bkvm = bkv;
    } else if (bq > 128) {
      bq /= 2;
    } else {
      bkv /= 2;
      bkvm = bkv;
    }
  }
  bq = std::max(bq, 128);
  bkv = std::max(bkv, 128);
  bkvm = std::max(bkvm, bkv);

  out->block_q = bq;
  out->block_kv = bkv;
  // Major slab shrinks with the inner tile under VMEM pressure (and never
  // drops below it — 0 would mean single-level, keep it explicit).
  out->block_kv_major = std::max(bkvm, bkv);
  if (out->block_kv_major % bkv != 0)
    out->block_kv_major = (out->block_kv_major / bkv) * bkv;
  // Backward kernels: (512, 512) measured best (docs/perf_notes.md).
  out->block_q_dkv = std::min(bq, 512);
  out->block_kv_dkv = std::min(bkv, 512);
  out->block_q_dq = std::min(bq, 512);
  out->block_kv_dq = std::min(bkv, 512);
  (void)kind;
  return 0;
}

extern "C" int mfa_resolve_gemm_blocks(int32_t m, int32_t bits, int32_t mode,
                                       int64_t vmem_budget_bytes,
                                       MfaGemmBlockConfig* out) {
  if (out == nullptr || m <= 0 || (bits != 8 && bits != 4)) return -1;
  if (vmem_budget_bytes <= 0) vmem_budget_bytes = 14LL << 20;

  // Cold table mirroring attention/tuning.py::default_gemm_blocks
  // (v5e measurements, docs/perf_notes.md "Quantized GEMM"): decode
  // shapes (M <= 256) want a narrow M tile with deep N/K slabs.
  int32_t bm, bn, bk;
  if (m <= 256) {
    bm = 128; bn = 1024; bk = 2048;
  } else {
    // (512,1024,1024): 122.8 TF/s folded weight-only at M=4096 N=K=8192
    // (parity with XLA bf16 at half the weight bytes).
    bm = 512; bn = 1024; bk = 1024;
  }

  // VMEM model per grid step, double-buffered inputs: int8 A tile +
  // weight tile at `bits` width + int32 accumulator + f32 output pass.
  auto step_bytes = [&]() {
    int64_t a_tile = 2LL * bm * bk;                    // int8
    int64_t w_tile = 2LL * bn * bk * (bits == 4 ? 1 : 1);  // packed <= 1B
    int64_t acc = 4LL * bm * bn;                       // int32
    int64_t outp = 4LL * bm * bn;                      // f32 store pass
    return a_tile + w_tile + acc + outp;
  };
  while (step_bytes() > vmem_budget_bytes &&
         (bk > 256 || bn > 128 || bm > 128)) {
    if (bk > (bits == 4 ? 512 : 256)) {
      bk /= 2;
    } else if (bn > 128) {
      bn /= 2;
    } else if (bm > 128) {
      bm /= 2;
    } else {
      break;
    }
  }
  if (bits == 4 && bk % 256 != 0) bk = ((bk / 256) + 1) * 256;
  (void)mode;  // same table for both paths today; split when measurements
               // diverge (the weight-only path is VPU-bound at decode).
  out->block_m = bm;
  out->block_n = bn;
  out->block_k = bk;
  return 0;
}

// ---------------------------------------------------------------------------
// 2. Calibration cache
// ---------------------------------------------------------------------------

struct MfaCalibCache {
  std::mutex mu;
  std::string path;
  struct Entry {
    MfaBlockConfig cfg;
    double tflops;
  };
  std::map<std::string, Entry> entries;
};

extern "C" MfaCalibCache* mfa_calib_open(const char* path) {
  auto* c = new MfaCalibCache();
  c->path = path ? path : "";
  if (!c->path.empty()) {
    std::ifstream in(c->path);
    std::string line;
    while (std::getline(in, line)) {
      std::istringstream ss(line);
      std::string key;
      MfaCalibCache::Entry e;
      if (ss >> key >> e.tflops >> e.cfg.block_q >> e.cfg.block_kv >>
          e.cfg.block_kv_major >>
          e.cfg.block_q_dkv >> e.cfg.block_kv_dkv >> e.cfg.block_q_dq >>
          e.cfg.block_kv_dq) {
        c->entries[key] = e;
      }
    }
  }
  return c;
}

extern "C" void mfa_calib_close(MfaCalibCache* c) { delete c; }

extern "C" int mfa_calib_get(MfaCalibCache* c, const char* key,
                             MfaBlockConfig* out, double* tflops) {
  if (!c || !key) return 0;
  std::lock_guard<std::mutex> lock(c->mu);
  auto it = c->entries.find(key);
  if (it == c->entries.end()) return 0;
  if (out) *out = it->second.cfg;
  if (tflops) *tflops = it->second.tflops;
  return 1;
}

extern "C" void mfa_calib_put(MfaCalibCache* c, const char* key,
                              const MfaBlockConfig* cfg, double tflops) {
  if (!c || !key || !cfg) return;
  std::lock_guard<std::mutex> lock(c->mu);
  c->entries[key] = {*cfg, tflops};
}

extern "C" int mfa_calib_save(MfaCalibCache* c) {
  if (!c || c->path.empty()) return -1;
  std::lock_guard<std::mutex> lock(c->mu);
  std::string tmp = c->path + ".tmp";
  {
    std::ofstream outf(tmp, std::ios::trunc);
    if (!outf) return -1;
    for (const auto& [key, e] : c->entries) {
      outf << key << ' ' << e.tflops << ' ' << e.cfg.block_q << ' '
           << e.cfg.block_kv << ' ' << e.cfg.block_kv_major << ' '
           << e.cfg.block_q_dkv << ' '
           << e.cfg.block_kv_dkv << ' ' << e.cfg.block_q_dq << ' '
           << e.cfg.block_kv_dq << '\n';
    }
  }
  return std::rename(tmp.c_str(), c->path.c_str()) == 0 ? 0 : -1;
}

extern "C" int mfa_calib_size(MfaCalibCache* c) {
  if (!c) return 0;
  std::lock_guard<std::mutex> lock(c->mu);
  return static_cast<int>(c->entries.size());
}

// ---------------------------------------------------------------------------
// 3. Paged KV-cache allocator
// ---------------------------------------------------------------------------

struct MfaPagePool {
  std::mutex mu;
  int32_t page_tokens = 0;
  std::vector<int32_t> free_list;  // physical page ids
  struct Seq {
    std::vector<int32_t> pages;
    int32_t len = 0;
    bool live = false;
  };
  std::vector<Seq> seqs;
  std::deque<int64_t> free_seq_slots;
};

extern "C" MfaPagePool* mfa_pool_create(int32_t num_pages,
                                        int32_t page_tokens) {
  if (num_pages <= 0 || page_tokens <= 0) return nullptr;
  auto* p = new MfaPagePool();
  p->page_tokens = page_tokens;
  p->free_list.reserve(num_pages);
  // LIFO free list: recently released pages are reused first (warm in HBM
  // layout terms, and keeps page ids dense for compact gather indices).
  for (int32_t i = num_pages - 1; i >= 0; --i) p->free_list.push_back(i);
  return p;
}

extern "C" void mfa_pool_destroy(MfaPagePool* p) { delete p; }

extern "C" int32_t mfa_pool_free_pages(MfaPagePool* p) {
  if (!p) return 0;
  std::lock_guard<std::mutex> lock(p->mu);
  return static_cast<int32_t>(p->free_list.size());
}

extern "C" int64_t mfa_seq_create(MfaPagePool* p) {
  if (!p) return -1;
  std::lock_guard<std::mutex> lock(p->mu);
  int64_t id;
  if (!p->free_seq_slots.empty()) {
    id = p->free_seq_slots.front();
    p->free_seq_slots.pop_front();
  } else {
    id = static_cast<int64_t>(p->seqs.size());
    p->seqs.emplace_back();
  }
  p->seqs[id] = MfaPagePool::Seq();
  p->seqs[id].live = true;
  return id;
}

extern "C" int mfa_seq_reserve(MfaPagePool* p, int64_t seq,
                               int32_t num_tokens) {
  if (!p || seq < 0) return -1;
  std::lock_guard<std::mutex> lock(p->mu);
  if (seq >= static_cast<int64_t>(p->seqs.size()) || !p->seqs[seq].live)
    return -1;
  auto& s = p->seqs[seq];
  int32_t need_pages =
      (num_tokens + p->page_tokens - 1) / p->page_tokens;
  int32_t have = static_cast<int32_t>(s.pages.size());
  if (need_pages <= have) return 0;
  int32_t missing = need_pages - have;
  if (missing > static_cast<int32_t>(p->free_list.size())) return -1;
  for (int32_t i = 0; i < missing; ++i) {
    s.pages.push_back(p->free_list.back());
    p->free_list.pop_back();
  }
  return 0;
}

extern "C" int32_t mfa_seq_pages(MfaPagePool* p, int64_t seq, int32_t* out,
                                 int32_t max_out) {
  if (!p || seq < 0 || !out) return 0;
  std::lock_guard<std::mutex> lock(p->mu);
  if (seq >= static_cast<int64_t>(p->seqs.size()) || !p->seqs[seq].live)
    return 0;
  const auto& pages = p->seqs[seq].pages;
  int32_t n = std::min<int32_t>(max_out, pages.size());
  std::memcpy(out, pages.data(), n * sizeof(int32_t));
  return n;
}

extern "C" int32_t mfa_seq_len(MfaPagePool* p, int64_t seq) {
  if (!p || seq < 0) return -1;
  std::lock_guard<std::mutex> lock(p->mu);
  if (seq >= static_cast<int64_t>(p->seqs.size()) || !p->seqs[seq].live)
    return -1;
  return p->seqs[seq].len;
}

extern "C" void mfa_seq_set_len(MfaPagePool* p, int64_t seq, int32_t len) {
  if (!p || seq < 0) return;
  std::lock_guard<std::mutex> lock(p->mu);
  if (seq >= static_cast<int64_t>(p->seqs.size()) || !p->seqs[seq].live)
    return;
  p->seqs[seq].len = len;
}

extern "C" void mfa_seq_release(MfaPagePool* p, int64_t seq) {
  if (!p || seq < 0) return;
  std::lock_guard<std::mutex> lock(p->mu);
  if (seq >= static_cast<int64_t>(p->seqs.size()) || !p->seqs[seq].live)
    return;
  auto& s = p->seqs[seq];
  for (int32_t page : s.pages) p->free_list.push_back(page);
  s = MfaPagePool::Seq();
  p->free_seq_slots.push_back(seq);
}

// ---------------------------------------------------------------------------
// 4. Continuous-batching scheduler
// ---------------------------------------------------------------------------

struct MfaScheduler {
  std::mutex mu;
  MfaPagePool* pool = nullptr;
  int32_t max_batch = 0;
  int32_t token_budget = 0;
  // Decode tokens scheduled (and KV slots reserved) per decode item per
  // step — >1 lets the host FUSE that many decode iterations into one
  // device dispatch (lax.scan), amortizing the per-dispatch host cost
  // that dominates long-context decode.  The host reports each generated
  // token individually (mfa_sched_token), so completion accounting is
  // unchanged; over-reserved slots of an early (EOS) finish are freed on
  // release.
  int32_t decode_chunk = 1;

  struct Running {
    MfaRequest req;
    int64_t seq = -1;
    int32_t prefill_done = 0;  // prompt tokens already prefilled
    int32_t generated = 0;
  };
  std::deque<MfaRequest> waiting;
  std::unordered_map<int64_t, Running> running;  // by request_id
  std::vector<int64_t> running_order;            // admission order
  int64_t preempted_total = 0;  // recompute-policy evictions (see below)
  // Set while a preempted request waits for a COMPLETION to free pages:
  // re-admitting it immediately would ping-pong (the freed pages go
  // straight back to the evictee while the blocked decoder still
  // starves).  Cleared when any request finishes.
  bool admission_blocked = false;
};

extern "C" MfaScheduler* mfa_sched_create(MfaPagePool* pool, int32_t max_batch,
                                          int32_t token_budget) {
  if (!pool || max_batch <= 0 || token_budget <= 0) return nullptr;
  auto* s = new MfaScheduler();
  s->pool = pool;
  s->max_batch = max_batch;
  s->token_budget = token_budget;
  return s;
}

extern "C" void mfa_sched_destroy(MfaScheduler* s) { delete s; }

extern "C" int mfa_sched_submit(MfaScheduler* s, const MfaRequest* req) {
  if (!s || !req || req->prompt_len <= 0) return -1;
  std::lock_guard<std::mutex> lock(s->mu);
  s->waiting.push_back(*req);
  return 0;
}

extern "C" void mfa_sched_set_decode_chunk(MfaScheduler* s, int32_t n) {
  if (!s || n < 1) return;
  std::lock_guard<std::mutex> lock(s->mu);
  s->decode_chunk = n;
}

extern "C" int32_t mfa_sched_next_step(MfaScheduler* s, MfaScheduledItem* out,
                                       int32_t max_out) {
  if (!s || !out || max_out <= 0) return 0;
  std::lock_guard<std::mutex> lock(s->mu);
  int32_t n = 0;
  // Outer retry loop: when a full pass schedules NOTHING while sequences
  // run, every runner is page-blocked mid-stream — preempt the YOUNGEST
  // (vLLM's recompute policy: release its pages, re-queue it at the
  // front of waiting with its generated tokens folded into the prompt
  // so the host re-prefills them) and try again.  Bounded by the number
  // of runners.
  for (int32_t pass = 0;
       pass <= static_cast<int32_t>(s->running_order.size()); ++pass) {
    int32_t budget = s->token_budget;

    // Admit waiting requests while batch slots + pages allow (FCFS;
    // pages reserved for the whole prompt up front so admitted prefills
    // never deadlock mid-prompt).  Admission pauses while a preempted
    // request waits on a completion (see admission_blocked).
    while (!s->admission_blocked && !s->waiting.empty() &&
           static_cast<int32_t>(s->running.size()) < s->max_batch) {
      MfaRequest req = s->waiting.front();
      int64_t seq = mfa_seq_create(s->pool);
      if (seq < 0) break;
      if (mfa_seq_reserve(s->pool, seq, req.prompt_len) != 0) {
        mfa_seq_release(s->pool, seq);
        break;  // no pages — keep waiting (completions will free some)
      }
      s->waiting.pop_front();
      MfaScheduler::Running r;
      r.req = req;
      r.seq = seq;
      s->running[req.request_id] = r;
      s->running_order.push_back(req.request_id);
    }

    // Phase 1: prefill chunks (chunked so one long prompt cannot starve
    // decodes — the standard continuous-batching shape).
    for (int64_t id : s->running_order) {
      if (n >= max_out || budget <= 0) break;
      auto it = s->running.find(id);
      if (it == s->running.end()) continue;
      auto& r = it->second;
      int32_t remaining = r.req.prompt_len - r.prefill_done;
      if (remaining <= 0) continue;
      int32_t chunk = std::min(remaining, budget);
      out[n++] = {id, r.seq, /*kind=*/0, r.prefill_done, chunk};
      r.prefill_done += chunk;
      budget -= chunk;
      mfa_seq_set_len(s->pool, r.seq, r.prefill_done);
    }

    // Phase 2: decode for every fully-prefilled sequence
    // (``decode_chunk`` tokens each; chunk_len carries the grant).
    for (int64_t id : s->running_order) {
      if (n >= max_out) break;
      auto it = s->running.find(id);
      if (it == s->running.end()) continue;
      auto& r = it->second;
      if (r.prefill_done < r.req.prompt_len) continue;
      int32_t remaining = r.req.max_new_tokens - r.generated;
      if (remaining <= 0) continue;
      int32_t chunk = std::min(s->decode_chunk, remaining);
      if (chunk < 1) chunk = 1;
      // The chunk's decode tokens each need a KV slot; under page
      // pressure fall back to single-token grants before skipping.
      while (chunk >= 1 &&
             mfa_seq_reserve(s->pool, r.seq,
                             r.req.prompt_len + r.generated + chunk) != 0)
        chunk /= 2;
      if (chunk < 1) continue;  // page pressure: frees will unblock
      out[n++] = {id, r.seq, /*kind=*/1, 0, chunk};
    }
    if (n > 0) return n;
    if (s->running_order.empty()) break;

    // Every runner is page-blocked: evict the youngest.  Its generated
    // tokens fold into the prompt (the host holds the token ids and
    // re-prefills prompt+generated on re-admission — recompute policy).
    int64_t victim = s->running_order.back();
    auto vit = s->running.find(victim);
    if (vit == s->running.end()) {
      s->running_order.pop_back();
      continue;
    }
    MfaRequest requeue = vit->second.req;
    requeue.prompt_len = vit->second.req.prompt_len + vit->second.generated;
    requeue.max_new_tokens =
        vit->second.req.max_new_tokens - vit->second.generated;
    if (requeue.max_new_tokens < 1) requeue.max_new_tokens = 1;
    // A fully-prefilled victim that generated NOTHING since its last
    // (re-)admission made no progress — if it was also the only runner,
    // it exceeds pool capacity and would re-prefill forever; hold
    // admission so the host sees a clean cannot-be-admitted stall.
    bool no_progress = vit->second.generated == 0 &&
                       vit->second.prefill_done >= vit->second.req.prompt_len;
    mfa_seq_release(s->pool, vit->second.seq);
    s->running.erase(vit);
    s->running_order.pop_back();
    s->waiting.push_front(requeue);
    s->preempted_total += 1;
    // Hold admission until a completion frees pages — unless nothing
    // runs anymore (then no completion can come; let admission retry,
    // except in the no-progress case above).
    s->admission_blocked =
        !s->running_order.empty() ||
        (no_progress && s->running_order.empty());
  }
  return n;
}

extern "C" int64_t mfa_sched_num_preempted(MfaScheduler* s) {
  if (!s) return 0;
  std::lock_guard<std::mutex> lock(s->mu);
  return s->preempted_total;
}

extern "C" int mfa_sched_token(MfaScheduler* s, int64_t request_id,
                               int finished) {
  if (!s) return -1;
  std::lock_guard<std::mutex> lock(s->mu);
  auto it = s->running.find(request_id);
  if (it == s->running.end()) return -1;
  auto& r = it->second;
  r.generated += 1;
  mfa_seq_set_len(s->pool, r.seq, r.req.prompt_len + r.generated);
  if (finished || r.generated >= r.req.max_new_tokens) {
    mfa_seq_release(s->pool, r.seq);
    s->running.erase(it);
    s->running_order.erase(
        std::remove(s->running_order.begin(), s->running_order.end(),
                    request_id),
        s->running_order.end());
    // A completion freed pages: preempted requests may re-admit now.
    s->admission_blocked = false;
  }
  return 0;
}

extern "C" int32_t mfa_sched_num_waiting(MfaScheduler* s) {
  if (!s) return 0;
  std::lock_guard<std::mutex> lock(s->mu);
  return static_cast<int32_t>(s->waiting.size());
}

extern "C" int32_t mfa_sched_num_running(MfaScheduler* s) {
  if (!s) return 0;
  std::lock_guard<std::mutex> lock(s->mu);
  return static_cast<int32_t>(s->running.size());
}
