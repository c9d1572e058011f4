// mpqe_host: native host-side runtime for the mpqe_tpu framework.
//
// The reference's native code lives in its dependencies (torch-scatter /
// torch-sparse C++/CUDA; SURVEY.md §2.2); its *host* pipeline (per-batch
// Python graph construction) is its throughput bottleneck (SURVEY.md §3).
// This library is the TPU build's host runtime: batch packing, relation-
// sorted edge store construction, synthetic KG generation and query
// sampling — all flat-array C ABI functions bound via ctypes
// (mpqe_tpu/data/native.py).  No Python objects, no per-query allocation;
// every function is O(work) over contiguous int32/float32 buffers.
//
// Build: make -C cpp   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <deque>
#include <random>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------
// splitmix64 RNG: deterministic, seedable, no global state.
// ---------------------------------------------------------------------
static inline uint64_t splitmix64(uint64_t& s) {
  uint64_t z = (s += 0x9e3779b97f4a7c15ULL);
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
  return z ^ (z >> 31);
}

static inline uint64_t rng_below(uint64_t& s, uint64_t n) {
  return n ? splitmix64(s) % n : 0;
}

// ---------------------------------------------------------------------
// pack_dense_batch: flattened FormulaStore -> dense batch arrays.
//
// Mirrors data/store.py::pack_dense_batch_np (different RNG stream).
// anchors: [n_q, n_anchor_slots]; neg CSR pool/ptr; pick: [n_pick]
// query indices.  fb_pool [fb_size] is the shared uniform same-mode
// fallback pool, sampled on the fly for queries whose CSR range is empty
// (fb_size == 0 disables it); a draw that hits the target slides to the
// next pool entry.  Outputs are caller-allocated:
//   node_entity [B, n_nodes] (must be pre-zeroed), target [B],
//   negatives [B, n_neg], neg_mask [B, n_neg], query_mask [B].
// Returns 0 on success.
// ---------------------------------------------------------------------
int pack_dense_batch(
    const int32_t* anchors, int64_t n_q, int32_t n_anchor_slots,
    const int32_t* targets,
    const int32_t* neg_pool, const int64_t* neg_ptr,
    const int32_t* hard_pool, const int64_t* hard_ptr, int32_t use_hard,
    const int32_t* fb_pool, int64_t fb_size,
    // optional (head, rel) answer-set exclusion for the fallback path:
    // per-group SORTED id slices + per-query group index (has_ans=0 ->
    // pointers ignored).  Mirrors store.py FormulaStore.ans_*.
    const int32_t* ans_pool, const int64_t* ans_ptr,
    const int32_t* ans_idx, int32_t has_ans,
    const int32_t* anchor_slot_ids,  // [n_anchor_slots] template slots
    int32_t n_nodes,
    const int64_t* pick, int64_t n_pick,
    int64_t batch_size, int32_t n_neg, uint64_t seed,
    int32_t* node_entity, int32_t* target_out,
    int32_t* negatives, float* neg_mask, float* query_mask) {
  constexpr int64_t kFbProbeCap = 64;  // == store.py FB_PROBE_CAP
  if (n_pick > batch_size || n_pick <= 0) return 1;
  uint64_t s = seed ^ 0xabcdef1234567890ULL;
  for (int64_t b = 0; b < n_pick; ++b) {
    const int64_t qi = pick[b];
    if (qi < 0 || qi >= n_q) return 2;
    for (int32_t a = 0; a < n_anchor_slots; ++a) {
      node_entity[b * n_nodes + anchor_slot_ids[a]] =
          anchors[qi * n_anchor_slots + a];
    }
    target_out[b] = targets[qi];
    const int32_t* pool = neg_pool;
    int64_t lo = neg_ptr[qi], hi = neg_ptr[qi + 1];
    if (use_hard && hard_ptr[qi + 1] > hard_ptr[qi]) {
      pool = hard_pool;
      lo = hard_ptr[qi];
      hi = hard_ptr[qi + 1];
    }
    if (hi > lo) {
      for (int32_t k = 0; k < n_neg; ++k) {
        negatives[b * n_neg + k] = pool[lo + (int64_t)rng_below(s, hi - lo)];
        neg_mask[b * n_neg + k] = 1.0f;
      }
    } else if (fb_size > 0) {
      // uniform same-mode fallback excluding true answers: the query's
      // own target always, the full (head, rel) answer set when answer
      // groups ride along.  Invalid draws probe forward (cap
      // kFbProbeCap); an exhausted probe leaves the slot masked.
      const int32_t* ans = nullptr;
      int64_t ans_n = 0;
      if (has_ans) {
        const int32_t g = ans_idx[qi];
        ans = ans_pool + ans_ptr[g];
        ans_n = ans_ptr[g + 1] - ans_ptr[g];
      }
      const int64_t cap = fb_size < kFbProbeCap ? fb_size : kFbProbeCap;
      const int32_t tgt = targets[qi];
      for (int32_t k = 0; k < n_neg; ++k) {
        int64_t idx = (int64_t)rng_below(s, fb_size);
        for (int64_t p = 0; p < cap; ++p) {
          const int32_t c = fb_pool[(idx + p) % fb_size];
          if (c == tgt) continue;
          if (ans_n) {
            // answer sets are typically out-degree-sized: a linear scan
            // beats binary search below ~32 entries (no branches lost)
            bool hit = false;
            if (ans_n <= 32) {
              for (int64_t a = 0; a < ans_n; ++a) {
                if (ans[a] == c) { hit = true; break; }
              }
            } else {
              hit = std::binary_search(ans, ans + ans_n, c);
            }
            if (hit) continue;
          }
          negatives[b * n_neg + k] = c;
          neg_mask[b * n_neg + k] = 1.0f;
          break;
        }
      }
    }
    query_mask[b] = 1.0f;
  }
  // replicate row 0 into padding rows (keeps padded compute in-range)
  for (int64_t b = n_pick; b < batch_size; ++b) {
    std::memcpy(node_entity + b * n_nodes, node_entity, n_nodes * 4);
    target_out[b] = target_out[0];
    std::memcpy(negatives + b * n_neg, negatives, n_neg * 4);
  }
  return 0;
}

// ---------------------------------------------------------------------
// build_edge_store: counting sort by (rel, dst) + rel_ptr + 1/c norms.
//
// Mirrors ops/edge_store.py::build_edge_store.  Outputs caller-allocated
// with length `capacity` (>= n_e): src/dst/rel/norm sorted; rel_ptr
// [n_rels + 2].  Padding: src=dst=n_nodes, rel=n_rels, norm=0.
// ---------------------------------------------------------------------
int build_edge_store_c(
    int64_t n_e, const int32_t* src, const int32_t* dst, const int32_t* rel,
    int32_t n_nodes, int32_t n_rels, int64_t capacity,
    int32_t* out_src, int32_t* out_dst, int32_t* out_rel, float* out_norm,
    int32_t* rel_ptr) {
  if (capacity < n_e) return 1;
  // two-pass counting sort on key = rel * (n_nodes+1) + dst
  const int64_t stride = (int64_t)n_nodes + 1;
  std::vector<int64_t> key(n_e);
  for (int64_t e = 0; e < n_e; ++e) {
    if (rel[e] < 0 || rel[e] >= n_rels) return 2;
    key[e] = (int64_t)rel[e] * stride + dst[e];
  }
  std::vector<int64_t> order(n_e);
  for (int64_t e = 0; e < n_e; ++e) order[e] = e;
  std::stable_sort(order.begin(), order.end(),
                   [&](int64_t a, int64_t b) { return key[a] < key[b]; });
  // in-degree counts per (dst, rel): reuse sorted runs
  for (int64_t i = 0; i < n_e; ++i) {
    const int64_t e = order[i];
    out_src[i] = src[e];
    out_dst[i] = dst[e];
    out_rel[i] = rel[e];
  }
  for (int64_t i = 0; i < n_e;) {
    int64_t j = i;
    const int64_t k = key[order[i]];
    while (j < n_e && key[order[j]] == k) ++j;
    const float inv = 1.0f / (float)(j - i);
    for (int64_t t = i; t < j; ++t) out_norm[t] = inv;
    i = j;
  }
  for (int64_t i = n_e; i < capacity; ++i) {
    out_src[i] = n_nodes;
    out_dst[i] = n_nodes;
    out_rel[i] = n_rels;
    out_norm[i] = 0.0f;
  }
  // rel_ptr
  std::vector<int64_t> counts(n_rels, 0);
  for (int64_t i = 0; i < n_e; ++i) counts[out_rel[i]]++;
  rel_ptr[0] = 0;
  for (int32_t r = 0; r < n_rels; ++r)
    rel_ptr[r + 1] = rel_ptr[r] + (int32_t)counts[r];
  rel_ptr[n_rels + 1] = (int32_t)capacity;
  return 0;
}

// ---------------------------------------------------------------------
// make_synthetic_kg: mode-typed random triples (schema-respecting).
//
// entity_mode [n_entities] (output), rel_domain/rel_range [n_base_rels]
// (output), triples (h, r, t) written to heads/rels/tails [n_triples].
// Powers BASELINE config[4] (100M-edge synthetic KG) at C++ speed.
// ---------------------------------------------------------------------
int make_synthetic_kg(
    int64_t n_entities, int32_t n_modes, int32_t n_base_rels,
    int64_t n_triples, uint64_t seed,
    int32_t* entity_mode, int32_t* rel_domain, int32_t* rel_range,
    int32_t* heads, int32_t* rels, int32_t* tails) {
  if (n_modes <= 0 || n_entities < n_modes) return 1;
  uint64_t s = seed ^ 0x1234567890abcdefULL;
  // contiguous mode blocks => O(1) per-mode sampling
  std::vector<int64_t> mode_start(n_modes + 1);
  for (int32_t m = 0; m <= n_modes; ++m)
    mode_start[m] = m * n_entities / n_modes;
  for (int32_t m = 0; m < n_modes; ++m)
    for (int64_t i = mode_start[m]; i < mode_start[m + 1]; ++i)
      entity_mode[i] = m;
  for (int32_t r = 0; r < n_base_rels; ++r) {
    rel_domain[r] = (int32_t)rng_below(s, n_modes);
    rel_range[r] = (int32_t)rng_below(s, n_modes);
  }
  for (int64_t e = 0; e < n_triples; ++e) {
    const int32_t r = (int32_t)rng_below(s, n_base_rels);
    const int32_t dm = rel_domain[r], rm = rel_range[r];
    const int64_t h =
        mode_start[dm] + (int64_t)rng_below(s, mode_start[dm + 1] - mode_start[dm]);
    const int64_t t =
        mode_start[rm] + (int64_t)rng_below(s, mode_start[rm + 1] - mode_start[rm]);
    heads[e] = (int32_t)h;
    rels[e] = r;
    tails[e] = (int32_t)t;
  }
  return 0;
}

// ---------------------------------------------------------------------
// sample_chain_queries: batched backward walks over an incoming-edge CSR.
//
// in_ptr [n_entities+1], in_rel / in_src [n_in_edges]: incoming directed
// edges per entity (built host-side or via build_incoming_csr below).
// For each of n_samples queries: pick target, walk template edges in
// reverse (edge j: src_slot[j] -> dst_slot[j], slots pre-bound), sampling
// a random incoming edge of the bound destination.  Writes per query:
// entities [n_samples, n_nodes], rels [n_samples, n_edges]; rows that hit
// a dead end get entities[.,0] = -1.  Negatives are uniform same-mode
// entities != target (answer-set checking stays in the Python sampler;
// this fast path powers synthetic-scale benchmarks).
// ---------------------------------------------------------------------
int sample_chain_queries(
    const int64_t* in_ptr, const int32_t* in_rel, const int32_t* in_src,
    int64_t n_entities, const int32_t* entity_mode,
    const int64_t* mode_start, int32_t /*n_modes*/,  // contiguous-mode layout
    const int32_t* edge_src_slot, const int32_t* edge_dst_slot,
    int32_t n_edges, int32_t n_nodes,
    int64_t n_samples, int32_t n_neg, uint64_t seed,
    int32_t* out_entities, int32_t* out_rels, int32_t* out_negs) {
  uint64_t s = seed ^ 0xfeedfacecafebeefULL;
  std::vector<int32_t> ent(n_nodes);
  for (int64_t q = 0; q < n_samples; ++q) {
    bool ok = false;
    for (int tries = 0; tries < 64 && !ok; ++tries) {
      std::fill(ent.begin(), ent.end(), -1);
      ent[n_nodes - 1] = (int32_t)rng_below(s, n_entities);  // target slot
      ok = true;
      for (int32_t j = n_edges - 1; j >= 0; --j) {
        const int32_t d = ent[edge_dst_slot[j]];
        if (d < 0) { ok = false; break; }
        const int64_t lo = in_ptr[d], hi = in_ptr[d + 1];
        if (hi <= lo) { ok = false; break; }
        const int64_t k = lo + (int64_t)rng_below(s, hi - lo);
        out_rels[q * n_edges + j] = in_rel[k];
        const int32_t ss = edge_src_slot[j];
        if (ent[ss] >= 0 && ent[ss] != in_src[k]) { ok = false; break; }
        ent[ss] = in_src[k];
      }
    }
    if (!ok) {
      out_entities[q * n_nodes] = -1;
      continue;
    }
    std::memcpy(out_entities + q * n_nodes, ent.data(), n_nodes * 4);
    const int32_t tm = entity_mode[ent[n_nodes - 1]];
    const int64_t mlo = mode_start[tm], mhi = mode_start[tm + 1];
    for (int32_t k = 0; k < n_neg; ++k) {
      int32_t c = (int32_t)(mlo + (int64_t)rng_below(s, mhi - mlo));
      if (c == ent[n_nodes - 1]) c = (int32_t)(mlo + (mhi - 1 - c) % (mhi - mlo));
      out_negs[q * n_neg + k] = c;
    }
  }
  return 0;
}

// ---------------------------------------------------------------------
// build_incoming_csr: directed edges (with inverses) grouped by dst.
// heads/rels/tails are base triples; emits 2*n_triples incoming records:
//   for (h, r, t): forward 2r arrives at t from h; inverse 2r+1 at h from t.
// Outputs: in_ptr [n_entities+1], in_rel / in_src [2*n_triples].
// ---------------------------------------------------------------------
int build_incoming_csr(
    int64_t n_triples, const int32_t* heads, const int32_t* rels,
    const int32_t* tails, int64_t n_entities,
    int64_t* in_ptr, int32_t* in_rel, int32_t* in_src) {
  std::vector<int64_t> cnt(n_entities + 1, 0);
  for (int64_t e = 0; e < n_triples; ++e) {
    cnt[tails[e] + 1]++;
    cnt[heads[e] + 1]++;
  }
  for (int64_t i = 0; i < n_entities; ++i) cnt[i + 1] += cnt[i];
  std::memcpy(in_ptr, cnt.data(), (n_entities + 1) * 8);
  std::vector<int64_t> cursor(cnt.begin(), cnt.end() - 1);
  for (int64_t e = 0; e < n_triples; ++e) {
    int64_t p = cursor[tails[e]]++;
    in_rel[p] = 2 * rels[e];
    in_src[p] = heads[e];
    p = cursor[heads[e]]++;
    in_rel[p] = 2 * rels[e] + 1;
    in_src[p] = tails[e];
  }
  return 0;
}

// ---------------------------------------------------------------------
// N-Triples parser with term interning (the native IO path behind
// mpqe_tpu/data/rdf.py; semantics mirror rdf.parse_ntriples exactly —
// the Python twin is the correctness oracle in tests/test_rdf.py).
//
// Two-call protocol: nt_parse scans the whole buffer, interning every
// term (first-seen order, exactly like the Python interner) and
// returning counts; nt_export copies the id-triples + term table into
// caller-allocated buffers; nt_free releases the state.  Grammar errors
// stop the parse and report the 1-based line in *err_line (handle is
// still returned so partial results could be inspected; the Python
// wrapper raises instead).
// ---------------------------------------------------------------------
struct NtState {
  std::vector<int32_t> spo;     // [n, 3] term ids
  std::vector<uint8_t> o_lit;   // [n]
  std::vector<int64_t> offs;    // [n_terms + 1] into term_buf
  std::string term_buf;         // concatenated term bytes
  // map keys must outlive term_buf reallocations: views point into a
  // stable side arena (deque never moves existing elements)
  std::deque<std::string> arena;
  std::unordered_map<std::string_view, int32_t> intern;
};

static int32_t nt_intern(NtState* st, const char* s, int64_t len) {
  auto it = st->intern.find(std::string_view(s, (size_t)len));
  if (it != st->intern.end()) return it->second;
  const int32_t id = (int32_t)(st->offs.size() - 1);
  st->arena.emplace_back(s, (size_t)len);
  st->intern.emplace(std::string_view(st->arena.back()), id);
  st->offs.push_back((int64_t)st->term_buf.size() + len);
  st->term_buf.append(s, (size_t)len);
  return id;
}

static inline const char* nt_skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  return p;
}

// scan one term at p; *is_lit set for literals; returns next position or
// nullptr on grammar error.  Mirrors rdf._scan_term including the
// trailing-dot rules (blank labels can't end with '.'; '@lang' stops at
// '.'; literal content is the RAW bytes between the quotes).
static const char* nt_scan_term(NtState* st, const char* p,
                                const char* end, int32_t* id,
                                uint8_t* is_lit) {
  *is_lit = 0;
  if (p >= end) return nullptr;
  if (*p == '<') {
    const char* q = (const char*)memchr(p + 1, '>', (size_t)(end - p - 1));
    if (!q) return nullptr;
    *id = nt_intern(st, p + 1, q - (p + 1));
    return q + 1;
  }
  if (*p == '_') {
    const char* q = p;
    while (q < end && *q != ' ' && *q != '\t' && *q != '\r') ++q;
    const char* e = q;
    if (e > p && e[-1] == '.') --e;  // statement terminator, not label
    *id = nt_intern(st, p, e - p);
    return e;
  }
  if (*p == '"') {
    const char* q = p + 1;
    while (q < end && *q != '"') q += (*q == '\\') ? 2 : 1;
    if (q >= end) return nullptr;
    *id = nt_intern(st, p + 1, q - (p + 1));
    *is_lit = 1;
    ++q;
    if (q < end && *q == '@') {
      while (q < end && *q != ' ' && *q != '\t' && *q != '\r' && *q != '.')
        ++q;
    } else if (q + 2 < end && q[0] == '^' && q[1] == '^' && q[2] == '<') {
      const char* r = (const char*)memchr(q + 3, '>', (size_t)(end - q - 3));
      if (!r) return nullptr;
      q = r + 1;
    }
    return q;
  }
  return nullptr;
}

uint64_t nt_parse(const char* buf, int64_t len, int64_t* n_triples,
                  int64_t* n_terms, int64_t* term_bytes,
                  int64_t* err_line) {
  NtState* st = new NtState();
  st->offs.push_back(0);
  *err_line = 0;
  const char* p = buf;
  const char* bend = buf + len;
  int64_t line_no = 0;
  while (p < bend) {
    // universal newlines like the Python text-mode twin: '\n', '\r',
    // and '\r\n' each terminate one line (bare-CR files must not
    // silently collapse into a single line)
    const char* nl = p;
    while (nl < bend && *nl != '\n' && *nl != '\r') ++nl;
    const char* lend = nl;
    ++line_no;
    const char* c = nt_skip_ws(p, lend);
    // strip trailing ws for the end checks
    const char* ce = lend;
    while (ce > c && (ce[-1] == ' ' || ce[-1] == '\t' || ce[-1] == '\r'))
      --ce;
    p = nl;
    if (p < bend) {
      ++p;
      if (nl[0] == '\r' && p < bend && *p == '\n') ++p;  // CRLF = one break
    }
    if (c >= ce || *c == '#') continue;
    int32_t s_id, p_id, o_id;
    uint8_t s_lit, p_lit, o_lit;
    const char* q = nt_scan_term(st, c, ce, &s_id, &s_lit);
    if (!q || s_lit) { *err_line = line_no; break; }
    q = nt_skip_ws(q, ce);
    const char* pred_start = q;
    q = nt_scan_term(st, q, ce, &p_id, &p_lit);
    if (!q || p_lit || pred_start >= ce || *pred_start != '<') {
      *err_line = line_no;
      break;
    }
    q = nt_skip_ws(q, ce);
    q = nt_scan_term(st, q, ce, &o_id, &o_lit);
    if (!q) { *err_line = line_no; break; }
    q = nt_skip_ws(q, ce);
    if (q >= ce || *q != '.') { *err_line = line_no; break; }
    st->spo.push_back(s_id);
    st->spo.push_back(p_id);
    st->spo.push_back(o_id);
    st->o_lit.push_back(o_lit);
  }
  *n_triples = (int64_t)st->o_lit.size();
  *n_terms = (int64_t)st->offs.size() - 1;
  *term_bytes = (int64_t)st->term_buf.size();
  return (uint64_t)(uintptr_t)st;
}

int nt_export(uint64_t handle, int32_t* spo, uint8_t* o_lit,
              int64_t* term_offsets, char* term_buf) {
  NtState* st = (NtState*)(uintptr_t)handle;
  if (!st) return 1;
  std::memcpy(spo, st->spo.data(), st->spo.size() * 4);
  std::memcpy(o_lit, st->o_lit.data(), st->o_lit.size());
  std::memcpy(term_offsets, st->offs.data(), st->offs.size() * 8);
  std::memcpy(term_buf, st->term_buf.data(), st->term_buf.size());
  return 0;
}

void nt_free(uint64_t handle) {
  delete (NtState*)(uintptr_t)handle;
}

}  // extern "C"
