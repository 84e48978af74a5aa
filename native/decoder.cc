#include "decoder.h"

#include "statemap.h"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <deque>
#include <limits>
#include <thread>
#include <vector>

namespace ctc_native {

namespace {

constexpr float kInf = std::numeric_limits<float>::infinity();

// Backpointer arena entry: enough to reconstruct words + alignment.
struct BackPtr {
  int32_t prev;     // index into arena, -1 for start
  int32_t ilabel;   // 0 for nonemitting traversals
  int32_t olabel;
};

// Token store: open-addressing map sized to the active set (see
// statemap.h for the design rationale and measurements).
struct TokVal {
  int32_t bp = -1;
  float cost = std::numeric_limits<float>::infinity();
};
using HashTokens = StateHashMap<TokVal>;

// Per-thread reusable decode state: no O(num_states) allocation per
// utterance (the old design's two dense TokenStores were the dominant
// per-utterance setup cost AND working set on big graphs).
struct DecodeScratch {
  HashTokens cur, next;
  std::vector<BackPtr> arena;
  std::deque<int32_t> queue;
  std::vector<float> cutoff_scratch;
  // surviving states staged for the prefetched emitting pass
  struct Surv {
    float cost;
    int32_t bp;
    int64_t lo, hi;  // emitting arc range
  };
  std::vector<Surv> surv;
};

DecodeScratch& TlsScratch() {
  thread_local DecodeScratch scratch;
  return scratch;
}

float GetCutoff(const HashTokens& toks, const DecodeOptions& opts,
                float best_cost, std::vector<float>* scratch) {
  // LatticeFasterDecoder::GetCutoff semantics: the beam sets the cutoff,
  // max_active tightens it when too many tokens survive, and min_active
  // widens it (up to everything) when too few would.
  float beam_cutoff = best_cost + opts.beam;
  int64_t size = (int64_t)toks.Size();
  if (opts.max_active > 0 && size > (int64_t)opts.max_active) {
    scratch->clear();
    for (int32_t i : toks.Slots())
      scratch->push_back(toks.Slot(i).val.cost);
    std::nth_element(scratch->begin(),
                     scratch->begin() + opts.max_active - 1,
                     scratch->end());
    float max_active_cutoff = (*scratch)[opts.max_active - 1];
    if (max_active_cutoff < beam_cutoff) return max_active_cutoff;
  }
  if (opts.min_active > 0) {
    if (size <= (int64_t)opts.min_active) return kInf;  // keep them all
    scratch->clear();
    for (int32_t i : toks.Slots())
      scratch->push_back(toks.Slot(i).val.cost);
    std::nth_element(scratch->begin(),
                     scratch->begin() + opts.min_active - 1,
                     scratch->end());
    float min_active_cutoff = (*scratch)[opts.min_active - 1];
    if (min_active_cutoff > beam_cutoff) return min_active_cutoff;
  }
  return beam_cutoff;
}

void ProcessNonemitting(const Fst& fst, const DecodeIndex& idx,
                        float cutoff, std::vector<BackPtr>* arena,
                        HashTokens* toks, std::deque<int32_t>* queue) {
  queue->clear();
  for (int32_t i : toks->Slots()) queue->push_back(toks->Slot(i).key);
  while (!queue->empty()) {
    int32_t s = queue->front();
    queue->pop_front();
    const TokVal tok = toks->At(s);
    if (tok.cost > cutoff) continue;
    const int64_t end = idx.eps_end[s];
    for (int64_t i = fst.arc_offset[s]; i < end; ++i) {
      const Arc& a = idx.arcs[i];
      float nc = tok.cost + a.weight;
      if (nc >= cutoff) continue;
      TokVal& nt = toks->GetOrInsert(a.nextstate, TokVal());
      if (nc < nt.cost) {
        nt.cost = nc;
        arena->push_back({tok.bp, 0, a.olabel});
        nt.bp = (int32_t)arena->size() - 1;
        queue->push_back(a.nextstate);
      }
    }
  }
}

}  // namespace

bool CanonicalizeEpsFirst(Fst* fst) {
  const int64_t n = fst->NumStates();
  bool moved = false;
  std::vector<Arc> tmp;
  for (int64_t s = 0; s < n; ++s) {
    int64_t lo = fst->arc_offset[s], hi = fst->arc_offset[s + 1];
    int64_t w = lo;
    while (w < hi && fst->arcs[w].ilabel == 0) ++w;
    bool ok = true;
    for (int64_t i = w; i < hi; ++i)
      if (fst->arcs[i].ilabel == 0) { ok = false; break; }
    if (ok) continue;
    tmp.assign(fst->arcs.begin() + lo, fst->arcs.begin() + hi);
    int64_t o = lo;
    for (const Arc& a : tmp) if (a.ilabel == 0) fst->arcs[o++] = a;
    for (const Arc& a : tmp) if (a.ilabel != 0) fst->arcs[o++] = a;
    moved = true;
  }
  return moved;
}

DecodeIndex BuildDecodeIndex(const Fst& fst) {
  DecodeIndex idx;
  const int64_t n = fst.NumStates();
  idx.eps_end.resize(n);
  // pass 1: eps-first split points, and whether the layout is already
  // canonical (it is after CanonicalizeEpsFirst, and usually anyway:
  // the CTC transform emits the blank-twin epsilon arc first)
  bool canonical = true;
  for (int64_t s = 0; s < n; ++s) {
    int64_t lo = fst.arc_offset[s], hi = fst.arc_offset[s + 1];
    int64_t w = lo;
    while (w < hi && fst.arcs[w].ilabel == 0) ++w;
    idx.eps_end[s] = w;
    for (int64_t i = w; i < hi && canonical; ++i)
      if (fst.arcs[i].ilabel == 0) canonical = false;
    if (!canonical) break;
  }
  if (canonical) {
    idx.arcs = fst.arcs.data();
    return idx;
  }
  // fallback: reordered copy (const input that is not eps-first)
  idx.owned.resize(fst.arcs.size());
  for (int64_t s = 0; s < n; ++s) {
    int64_t lo = fst.arc_offset[s], hi = fst.arc_offset[s + 1];
    int64_t w = lo;
    for (int64_t i = lo; i < hi; ++i)
      if (fst.arcs[i].ilabel == 0) idx.owned[w++] = fst.arcs[i];
    idx.eps_end[s] = w;
    for (int64_t i = lo; i < hi; ++i)
      if (fst.arcs[i].ilabel != 0) idx.owned[w++] = fst.arcs[i];
  }
  idx.arcs = idx.owned.data();
  return idx;
}

bool DecodeBestPath(const Fst& fst, const float* scores, int64_t num_frames,
                    int64_t num_cols, const int32_t* ilabel_map,
                    int64_t map_size, const DecodeOptions& opts,
                    DecodeResult* result) {
  DecodeIndex idx = BuildDecodeIndex(fst);
  return DecodeBestPath(fst, idx, scores, num_frames, num_cols,
                        ilabel_map, map_size, opts, result);
}

bool DecodeBestPath(const Fst& fst, const DecodeIndex& idx,
                    const float* scores, int64_t num_frames,
                    int64_t num_cols, const int32_t* ilabel_map,
                    int64_t map_size, const DecodeOptions& opts,
                    DecodeResult* result) {
  if (fst.start < 0) return false;
  DecodeScratch& sc = TlsScratch();
  HashTokens& cur = sc.cur;
  HashTokens& next = sc.next;
  std::vector<BackPtr>& arena = sc.arena;
  arena.clear();
  if (arena.capacity() < (1 << 16)) arena.reserve(1 << 16);

  cur.Clear();
  cur.GetOrInsert((int32_t)fst.start, TokVal()).cost = 0.0f;
  ProcessNonemitting(fst, idx, opts.beam, &arena, &cur, &sc.queue);

  for (int64_t t = 0; t < num_frames; ++t) {
    const float* row = scores + t * num_cols;
    float best = kInf;
    for (int32_t i : cur.Slots())
      best = std::min(best, cur.Slot(i).val.cost);
    float cutoff = GetCutoff(cur, opts, best, &sc.cutoff_scratch);

    // Phase 1: collect surviving tokens + their emitting arc ranges,
    // prefetching the per-state offset/eps rows a few states ahead —
    // on multi-GB graphs these are random DRAM reads that otherwise
    // serialize.
    const std::vector<int32_t>& slots = cur.Slots();
    const size_t n_act = slots.size();
    sc.surv.clear();
    constexpr size_t kPfState = 8;
    for (size_t k = 0; k < n_act; ++k) {
      if (k + kPfState < n_act) {
        int32_t sp = cur.Slot(slots[k + kPfState]).key;
        __builtin_prefetch(&fst.arc_offset[sp]);
        __builtin_prefetch(&idx.eps_end[sp]);
      }
      const HashTokens::Entry& e = cur.Slot(slots[k]);
      if (e.val.cost > cutoff) continue;
      const int64_t lo = idx.eps_end[e.key];
      const int64_t hi = fst.arc_offset[e.key + 1];
      if (lo == hi) continue;
      __builtin_prefetch(&idx.arcs[lo]);
      sc.surv.push_back({e.val.cost, e.val.bp, lo, hi});
    }

    next.Clear();
    // Phase 2: expand.  Adaptive beam: tighten the insertion cutoff as
    // better next-frame tokens appear (LatticeFasterDecoder's
    // ProcessEmitting idiom) — without this, wide beams insert huge
    // numbers of doomed tokens.  Prefetch the arc block of the survivor
    // a few entries ahead (64-byte lines: 4 arcs each).
    float next_best = kInf, next_cutoff = kInf;
    constexpr size_t kPfArc = 3;
    const size_t n_surv = sc.surv.size();
    for (size_t k = 0; k < n_surv; ++k) {
      if (k + kPfArc < n_surv) {
        const auto& ahead = sc.surv[k + kPfArc];
        __builtin_prefetch(&idx.arcs[ahead.lo]);
        if (ahead.hi - ahead.lo > 4)
          __builtin_prefetch(&idx.arcs[ahead.lo + 4]);
      }
      const auto& sv = sc.surv[k];
      for (int64_t i = sv.lo; i < sv.hi; ++i) {
        const Arc& a = idx.arcs[i];   // emitting arcs only, by layout
        if (a.ilabel >= map_size) continue;
        int32_t col = ilabel_map[a.ilabel];
        if (col < 0 || col >= num_cols) continue;
        float acoustic = -opts.acoustic_scale * row[col];
        float nc = sv.cost + a.weight + acoustic;
        if (nc >= next_cutoff) continue;
        TokVal& nt = next.GetOrInsert(a.nextstate, TokVal());
        if (nc < nt.cost) {
          nt.cost = nc;
          arena.push_back({sv.bp, a.ilabel, a.olabel});
          nt.bp = (int32_t)arena.size() - 1;
          if (nc < next_best) {
            next_best = nc;
            next_cutoff = nc + opts.beam;
          }
        }
      }
    }
    if (next.Size() == 0) return false;  // pruned everything
    // cap the epsilon closure by max_active too — eps fans (blank states,
    // LM backoffs, determinization chains) must not expand past the
    // survivor budget
    float ne_cutoff = GetCutoff(next, opts, next_best, &sc.cutoff_scratch);
    ProcessNonemitting(fst, idx, ne_cutoff, &arena, &next, &sc.queue);
    std::swap(cur, next);
  }

  // pick best token, preferring final states (decoder fallback mirrors
  // LatticeFasterDecoder: best token regardless of finality if none final)
  float best_final = kInf, best_any = kInf;
  int32_t bp_final = -1, bp_any = -1;
  for (int32_t i : cur.Slots()) {
    const HashTokens::Entry& e = cur.Slot(i);
    if (e.val.cost < best_any) { best_any = e.val.cost; bp_any = e.val.bp; }
    float fw = fst.final_weight[e.key];
    if (fw != kInf && e.val.cost + fw < best_final) {
      best_final = e.val.cost + fw;
      bp_final = e.val.bp;
    }
  }
  result->reached_final = bp_final != -1 || best_final != kInf;
  int32_t bp = result->reached_final ? bp_final : bp_any;
  result->total_cost = result->reached_final ? best_final : best_any;

  result->words.clear();
  result->alignment.clear();
  while (bp != -1) {
    const BackPtr& b = arena[bp];
    if (b.olabel != 0) result->words.push_back(b.olabel);
    if (b.ilabel != 0) result->alignment.push_back(b.ilabel);
    bp = b.prev;
  }
  std::reverse(result->words.begin(), result->words.end());
  std::reverse(result->alignment.begin(), result->alignment.end());
  return true;
}

int DecodeBestPathBatch(const Fst& fst, const float* scores,
                        const int64_t* frame_offsets, int64_t num_utts,
                        int64_t num_cols, const int32_t* ilabel_map,
                        int64_t map_size, const DecodeOptions& opts,
                        std::vector<DecodeResult>* results,
                        std::vector<int>* ok_flags, int num_threads) {
  const DecodeIndex idx = BuildDecodeIndex(fst);  // shared, read-only
  return DecodeBestPathBatch(fst, idx, scores, frame_offsets, num_utts,
                             num_cols, ilabel_map, map_size, opts,
                             results, ok_flags, num_threads);
}

int DecodeBestPathBatch(const Fst& fst, const DecodeIndex& idx,
                        const float* scores,
                        const int64_t* frame_offsets, int64_t num_utts,
                        int64_t num_cols, const int32_t* ilabel_map,
                        int64_t map_size, const DecodeOptions& opts,
                        std::vector<DecodeResult>* results,
                        std::vector<int>* ok_flags, int num_threads) {
  results->assign(num_utts, DecodeResult());
  std::vector<int>& ok = *ok_flags;
  ok.assign(num_utts, 0);
  if (num_threads <= 0) {
    num_threads = (int)std::thread::hardware_concurrency();
    if (num_threads <= 0) num_threads = 1;
  }
  num_threads = (int)std::min<int64_t>(num_threads, num_utts);

  auto worker = [&](int tid) {
    for (int64_t u = tid; u < num_utts; u += num_threads) {
      int64_t lo = frame_offsets[u], hi = frame_offsets[u + 1];
      ok[u] = DecodeBestPath(fst, idx, scores + lo * num_cols, hi - lo,
                             num_cols, ilabel_map, map_size, opts,
                             &(*results)[u])
                  ? 1 : 0;
    }
  };
  std::vector<std::thread> threads;
  for (int i = 1; i < num_threads; ++i) threads.emplace_back(worker, i);
  worker(0);
  for (auto& th : threads) th.join();
  int n_ok = 0;
  for (int64_t u = 0; u < num_utts; ++u) n_ok += ok[u];
  return n_ok;
}

}  // namespace ctc_native
