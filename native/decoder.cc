#include "decoder.h"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <deque>
#include <limits>
#include <unordered_map>

namespace ctc_native {

namespace {

constexpr float kInf = std::numeric_limits<float>::infinity();

// Backpointer arena entry: enough to reconstruct words + alignment.
struct BackPtr {
  int32_t prev;     // index into arena, -1 for start
  int32_t ilabel;   // 0 for nonemitting traversals
  int32_t olabel;
};

struct Token {
  float cost = kInf;
  int32_t bp = -1;
};

using TokenMap = std::unordered_map<int32_t, Token>;

// Histogram-style cutoff: if tokens exceed max_active, find the cost of
// the max_active-th best and tighten the beam to it (the adaptive-beam
// idea of LatticeFasterDecoder::GetCutoff).
float GetCutoff(const TokenMap& toks, const DecodeOptions& opts,
                float best_cost) {
  float beam_cutoff = best_cost + opts.beam;
  if (opts.max_active <= 0 ||
      (int64_t)toks.size() <= (int64_t)opts.max_active)
    return beam_cutoff;
  std::vector<float> costs;
  costs.reserve(toks.size());
  for (const auto& kv : toks) costs.push_back(kv.second.cost);
  std::nth_element(costs.begin(), costs.begin() + opts.max_active - 1,
                   costs.end());
  float active_cutoff = costs[opts.max_active - 1];
  return std::min(beam_cutoff, active_cutoff);
}

void ProcessNonemitting(const Fst& fst, float cutoff,
                        std::vector<BackPtr>* arena, TokenMap* toks) {
  // epsilon closure with improvement-only relaxation
  std::deque<int32_t> queue;
  for (const auto& kv : *toks) queue.push_back(kv.first);
  while (!queue.empty()) {
    int32_t s = queue.front();
    queue.pop_front();
    const Token tok = (*toks)[s];
    if (tok.cost > cutoff) continue;
    for (int64_t i = fst.arc_offset[s]; i < fst.arc_offset[s + 1]; ++i) {
      const Arc& a = fst.arcs[i];
      if (a.ilabel != 0) continue;
      float nc = tok.cost + a.weight;
      if (nc >= cutoff) continue;
      Token& nt = (*toks)[a.nextstate];
      if (nc < nt.cost) {
        nt.cost = nc;
        arena->push_back({tok.bp, 0, a.olabel});
        nt.bp = (int32_t)arena->size() - 1;
        queue.push_back(a.nextstate);
      }
    }
  }
}

}  // namespace

bool DecodeBestPath(const Fst& fst, const float* scores, int64_t num_frames,
                    int64_t num_cols, const int32_t* ilabel_map,
                    int64_t map_size, const DecodeOptions& opts,
                    DecodeResult* result) {
  if (fst.start < 0) return false;
  std::vector<BackPtr> arena;
  arena.reserve(1 << 16);
  TokenMap cur;
  cur[(int32_t)fst.start] = Token{0.0f, -1};
  ProcessNonemitting(fst, opts.beam, &arena, &cur);

  TokenMap next;
  for (int64_t t = 0; t < num_frames; ++t) {
    const float* row = scores + t * num_cols;
    float best = kInf;
    for (const auto& kv : cur) best = std::min(best, kv.second.cost);
    float cutoff = GetCutoff(cur, opts, best);

    next.clear();
    float next_best = kInf;
    for (const auto& kv : cur) {
      const int32_t s = kv.first;
      const Token& tok = kv.second;
      if (tok.cost > cutoff) continue;
      for (int64_t i = fst.arc_offset[s]; i < fst.arc_offset[s + 1]; ++i) {
        const Arc& a = fst.arcs[i];
        if (a.ilabel == 0) continue;  // emitting only
        if (a.ilabel >= map_size) continue;
        int32_t col = ilabel_map[a.ilabel];
        if (col < 0 || col >= num_cols) continue;
        float acoustic = -opts.acoustic_scale * row[col];
        float nc = tok.cost + a.weight + acoustic;
        Token& nt = next[a.nextstate];
        if (nc < nt.cost) {
          nt.cost = nc;
          arena.push_back({tok.bp, a.ilabel, a.olabel});
          nt.bp = (int32_t)arena.size() - 1;
          next_best = std::min(next_best, nc);
        }
      }
    }
    if (next.empty()) return false;  // pruned everything: decode failure
    ProcessNonemitting(fst, next_best + opts.beam, &arena, &next);
    std::swap(cur, next);
  }

  // pick best token, preferring final states (decoder fallback mirrors
  // LatticeFasterDecoder: best token regardless of finality if none final)
  float best_final = kInf, best_any = kInf;
  int32_t bp_final = -1, bp_any = -1;
  for (const auto& kv : cur) {
    const Token& tok = kv.second;
    if (tok.cost < best_any) { best_any = tok.cost; bp_any = tok.bp; }
    float fw = fst.final_weight[kv.first];
    if (fw != kInf && tok.cost + fw < best_final) {
      best_final = tok.cost + fw;
      bp_final = tok.bp;
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

}  // namespace ctc_native
