#include "lattice.h"

#include "decoder.h"
#include "statemap.h"

#include <algorithm>
#include <cmath>
#include <deque>
#include <limits>
#include <set>
#include <tuple>
#include <unordered_set>
#include <vector>

namespace ctc_native {

namespace {

constexpr float kInf = std::numeric_limits<float>::infinity();

// A token = (frame, graph state) holding the Viterbi forward cost; links
// record every in-beam arc between tokens (the reference's ForwardLink,
// lattice-faster-decoder.h).
struct LatLink {
  int32_t from;      // token id
  int32_t to;        // token id
  int32_t ilabel;
  int32_t olabel;
  float graph_cost;
  float acoustic_cost;
};

struct LatToken {
  float alpha = kInf;   // Viterbi forward cost
  int32_t frame = 0;
};

struct Builder {
  std::vector<LatToken> tokens;
  std::vector<LatLink> links;

  int32_t NewToken(int32_t frame) {
    tokens.push_back(LatToken{kInf, frame});
    return (int32_t)tokens.size() - 1;
  }
};

// state -> token-id map sized to the active set (statemap.h): the
// previous dense per-state map was two O(num_states) arrays allocated
// per utterance — ~0.5 GB and a page-fault storm on a 33M-state TLG.
using StateMap = StateHashMap<int32_t>;

// Per-thread reusable search state (no O(num_states) work per call).
struct LatScratch {
  StateMap cur, next;
  std::deque<int32_t> queue;
  struct Surv {
    int32_t tid;
    float cost;
    int64_t lo, hi;
  };
  std::vector<Surv> surv;
};

LatScratch& LatTls() {
  thread_local LatScratch s;
  return s;
}

float LatCutoff(const StateMap& m, const Builder& b,
                const LatticeOptions& opts, float best) {
  float beam_cutoff = best + opts.beam;
  if (opts.max_active <= 0 || (int64_t)m.Size() <= (int64_t)opts.max_active)
    return beam_cutoff;
  std::vector<float> costs;
  costs.reserve(m.Size());
  for (int32_t i : m.Slots()) costs.push_back(b.tokens[m.Slot(i).val].alpha);
  std::nth_element(costs.begin(), costs.begin() + opts.max_active - 1,
                   costs.end());
  return std::min(beam_cutoff, costs[opts.max_active - 1]);
}

// Epsilon closure, recording links.  Improvement-only relaxation (same
// termination argument as the best-path decoder); every traversal within
// the cutoff adds a link so alternative epsilon paths survive into the
// lattice.
void LatProcessNonemitting(const Fst& fst, const DecodeIndex& idx,
                           float cutoff, int32_t frame,
                           Builder* b, StateMap* m,
                           std::deque<int32_t>* queue) {
  queue->clear();
  for (int32_t i : m->Slots()) queue->push_back(m->Slot(i).key);
  while (!queue->empty()) {
    int32_t s = queue->front();
    queue->pop_front();
    int32_t tid = m->At(s);
    float cost = b->tokens[tid].alpha;
    if (cost > cutoff) continue;
    const int64_t end = idx.eps_end[s];
    for (int64_t i = fst.arc_offset[s]; i < end; ++i) {
      const Arc& a = idx.arcs[i];
      float nc = cost + a.weight;
      if (nc >= cutoff) continue;
      bool ins;
      int32_t& slot = m->GetOrInsert(a.nextstate, -1, &ins);
      if (ins) slot = b->NewToken(frame);
      int32_t nt = slot;
      b->links.push_back(LatLink{tid, nt, 0, a.olabel, a.weight, 0.0f});
      if (nc < b->tokens[nt].alpha) {
        b->tokens[nt].alpha = nc;
        queue->push_back(a.nextstate);
      }
    }
  }
}

}  // namespace

bool DecodeLattice(const Fst& fst, const float* scores, int64_t num_frames,
                   int64_t num_cols, const int32_t* ilabel_map,
                   int64_t map_size, const LatticeOptions& opts,
                   RawLattice* out) {
  const DecodeIndex idx = BuildDecodeIndex(fst);
  return DecodeLattice(fst, idx, scores, num_frames, num_cols,
                       ilabel_map, map_size, opts, out);
}

bool DecodeLattice(const Fst& fst, const DecodeIndex& idx,
                   const float* scores, int64_t num_frames,
                   int64_t num_cols, const int32_t* ilabel_map,
                   int64_t map_size, const LatticeOptions& opts,
                   RawLattice* out) {
  if (fst.start < 0) return false;
  Builder b;
  LatScratch& sc = LatTls();
  StateMap& cur = sc.cur;
  StateMap& next = sc.next;
  std::deque<int32_t>& queue = sc.queue;
  cur.Clear();
  next.Clear();
  int32_t t0 = b.NewToken(0);
  b.tokens[t0].alpha = 0.0f;
  cur.GetOrInsert((int32_t)fst.start, t0);
  LatProcessNonemitting(fst, idx, opts.beam, 0, &b, &cur, &queue);

  for (int64_t t = 0; t < num_frames; ++t) {
    const float* row = scores + t * num_cols;
    float best = kInf;
    for (int32_t i : cur.Slots())
      best = std::min(best, b.tokens[cur.Slot(i).val].alpha);
    float cutoff = LatCutoff(cur, b, opts, best);

    // Phase 1: surviving tokens + emitting arc ranges, prefetching the
    // per-state offset rows ahead (same pattern as the best-path
    // decoder; on multi-GB graphs these are random DRAM reads).
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
      const StateMap::Entry& e = cur.Slot(slots[k]);
      float cost = b.tokens[e.val].alpha;
      if (cost > cutoff) continue;
      const int64_t lo = idx.eps_end[e.key];
      const int64_t hi = fst.arc_offset[e.key + 1];
      if (lo == hi) continue;
      __builtin_prefetch(&idx.arcs[lo]);
      sc.surv.push_back({e.val, cost, lo, hi});
    }

    next.Clear();
    // Phase 2: expand.  Adaptive beam (ProcessEmitting idiom): links
    // whose through-cost is already past best + beam can never survive
    // the lattice-beam prune (lattice_beam <= beam), so don't record
    // them.
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
        bool ins;
        int32_t& slot = next.GetOrInsert(a.nextstate, -1, &ins);
        if (ins) slot = b.NewToken((int32_t)t + 1);
        int32_t nt = slot;
        b.links.push_back(
            LatLink{sv.tid, nt, a.ilabel, a.olabel, a.weight, acoustic});
        if (nc < b.tokens[nt].alpha) {
          b.tokens[nt].alpha = nc;
          if (nc < next_best) {
            next_best = nc;
            next_cutoff = nc + opts.beam;
          }
        }
      }
    }
    if (next.Size() == 0) return false;
    // cap the epsilon closure by max_active as well
    float ne_cutoff = LatCutoff(next, b, opts, next_best);
    LatProcessNonemitting(fst, idx, ne_cutoff, (int32_t)t + 1, &b,
                          &next, &queue);
    std::swap(cur, next);
  }

  // Final costs on last-frame tokens; if no final state survived, treat
  // every surviving token as final with zero cost (the decoder's
  // use_final_probs=false fallback).
  std::vector<float> final_cost(b.tokens.size(), kInf);
  bool reached_final = false;
  for (int32_t i : cur.Slots()) {
    const StateMap::Entry& e = cur.Slot(i);
    float fw = fst.final_weight[e.key];
    if (fw != kInf) {
      final_cost[e.val] = fw;
      reached_final = true;
    }
  }
  if (!reached_final)
    for (int32_t i : cur.Slots()) final_cost[cur.Slot(i).val] = 0.0f;

  // Exact alpha: the search kept Viterbi alpha, but link recording may
  // include links added before their source improved.  Recompute alpha by
  // relaxation over links (few passes: links mostly follow token order).
  size_t n = b.tokens.size();
  std::vector<float> alpha(n, kInf), beta(n, kInf);
  alpha[t0] = 0.0f;
  const int max_passes = (int)n + 2;  // bounded by longest eps chain
  for (int pass = 0; pass < max_passes; ++pass) {
    bool changed = false;
    for (const auto& l : b.links) {
      float na = alpha[l.from] + l.graph_cost + l.acoustic_cost;
      if (na < alpha[l.to]) { alpha[l.to] = na; changed = true; }
    }
    if (!changed) break;
  }
  for (size_t i = 0; i < n; ++i)
    if (final_cost[i] != kInf && alpha[i] != kInf)
      beta[i] = final_cost[i];
  for (int pass = 0; pass < max_passes; ++pass) {
    bool changed = false;
    for (auto it = b.links.rbegin(); it != b.links.rend(); ++it) {
      const auto& l = *it;
      if (beta[l.to] == kInf) continue;
      float nb = beta[l.to] + l.graph_cost + l.acoustic_cost;
      if (nb < beta[l.from]) { beta[l.from] = nb; changed = true; }
    }
    if (!changed) break;
  }
  float best_total = alpha[t0] + beta[t0];
  if (!(best_total < kInf)) return false;

  // Forward-backward pruning at lattice_beam (PruneForwardLinks analogue).
  float bound = best_total + opts.lattice_beam;
  std::vector<int32_t> remap(n, -1);
  int32_t n_keep = 0;
  for (size_t i = 0; i < n; ++i)
    if (alpha[i] + beta[i] <= bound) remap[i] = n_keep++;

  out->num_states = n_keep;
  out->start = remap[t0];
  out->arc_from.clear(); out->arc_to.clear();
  out->arc_ilabel.clear(); out->arc_olabel.clear();
  out->arc_graph_cost.clear(); out->arc_acoustic_cost.clear();
  out->final_cost.assign(n_keep, kInf);
  out->state_frame.assign(n_keep, 0);
  for (size_t i = 0; i < n; ++i) {
    if (remap[i] < 0) continue;
    out->state_frame[remap[i]] = b.tokens[i].frame;
    if (final_cost[i] != kInf) out->final_cost[remap[i]] = final_cost[i];
  }
  // epsilon relaxation can record the same link more than once; dedup
  // on the exact (from, to, olabel) triple (a lossy arithmetic hash
  // could collide and silently drop a genuine competitor arc)
  std::set<std::tuple<int32_t, int32_t, int32_t>> seen;
  for (const auto& l : b.links) {
    if (remap[l.from] < 0 || remap[l.to] < 0) continue;
    if (l.ilabel == 0) {
      if (!seen.emplace(remap[l.from], remap[l.to], l.olabel).second)
        continue;
    }
    float through = alpha[l.from] + l.graph_cost + l.acoustic_cost +
                    beta[l.to];
    if (through > bound) continue;
    out->arc_from.push_back(remap[l.from]);
    out->arc_to.push_back(remap[l.to]);
    out->arc_ilabel.push_back(l.ilabel);
    out->arc_olabel.push_back(l.olabel);
    out->arc_graph_cost.push_back(l.graph_cost);
    out->arc_acoustic_cost.push_back(l.acoustic_cost);
  }
  out->reached_final = reached_final;
  out->best_cost = best_total;
  return true;
}

}  // namespace ctc_native
