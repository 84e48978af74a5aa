// Pruned lattice determinization.  See det_lattice.h; the contract is
// bit-parity with the Python reference implementation
// (kaldi_ctc_tpu/decoding/det_lattice.py determinize_lattice), which the
// pytest suite checks on random and real decode lattices.

#include "det_lattice.h"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <limits>
#include <unordered_map>
#include <vector>

namespace ctc_native {
namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();

// Residuals are rounded to 1e-4 like the Python implementation so that
// float jitter does not split equivalent subsets.
inline double Quantize(double x) { return std::round(x * 1e4) / 1e4; }

struct Element {
  int32_t state;
  double g, a;                // residual weight pair (quantized)
  std::vector<int32_t> str;   // residual ilabel string

  bool operator==(const Element& o) const {
    return state == o.state && g == o.g && a == o.a && str == o.str;
  }
};

struct Subset {
  std::vector<Element> elems;  // sorted canonical order
  size_t hash = 0;

  void Canonicalize() {
    std::sort(elems.begin(), elems.end(),
              [](const Element& x, const Element& y) {
                if (x.state != y.state) return x.state < y.state;
                if (x.g != y.g) return x.g < y.g;
                if (x.a != y.a) return x.a < y.a;
                return x.str < y.str;
              });
    size_t h = 1469598103934665603ull;  // FNV offset
    auto mix = [&h](uint64_t v) {
      h ^= v;
      h *= 1099511628211ull;
    };
    for (const auto& e : elems) {
      mix((uint64_t)(uint32_t)e.state);
      uint64_t gb, ab;
      double gq = e.g, aq = e.a;
      std::memcpy(&gb, &gq, 8);
      std::memcpy(&ab, &aq, 8);
      mix(gb);
      mix(ab);
      mix((uint64_t)e.str.size());
      for (int32_t l : e.str) mix((uint64_t)(uint32_t)l);
    }
    hash = h;
  }

  bool operator==(const Subset& o) const { return elems == o.elems; }
};

struct SubsetHash {
  size_t operator()(const Subset& s) const { return s.hash; }
};

// Best-completion cost per state (reverse relaxation; lattices are
// acyclic and near-topologically ordered, so this converges in a few
// passes like the Python _alpha_beta).
std::vector<double> BackwardCosts(const RawLatticeView& in) {
  std::vector<double> beta(in.num_states, kInf);
  for (int64_t s = 0; s < in.num_states; ++s) beta[s] = in.final_cost[s];
  bool changed = true;
  while (changed) {
    changed = false;
    for (int64_t i = in.num_arcs - 1; i >= 0; --i) {
      double w = (double)in.arc_graph_cost[i] + in.arc_acoustic_cost[i];
      double v = beta[in.arc_to[i]] + w;
      if (v < beta[in.arc_from[i]]) {
        beta[in.arc_from[i]] = v;
        changed = true;
      }
    }
  }
  return beta;
}

class Determinizer {
 public:
  Determinizer(const RawLatticeView& in, float det_beam, int64_t max_states)
      : in_(in), det_beam_(det_beam), max_states_(max_states) {}

  bool Run(CompactLat* out);

 private:
  // Per-state arc index split by word-epsilon / emitting.
  void BuildAdjacency() {
    eps_out_.assign(in_.num_states, {});
    emit_out_.assign(in_.num_states, {});
    for (int64_t i = 0; i < in_.num_arcs; ++i) {
      auto& v = (in_.arc_olabel[i] == 0 ? eps_out_ : emit_out_);
      v[in_.arc_from[i]].push_back(i);
    }
  }

  // Word-epsilon closure from s: reachable states with the best
  // (g+a)-cost residual (including s itself at zero).  Cached.
  const std::vector<Element>& Closure(int32_t s) {
    auto& slot = closure_cache_[s];
    if (slot.computed) return slot.elems;
    std::unordered_map<int32_t, size_t> pos;
    std::vector<Element> out;
    out.push_back(Element{s, 0.0, 0.0, {}});
    pos[s] = 0;
    std::vector<Element> stack = {out[0]};
    while (!stack.empty()) {
      Element cur = std::move(stack.back());
      stack.pop_back();
      for (int64_t i : eps_out_[cur.state]) {
        Element nxt;
        nxt.state = in_.arc_to[i];
        nxt.g = cur.g + in_.arc_graph_cost[i];
        nxt.a = cur.a + in_.arc_acoustic_cost[i];
        nxt.str = cur.str;
        if (in_.arc_ilabel[i] != 0) nxt.str.push_back(in_.arc_ilabel[i]);
        auto it = pos.find(nxt.state);
        if (it == pos.end()) {
          pos[nxt.state] = out.size();
          out.push_back(nxt);
          stack.push_back(std::move(nxt));
        } else if (nxt.g + nxt.a < out[it->second].g + out[it->second].a) {
          out[it->second] = nxt;
          stack.push_back(std::move(nxt));
        }
      }
    }
    slot.elems = std::move(out);
    slot.computed = true;
    return slot.elems;
  }

  // Drop elements that cannot contribute a path within det_beam of the
  // subset's best completion (Python _beam_prune).
  void BeamPrune(std::vector<Element>* elems) const {
    double best = kInf;
    bool any_finite = false;
    for (const auto& e : *elems) {
      double t = e.g + e.a + beta_[e.state];
      if (std::isfinite(t)) any_finite = true;
      best = std::min(best, t);
    }
    std::vector<Element> kept;
    kept.reserve(elems->size());
    if (!any_finite) {
      double bres = kInf;
      for (const auto& e : *elems) bres = std::min(bres, e.g + e.a);
      for (auto& e : *elems)
        if (e.g + e.a <= bres + det_beam_) kept.push_back(std::move(e));
    } else {
      for (auto& e : *elems)
        if (e.g + e.a + beta_[e.state] <= best + det_beam_)
          kept.push_back(std::move(e));
    }
    *elems = std::move(kept);
  }

  int32_t StateId(Subset&& subset, CompactLat* out, double fw_cost,
                  std::vector<Subset>* queue) {
    auto it = ids_.find(subset);
    if (it != ids_.end()) {
      if (fw_cost < fw_[it->second]) fw_[it->second] = fw_cost;
      return it->second;
    }
    int32_t id = (int32_t)out->num_states;
    out->num_states++;
    out->final_graph_cost.push_back(
        std::numeric_limits<float>::infinity());
    out->final_acoustic_cost.push_back(
        std::numeric_limits<float>::infinity());
    fw_.push_back(fw_cost);
    queue->push_back(subset);
    ids_.emplace(std::move(subset), id);
    return id;
  }

  const RawLatticeView& in_;
  const double det_beam_;
  const int64_t max_states_;
  std::vector<std::vector<int64_t>> eps_out_, emit_out_;
  struct ClosureSlot {
    bool computed = false;
    std::vector<Element> elems;
  };
  std::vector<ClosureSlot> closure_cache_;
  std::vector<double> beta_;
  std::unordered_map<Subset, int32_t, SubsetHash> ids_;
  std::vector<double> fw_;  // best forward det-path cost per subset
};

bool Determinizer::Run(CompactLat* out) {
  BuildAdjacency();
  closure_cache_.assign(in_.num_states, {});
  beta_ = BackwardCosts(in_);
  const double best_total = beta_[in_.start];
  const double slack = 1e-3;

  *out = CompactLat{};
  out->arc_il_offset.push_back(0);

  Subset init;
  for (const auto& e : Closure((int32_t)in_.start)) {
    Element q = e;
    q.g = Quantize(q.g);
    q.a = Quantize(q.a);
    init.elems.push_back(std::move(q));
  }
  BeamPrune(&init.elems);
  init.Canonicalize();

  std::vector<Subset> queue;
  int32_t start_id = StateId(std::move(init), out, 0.0, &queue);
  out->start = start_id;

  int64_t guard = 0;
  // final ilabel strings are collected sparsely and flattened into
  // final_il_offset/final_ilabels once all states exist
  std::unordered_map<int32_t, std::vector<int32_t>> final_strings;

  while (!queue.empty()) {
    if (++guard > max_states_) return false;
    Subset subset = std::move(queue.back());
    queue.pop_back();
    int32_t sid = ids_.at(subset);

    // finality: min total over elements with a final target
    bool have_final = false;
    double bf_tot = kInf, bf_g = 0, bf_a = 0;
    const std::vector<int32_t>* bf_str = nullptr;
    for (const auto& e : subset.elems) {
      double fg = in_.final_cost[e.state];
      if (std::isinf(fg)) continue;
      double tot = e.g + e.a + fg;
      if (!have_final || tot < bf_tot) {
        have_final = true;
        bf_tot = tot;
        bf_g = e.g + fg;
        bf_a = e.a;
        bf_str = &e.str;
      }
    }
    if (have_final) {
      out->final_graph_cost[sid] = (float)bf_g;
      out->final_acoustic_cost[sid] = (float)bf_a;
      final_strings[sid] = *bf_str;
    }

    // group outgoing emitting transitions by word
    std::unordered_map<int32_t, std::vector<Element>> by_word;
    for (const auto& e : subset.elems) {
      for (int64_t i : emit_out_[e.state]) {
        int32_t w = in_.arc_olabel[i];
        double ng = e.g + in_.arc_graph_cost[i];
        double na = e.a + in_.arc_acoustic_cost[i];
        std::vector<int32_t> nstr = e.str;
        if (in_.arc_ilabel[i] != 0) nstr.push_back(in_.arc_ilabel[i]);
        for (const auto& c : Closure(in_.arc_to[i])) {
          Element el;
          el.state = c.state;
          el.g = ng + c.g;
          el.a = na + c.a;
          el.str = nstr;
          el.str.insert(el.str.end(), c.str.begin(), c.str.end());
          by_word[w].push_back(std::move(el));
        }
      }
    }

    // deterministic word order (parity with Python dict order is not
    // required for equivalence, but sorted order makes output stable)
    std::vector<int32_t> word_keys;
    word_keys.reserve(by_word.size());
    for (auto& kv : by_word) word_keys.push_back(kv.first);
    std::sort(word_keys.begin(), word_keys.end());

    for (int32_t w : word_keys) {
      auto& elems = by_word[w];
      // best residual per target state (tropical)
      std::unordered_map<int32_t, size_t> best_per;
      std::vector<Element> uniq;
      for (auto& e : elems) {
        auto it = best_per.find(e.state);
        if (it == best_per.end()) {
          best_per[e.state] = uniq.size();
          uniq.push_back(std::move(e));
        } else if (e.g + e.a < uniq[it->second].g + uniq[it->second].a) {
          uniq[it->second] = std::move(e);
        }
      }
      // common ilabel prefix
      const std::vector<int32_t>* pref = &uniq[0].str;
      size_t plen = pref->size();
      for (size_t k = 1; k < uniq.size() && plen > 0; ++k) {
        const auto& s2 = uniq[k].str;
        size_t m = 0;
        size_t lim = std::min(plen, s2.size());
        while (m < lim && (*pref)[m] == s2[m]) ++m;
        plen = m;
      }
      // arc weight = the best element's pair
      size_t bi = 0;
      for (size_t k = 1; k < uniq.size(); ++k)
        if (uniq[k].g + uniq[k].a < uniq[bi].g + uniq[bi].a) bi = k;
      double arc_g = uniq[bi].g, arc_a = uniq[bi].a;

      Subset norm;
      norm.elems.reserve(uniq.size());
      for (auto& e : uniq) {
        Element q;
        q.state = e.state;
        q.g = Quantize(e.g - arc_g);
        q.a = Quantize(e.a - arc_a);
        q.str.assign(e.str.begin() + plen, e.str.end());
        norm.elems.push_back(std::move(q));
      }
      BeamPrune(&norm.elems);
      if (norm.elems.empty()) continue;

      double fw_t = fw_[sid] + arc_g + arc_a;
      double completion = kInf;
      for (const auto& e : norm.elems)
        completion = std::min(completion, e.g + e.a + beta_[e.state]);
      if (fw_t + completion > best_total + det_beam_ + slack) continue;

      norm.Canonicalize();
      std::vector<int32_t> prefix(uniq[bi].str.begin(),
                                  uniq[bi].str.begin() + plen);
      int32_t tid = StateId(std::move(norm), out, fw_t, &queue);
      out->arc_from.push_back(sid);
      out->arc_to.push_back(tid);
      out->arc_word.push_back(w);
      out->arc_graph_cost.push_back((float)arc_g);
      out->arc_acoustic_cost.push_back((float)arc_a);
      out->arc_ilabels.insert(out->arc_ilabels.end(), prefix.begin(),
                              prefix.end());
      out->arc_il_offset.push_back(out->arc_ilabels.size());
    }
  }

  // finals: flatten strings in state order
  out->final_il_offset.assign(1, 0);
  for (int64_t s = 0; s < out->num_states; ++s) {
    auto it = final_strings.find((int32_t)s);
    if (it != final_strings.end())
      out->final_ilabels.insert(out->final_ilabels.end(),
                                it->second.begin(), it->second.end());
    out->final_il_offset.push_back(out->final_ilabels.size());
  }
  return true;
}

}  // namespace

bool DeterminizeLatticePruned(const RawLatticeView& in, float det_beam,
                              int64_t max_states, CompactLat* out) {
  if (in.num_states == 0) return false;
  Determinizer det(in, det_beam, max_states);
  return det.Run(out);
}

}  // namespace ctc_native
