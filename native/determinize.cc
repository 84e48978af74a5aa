// Graph-building FST algorithms: determinize-star, encoded minimization,
// push-special, disambig removal.
//
// Native-runtime replacements for the OpenFst/Kaldi binaries the
// reference's utils/mkgraph.sh chain runs on LG
// (mkgraph.sh:92-98: fsttablecompose | fstdeterminizestar
//  | fstminimizeencoded | fstpushspecial), re-implemented from the
// algorithm descriptions for the tropical semiring:
//
//  * DeterminizeStar — subset determinization of a weighted transducer
//    with input-epsilon removal (fstext/determinize-star.h semantics).
//    Subset elements carry (state, residual weight, residual output
//    string); output strings longer than one symbol are emitted through
//    chains of input-epsilon states, and residual final strings drain
//    through chains into a single super-final state.
//  * MinimizeEncoded — weighted-label-encoded minimization
//    (fstminimizeencoded): arcs are encoded as (ilabel, olabel, weight)
//    atoms and states are merged by bisimulation partition refinement,
//    which preserves the weighted language and allows nondeterministic
//    input.
//  * PushSpecial — reweighting so every state's outgoing probability
//    mass (arcs + final, with finality treated as a jump back to the
//    start) is the same constant, computed by power iteration for the
//    dominant eigenvector of the transition-mass matrix
//    (fstbin/fstpushspecial semantics).  Total path weights are
//    preserved exactly (the per-arc potentials telescope).
//  * RemoveDisambigSymbols — map input labels >= first_disambig to
//    epsilon (fstrmsymbols on the lexicon disambiguation range).

#include "fst.h"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <deque>
#include <string>
#include <tuple>
#include <unordered_map>
#include <vector>

namespace ctc_native {

namespace {

// ---------------------------------------------------------------------------
// Hash-consed output strings (suffix-shared chains; id 0 = empty string).
// ---------------------------------------------------------------------------

class StringRepo {
 public:
  // Append one label to the string `prefix`, returning the new id.
  int32_t Append(int32_t prefix, int32_t label) {
    int64_t key = ((int64_t)prefix << 32) | (uint32_t)label;
    auto it = intern_.find(key);
    if (it != intern_.end()) return it->second;
    nodes_.push_back({prefix, label});
    int32_t id = (int32_t)nodes_.size();  // ids are 1-based; 0 = empty
    intern_.emplace(key, id);
    return id;
  }

  // Expand to front-to-back label vector.
  void Expand(int32_t id, std::vector<int32_t>* out) const {
    out->clear();
    while (id != 0) {
      out->push_back(nodes_[id - 1].second);
      id = nodes_[id - 1].first;
    }
    std::reverse(out->begin(), out->end());
  }

  int32_t FromVector(const std::vector<int32_t>& labels) {
    int32_t id = 0;
    for (int32_t l : labels) id = Append(id, l);
    return id;
  }

 private:
  std::vector<std::pair<int32_t, int32_t>> nodes_;  // (prefix_id, label)
  std::unordered_map<int64_t, int32_t> intern_;
};

struct Element {
  int32_t state;
  float w;       // residual weight (quantized)
  int32_t str;   // residual output string id
};

constexpr float kDelta = 1.0f / 1024.0f;  // weight quantization grid

inline float Quantize(double w) {
  return (float)(std::floor(w / kDelta + 0.5) * kDelta);
}

// Deterministic tie-break when two paths reach the same state with equal
// weight but different output strings (the input is then not functional
// on this subset): keep the lexicographically smaller expanded string.
bool StringLess(const StringRepo& repo, int32_t a, int32_t b,
                std::vector<int32_t>* ta, std::vector<int32_t>* tb) {
  if (a == b) return false;
  repo.Expand(a, ta);
  repo.Expand(b, tb);
  return *ta < *tb;
}

struct SubsetKey {
  std::vector<int64_t> packed;  // per element: state, weight bits, str
  bool operator==(const SubsetKey& o) const { return packed == o.packed; }
};

struct SubsetKeyHash {
  size_t operator()(const SubsetKey& k) const {
    size_t h = 1469598103934665603ull;
    for (int64_t v : k.packed) {
      h ^= (size_t)v;
      h *= 1099511628211ull;
    }
    return h;
  }
};

}  // namespace

bool DeterminizeStar(const Fst& in, Fst* out, std::string* err,
                     int64_t max_states, bool allow_nonfunctional) {
  const char* kNonFunc =
      "determinize-star: input is not functional (two paths with the "
      "same input sequence and weight produce different outputs); add "
      "lexicon disambiguation symbols, or allow_nonfunctional to keep "
      "the lexicographically smaller output";
  MutableFst det;
  if (in.start < 0) {
    *out = det.ToCsr();
    return true;
  }
  StringRepo repo;
  std::vector<int32_t> tmp_a, tmp_b;

  // Epsilon closure of a weighted/string-weighted subset, merging per
  // state by min weight (tropical).  `elems` is state->element map form.
  auto closure = [&](std::unordered_map<int32_t, Element>* elems,
                     std::string* cerr) -> bool {
    std::deque<int32_t> queue;
    for (auto& kv : *elems) queue.push_back(kv.first);
    int64_t updates = 0;
    const int64_t update_limit =
        64 * (int64_t)(elems->size() + 16) * (in.NumStates() + 16);
    while (!queue.empty()) {
      int32_t s = queue.front();
      queue.pop_front();
      Element cur = (*elems)[s];
      for (int64_t i = in.arc_offset[s]; i < in.arc_offset[s + 1]; ++i) {
        const Arc& a = in.arcs[i];
        if (a.ilabel != 0) continue;
        float w2 = Quantize((double)cur.w + a.weight);
        int32_t str2 =
            a.olabel ? repo.Append(cur.str, a.olabel) : cur.str;
        auto it = elems->find(a.nextstate);
        bool take;
        if (it == elems->end()) {
          take = true;
        } else if (w2 < it->second.w) {
          take = true;
        } else if (w2 == it->second.w && str2 != it->second.str) {
          if (!allow_nonfunctional) {
            *cerr = kNonFunc;
            return false;
          }
          take = StringLess(repo, str2, it->second.str, &tmp_a, &tmp_b);
        } else {
          take = false;
        }
        if (take) {
          (*elems)[a.nextstate] = Element{a.nextstate, w2, str2};
          queue.push_back(a.nextstate);
          if (++updates > update_limit) {
            *cerr = "epsilon cycle detected in determinize-star input";
            return false;
          }
        }
      }
    }
    return true;
  };

  // Normalize a subset: subtract the min weight, strip the common output
  // prefix.  Returns (key, common weight, common prefix labels).
  auto normalize = [&](std::unordered_map<int32_t, Element>* elems,
                       SubsetKey* key, float* common_w,
                       std::vector<int32_t>* prefix) {
    std::vector<Element> v;
    v.reserve(elems->size());
    for (auto& kv : *elems) v.push_back(kv.second);
    std::sort(v.begin(), v.end(),
              [](const Element& a, const Element& b) {
                return a.state < b.state;
              });
    float wmin = v[0].w;
    for (const Element& e : v) wmin = std::min(wmin, e.w);
    // common prefix across all residual strings
    repo.Expand(v[0].str, prefix);
    std::vector<int32_t> other;
    for (size_t i = 1; i < v.size() && !prefix->empty(); ++i) {
      repo.Expand(v[i].str, &other);
      size_t n = 0;
      while (n < prefix->size() && n < other.size() &&
             (*prefix)[n] == other[n])
        ++n;
      prefix->resize(n);
    }
    key->packed.clear();
    for (Element& e : v) {
      e.w = Quantize((double)e.w - wmin);
      if (!prefix->empty()) {
        repo.Expand(e.str, &other);
        other.erase(other.begin(), other.begin() + prefix->size());
        e.str = repo.FromVector(other);
      }
      uint32_t wb;
      std::memcpy(&wb, &e.w, 4);
      key->packed.push_back(e.state);
      key->packed.push_back(((int64_t)wb << 32) | (uint32_t)e.str);
    }
    *common_w = wmin;
  };

  std::unordered_map<SubsetKey, int64_t, SubsetKeyHash> subset_id;
  // residual elements per det state (chain/superfinal states — which are
  // also AddState()-allocated — have no entry and are never on `work`)
  std::unordered_map<int64_t, std::vector<Element>> subsets;
  std::deque<int64_t> work;
  int64_t superfinal = -1;

  auto intern_subset = [&](std::unordered_map<int32_t, Element>* elems,
                           float* common_w,
                           std::vector<int32_t>* prefix) -> int64_t {
    SubsetKey key;
    normalize(elems, &key, common_w, prefix);
    auto it = subset_id.find(key);
    if (it != subset_id.end()) return it->second;
    int64_t id = det.AddState();
    subset_id.emplace(std::move(key), id);
    std::vector<Element> v;
    for (auto& kv : *elems) v.push_back(kv.second);
    std::sort(v.begin(), v.end(),
              [](const Element& a, const Element& b) {
                return a.state < b.state;
              });
    // re-apply normalization to the stored elements (normalize edited the
    // key copies; redo on v)
    float wmin = v[0].w;
    for (const Element& e : v) wmin = std::min(wmin, e.w);
    std::vector<int32_t> full, rest;
    for (Element& e : v) {
      e.w = Quantize((double)e.w - wmin);
      if (!prefix->empty()) {
        repo.Expand(e.str, &full);
        rest.assign(full.begin() + prefix->size(), full.end());
        e.str = repo.FromVector(rest);
      }
    }
    subsets.emplace(id, std::move(v));
    work.push_back(id);
    return id;
  };

  // Emit an output-label chain from `src`: first arc carries (ilabel, w),
  // subsequent labels ride input-epsilon arcs; the chain ends at `dst`.
  auto emit_chain = [&](int64_t src, int32_t ilabel, float w,
                        const std::vector<int32_t>& labels, int64_t dst) {
    int64_t cur = src;
    if (labels.empty()) {
      det.AddArc(cur, Arc{ilabel, 0, w, (int32_t)dst});
      return;
    }
    for (size_t i = 0; i < labels.size(); ++i) {
      bool last = i + 1 == labels.size();
      int64_t nxt = last ? dst : det.AddState();
      det.AddArc(cur, Arc{i == 0 ? ilabel : 0, labels[i],
                          i == 0 ? w : 0.0f, (int32_t)nxt});
      cur = nxt;
    }
  };

  // start subset
  {
    std::unordered_map<int32_t, Element> elems;
    elems.emplace((int32_t)in.start,
                  Element{(int32_t)in.start, 0.0f, 0});
    std::string cerr;
    if (!closure(&elems, &cerr)) {
      *err = cerr;
      return false;
    }
    float cw;
    std::vector<int32_t> prefix;
    int64_t id = intern_subset(&elems, &cw, &prefix);
    // A common weight/prefix on the start subset cannot be attached to an
    // incoming arc; re-add it via an auxiliary start state if nonzero.
    if (cw != 0.0f || !prefix.empty()) {
      int64_t real_start = det.AddState();
      emit_chain(real_start, 0, cw, prefix, id);
      det.start = real_start;
    } else {
      det.start = id;
    }
  }

  struct LabArc {
    int32_t label;
    int32_t elem;
    int64_t arc;
  };
  std::vector<LabArc> lab_arcs;
  while (!work.empty()) {
    int64_t id = work.front();
    work.pop_front();
    if (det.NumStates() > max_states) {
      *err = "determinize-star exceeded max states (" +
             std::to_string(max_states) +
             "): input is likely not determinizable; add lexicon "
             "disambiguation symbols";
      return false;
    }
    std::vector<Element> elems = subsets[id];  // copy: det grows

    // final handling
    float best_final = Fst::kInfinity;
    for (const Element& e : elems) {
      float f = in.final_weight[e.state];
      if (f == Fst::kInfinity) continue;
      float total = Quantize((double)e.w + f);
      if (e.str == 0) {
        best_final = std::min(best_final, total);
      } else {
        if (superfinal < 0) {
          superfinal = det.AddState();
          det.final_weight[superfinal] = 0.0f;
        }
        repo.Expand(e.str, &tmp_a);
        emit_chain(id, 0, total, tmp_a, superfinal);
      }
    }
    det.final_weight[id] = best_final;

    // One pass over the subset's arcs, bucketed by label.  The old
    // shape (collect distinct labels, then RE-SCAN every element's full
    // arc list per label) was O(distinct_labels × subset_arcs) per
    // subset — on TLG-scale inputs with ~50 emitting labels that is a
    // ~50× overscan of the dominant loop, and determinize-star was 96%
    // of graph build time (BENCH_DECODE.json).  Sort order (label,
    // element index, arc index) preserves the exact per-label visit
    // order of the old code, so results are bit-identical.
    lab_arcs.clear();
    for (size_t ei = 0; ei < elems.size(); ++ei) {
      const Element& e = elems[ei];
      for (int64_t i = in.arc_offset[e.state];
           i < in.arc_offset[e.state + 1]; ++i)
        if (in.arcs[i].ilabel != 0)
          lab_arcs.push_back(
              LabArc{in.arcs[i].ilabel, (int32_t)ei, i});
    }
    std::sort(lab_arcs.begin(), lab_arcs.end(),
              [](const LabArc& x, const LabArc& y) {
                if (x.label != y.label) return x.label < y.label;
                if (x.elem != y.elem) return x.elem < y.elem;
                return x.arc < y.arc;
              });

    for (size_t lo = 0; lo < lab_arcs.size();) {
      const int32_t label = lab_arcs[lo].label;
      size_t hi = lo;
      while (hi < lab_arcs.size() && lab_arcs[hi].label == label) ++hi;
      std::unordered_map<int32_t, Element> next;
      for (size_t k = lo; k < hi; ++k) {
        const Element& e = elems[lab_arcs[k].elem];
        const Arc& a = in.arcs[lab_arcs[k].arc];
        float w2 = Quantize((double)e.w + a.weight);
        int32_t str2 =
            a.olabel ? repo.Append(e.str, a.olabel) : e.str;
        auto it = next.find(a.nextstate);
        bool take;
        if (it == next.end()) {
          take = true;
        } else if (w2 < it->second.w) {
          take = true;
        } else if (w2 == it->second.w && str2 != it->second.str) {
          if (!allow_nonfunctional) {
            *err = kNonFunc;
            return false;
          }
          take = StringLess(repo, str2, it->second.str, &tmp_a, &tmp_b);
        } else {
          take = false;
        }
        if (take) next[a.nextstate] = Element{a.nextstate, w2, str2};
      }
      std::string cerr;
      if (!closure(&next, &cerr)) {
        *err = cerr;
        return false;
      }
      float cw;
      std::vector<int32_t> prefix;
      int64_t dst = intern_subset(&next, &cw, &prefix);
      emit_chain(id, label, cw, prefix, dst);
      lo = hi;
    }
  }

  *out = det.ToCsr();
  return true;
}

// ---------------------------------------------------------------------------
// MinimizeEncoded — bisimulation partition refinement over encoded labels.
// ---------------------------------------------------------------------------

Fst MinimizeEncoded(const Fst& in) {
  int64_t n = in.NumStates();
  if (n == 0 || in.start < 0) return in;

  // encode (ilabel, olabel, weight) -> dense atom id
  std::unordered_map<int64_t, int32_t> enc1;  // (ilabel,olabel) -> id
  std::vector<int32_t> arc_lab(in.NumArcs());
  std::unordered_map<int64_t, int32_t> enc2;  // (lab1, wbits) -> atom
  for (int64_t i = 0; i < in.NumArcs(); ++i) {
    const Arc& a = in.arcs[i];
    int64_t k1 = ((int64_t)a.ilabel << 32) | (uint32_t)a.olabel;
    auto it1 = enc1.emplace(k1, (int32_t)enc1.size()).first;
    uint32_t wb;
    std::memcpy(&wb, &a.weight, 4);
    int64_t k2 = ((int64_t)it1->second << 32) | wb;
    auto it2 = enc2.emplace(k2, (int32_t)enc2.size()).first;
    arc_lab[i] = it2->second;
  }

  // initial partition: by final weight
  std::vector<int32_t> cls(n);
  {
    std::unordered_map<uint32_t, int32_t> by_final;
    for (int64_t s = 0; s < n; ++s) {
      uint32_t fb;
      std::memcpy(&fb, &in.final_weight[s], 4);
      cls[s] = by_final.emplace(fb, (int32_t)by_final.size()).first->second;
    }
  }

  // refine to fixpoint on signatures
  struct VecHash {
    size_t operator()(const std::vector<int64_t>& v) const {
      size_t h = 1469598103934665603ull;
      for (int64_t x : v) {
        h ^= (size_t)x;
        h *= 1099511628211ull;
      }
      return h;
    }
  };
  int32_t num_classes = 0;
  for (int64_t s = 0; s < n; ++s)
    num_classes = std::max(num_classes, cls[s] + 1);
  while (true) {
    std::unordered_map<std::vector<int64_t>, int32_t, VecHash> sig_map;
    std::vector<int32_t> next_cls(n);
    std::vector<int64_t> sig;
    for (int64_t s = 0; s < n; ++s) {
      sig.clear();
      sig.push_back(cls[s]);
      size_t base = sig.size();
      for (int64_t i = in.arc_offset[s]; i < in.arc_offset[s + 1]; ++i)
        sig.push_back(((int64_t)arc_lab[i] << 32) |
                      (uint32_t)cls[in.arcs[i].nextstate]);
      std::sort(sig.begin() + base, sig.end());
      sig.erase(std::unique(sig.begin() + base, sig.end()), sig.end());
      next_cls[s] =
          sig_map.emplace(sig, (int32_t)sig_map.size()).first->second;
    }
    int32_t next_n = (int32_t)sig_map.size();
    cls.swap(next_cls);
    if (next_n == num_classes) break;
    num_classes = next_n;
  }

  // quotient
  MutableFst out;
  for (int32_t c = 0; c < num_classes; ++c) out.AddState();
  std::vector<char> done(num_classes, 0);
  for (int64_t s = 0; s < n; ++s) {
    int32_t c = cls[s];
    out.final_weight[c] = in.final_weight[s];
    if (done[c]) continue;
    done[c] = 1;
    for (int64_t i = in.arc_offset[s]; i < in.arc_offset[s + 1]; ++i) {
      const Arc& a = in.arcs[i];
      out.AddArc(c, Arc{a.ilabel, a.olabel, a.weight, cls[a.nextstate]});
    }
    // dedupe identical arcs (parallel arcs merged by bisimulation)
    auto& arcs = out.state_arcs[c];
    std::sort(arcs.begin(), arcs.end(), [](const Arc& x, const Arc& y) {
      return std::tie(x.ilabel, x.olabel, x.nextstate, x.weight) <
             std::tie(y.ilabel, y.olabel, y.nextstate, y.weight);
    });
    arcs.erase(std::unique(arcs.begin(), arcs.end(),
                           [](const Arc& x, const Arc& y) {
                             return x.ilabel == y.ilabel &&
                                    x.olabel == y.olabel &&
                                    x.nextstate == y.nextstate &&
                                    x.weight == y.weight;
                           }),
               arcs.end());
  }
  out.start = cls[in.start];
  return Connect(out.ToCsr());
}

// ---------------------------------------------------------------------------
// PushSpecial — equalize per-state outgoing mass by power iteration.
// ---------------------------------------------------------------------------

Fst PushSpecial(const Fst& in, int iterations) {
  int64_t n = in.NumStates();
  if (n == 0 || in.start < 0) return in;
  std::vector<double> v(n, 1.0), nv(n);
  for (int iter = 0; iter < iterations; ++iter) {
    double vstart = v[in.start];
    double norm = 0.0;
    for (int64_t s = 0; s < n; ++s) {
      double acc = 0.0;
      for (int64_t i = in.arc_offset[s]; i < in.arc_offset[s + 1]; ++i)
        acc += std::exp(-(double)in.arcs[i].weight) *
               v[in.arcs[i].nextstate];
      if (in.final_weight[s] != Fst::kInfinity)
        acc += std::exp(-(double)in.final_weight[s]) * vstart;
      // spectral shift (M + I): same eigenvectors, but aperiodic so the
      // power iteration converges even on periodic chain+restart graphs
      acc += v[s];
      nv[s] = acc;
      norm += acc * acc;
    }
    norm = std::sqrt(norm);
    if (norm <= 0.0) return in;  // no mass anywhere; nothing to push
    double max_rel = 0.0;
    for (int64_t s = 0; s < n; ++s) {
      nv[s] /= norm;
      // guard against exactly-dead states (shouldn't exist post-connect)
      if (nv[s] < 1e-300) nv[s] = 1e-300;
      max_rel = std::max(max_rel,
                         std::abs(nv[s] - v[s]) / std::max(v[s], 1e-300));
    }
    v.swap(nv);
    if (iter > 4 && max_rel < 1e-8) break;
  }
  MutableFst out = MutableFst::FromCsr(in);
  double log_vstart = std::log(v[in.start]);
  for (int64_t s = 0; s < n; ++s) {
    double log_vs = std::log(v[s]);
    for (Arc& a : out.state_arcs[s])
      a.weight =
          (float)((double)a.weight + log_vs - std::log(v[a.nextstate]));
    if (out.final_weight[s] != Fst::kInfinity)
      out.final_weight[s] =
          (float)((double)out.final_weight[s] + log_vs - log_vstart);
  }
  return out.ToCsr();
}

void RemoveDisambigSymbols(MutableFst* fst, int32_t first_disambig) {
  for (auto& arcs : fst->state_arcs)
    for (Arc& a : arcs)
      if (a.ilabel >= first_disambig) a.ilabel = 0;
}

}  // namespace ctc_native
