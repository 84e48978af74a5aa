#include "fst.h"

#include <algorithm>
#include <cstdio>
#include <unordered_map>
#include <utility>
#include <cstring>

namespace ctc_native {

namespace {

constexpr int32_t kFstMagicNumber = 2125659606;

struct Reader {
  FILE* f;
  bool ok = true;
  template <typename T>
  T Read() {
    T v{};
    if (fread(&v, sizeof(T), 1, f) != 1) ok = false;
    return v;
  }
  std::string ReadString() {
    int32_t n = Read<int32_t>();
    if (!ok || n < 0 || n > 1 << 20) { ok = false; return ""; }
    std::string s(n, '\0');
    if (n && fread(s.data(), 1, n, f) != (size_t)n) ok = false;
    return s;
  }
};

struct Writer {
  FILE* f;
  bool ok = true;
  template <typename T>
  void Write(const T& v) {
    if (fwrite(&v, sizeof(T), 1, f) != 1) ok = false;
  }
  void WriteString(const std::string& s) {
    Write<int32_t>((int32_t)s.size());
    if (!s.empty() && fwrite(s.data(), 1, s.size(), f) != s.size()) ok = false;
  }
};

}  // namespace

bool ReadVectorFst(const std::string& path, Fst* out, std::string* err) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) { *err = "cannot open " + path; return false; }
  Reader r{f};
  int32_t magic = r.Read<int32_t>();
  if (magic != kFstMagicNumber) {
    fclose(f); *err = "bad FST magic in " + path; return false;
  }
  std::string fsttype = r.ReadString();
  std::string arctype = r.ReadString();
  if (fsttype != "vector" || arctype != "standard") {
    fclose(f);
    *err = "unsupported fst/arc type " + fsttype + "/" + arctype +
           " (only vector/standard; run fstconvert --fst_type=vector)";
    return false;
  }
  int32_t version = r.Read<int32_t>();
  (void)r.Read<int32_t>();   // flags
  (void)r.Read<uint64_t>();  // properties
  int64_t start = r.Read<int64_t>();
  int64_t numstates = r.Read<int64_t>();
  (void)r.Read<int64_t>();   // numarcs
  if (!r.ok || version < 2 || numstates < 0) {
    fclose(f); *err = "corrupt FST header in " + path; return false;
  }
  out->start = start;
  out->final_weight.resize(numstates);
  out->arc_offset.assign(1, 0);
  out->arc_offset.reserve(numstates + 1);
  out->arcs.clear();
  for (int64_t s = 0; s < numstates; ++s) {
    out->final_weight[s] = r.Read<float>();
    int64_t narcs = r.Read<int64_t>();
    if (!r.ok || narcs < 0) {
      fclose(f); *err = "corrupt FST state in " + path; return false;
    }
    for (int64_t i = 0; i < narcs; ++i) {
      Arc a;
      a.ilabel = r.Read<int32_t>();
      a.olabel = r.Read<int32_t>();
      a.weight = r.Read<float>();
      a.nextstate = r.Read<int32_t>();
      out->arcs.push_back(a);
    }
    out->arc_offset.push_back((int64_t)out->arcs.size());
  }
  bool ok = r.ok;
  fclose(f);
  if (!ok) *err = "truncated FST file " + path;
  return ok;
}

bool WriteVectorFst(const std::string& path, const Fst& fst,
                    std::string* err) {
  FILE* f = fopen(path.c_str(), "wb");
  if (!f) { *err = "cannot open " + path + " for writing"; return false; }
  Writer w{f};
  w.Write<int32_t>(kFstMagicNumber);
  w.WriteString("vector");
  w.WriteString("standard");
  w.Write<int32_t>(2);          // version
  w.Write<int32_t>(0);          // flags
  w.Write<uint64_t>(0);         // properties
  w.Write<int64_t>(fst.start);
  w.Write<int64_t>(fst.NumStates());
  w.Write<int64_t>(fst.NumArcs());
  for (int64_t s = 0; s < fst.NumStates(); ++s) {
    w.Write<float>(fst.final_weight[s]);
    int64_t narcs = fst.arc_offset[s + 1] - fst.arc_offset[s];
    w.Write<int64_t>(narcs);
    for (int64_t i = fst.arc_offset[s]; i < fst.arc_offset[s + 1]; ++i) {
      const Arc& a = fst.arcs[i];
      w.Write<int32_t>(a.ilabel);
      w.Write<int32_t>(a.olabel);
      w.Write<float>(a.weight);
      w.Write<int32_t>(a.nextstate);
    }
  }
  bool ok = w.ok;
  fclose(f);
  if (!ok) *err = "write failure on " + path;
  return ok;
}

Fst MutableFst::ToCsr() const {
  Fst out;
  out.start = start;
  out.final_weight = final_weight;
  out.arc_offset.assign(1, 0);
  for (const auto& arcs : state_arcs) {
    for (const auto& a : arcs) out.arcs.push_back(a);
    out.arc_offset.push_back((int64_t)out.arcs.size());
  }
  return out;
}

MutableFst MutableFst::FromCsr(const Fst& f) {
  MutableFst out;
  out.start = f.start;
  out.final_weight = f.final_weight;
  out.state_arcs.resize(f.NumStates());
  for (int64_t s = 0; s < f.NumStates(); ++s)
    for (int64_t i = f.arc_offset[s]; i < f.arc_offset[s + 1]; ++i)
      out.state_arcs[s].push_back(f.arcs[i]);
  return out;
}

void ShiftLabelsAndAddBlanks(MutableFst* fst) {
  // Mirrors ctc/ctc-graph.cc:30-76.
  int64_t num_states = fst->NumStates();
  for (int64_t s = 0; s < num_states; ++s) {
    std::vector<Arc> self_loops;
    for (Arc& a : fst->state_arcs[s]) {
      if (a.ilabel != 0) a.ilabel++;
      if (a.nextstate == s) self_loops.push_back(a);
    }
    int64_t ns = fst->AddState();
    // move non-self-loop arcs to the new state
    for (const Arc& a : fst->state_arcs[s])
      if (a.nextstate != s) fst->state_arcs[ns].push_back(a);
    fst->state_arcs[s].clear();
    // s --eps--> ns
    fst->AddArc(s, Arc{0, 0, 0.0f, (int32_t)ns});
    // blank self-loop on ns
    fst->AddArc(ns, Arc{1, 0, 0.0f, (int32_t)ns});
    // original (shifted) self-loops stay on s
    for (const Arc& a : self_loops) fst->AddArc(s, a);
    // Deviation from the reference (which leaves new states non-final,
    // ctc-graph.cc:56): the blank-loop state inherits the original final
    // weight so utterances ending in blank frames can still terminate at
    // a final state instead of relying on the decoder's
    // best-token-not-final fallback.
    fst->final_weight[ns] = fst->final_weight[s];
  }
}


// Per-arc self-loop insertion — the add-self-loops --ctc=true step of
// the graph chain (hmm/hmm-utils.cc:504-509,561-567: in CTC mode both
// the forward transition and the self-loop carry weight One).  Each
// emitting arc s --p:w/c--> t becomes s --p:w/c--> m, m --p:eps/0--> m,
// m --eps:eps/0--> t, so sustained frames of a phone ride the self-loop
// instead of re-entering the word arc.  Run before
// ShiftLabelsAndAddBlanks when building TLG from L (which has no HMM
// self-loops), mirroring mkgraph.sh's HCLGa -> HCLG step.
void AddSelfLoops(MutableFst* fst) {
  int64_t n0 = fst->NumStates();
  for (int64_t s = 0; s < n0; ++s) {
    // NOTE: AddState() reallocates state_arcs — never hold a reference
    // to fst->state_arcs[s] across it; index fresh each time.
    size_t n_arcs = fst->state_arcs[s].size();
    for (size_t i = 0; i < n_arcs; ++i) {
      Arc a = fst->state_arcs[s][i];
      if (a.ilabel == 0) continue;
      if (a.nextstate == (int32_t)s && a.olabel == 0) continue;  // loop
      int64_t m = fst->AddState();
      fst->state_arcs[s][i].nextstate = (int32_t)m;
      fst->AddArc(m, Arc{a.ilabel, 0, 0.0f, (int32_t)m});
      fst->AddArc(m, Arc{0, 0, 0.0f, a.nextstate});
    }
  }
}

// Weighted composition a ∘ b (a's olabels match b's ilabels), tropical
// semiring, with naive epsilon handling: a's output-epsilon arcs advance
// only a, b's input-epsilon arcs advance only b.  This can generate
// redundant epsilon paths (no composition filter), which is harmless for
// min-cost token-passing decoding — the use here is offline TLG
// construction (utils/mkgraph.sh's fsttablecompose analogue for the
// mono-CTC graph chain L ∘ G).
Fst Compose(const Fst& a, const Fst& b) {
  MutableFst out;
  if (a.start < 0 || b.start < 0) return out.ToCsr();
  // Per-state ilabel-sorted index over b's arcs so each match is a binary
  // search instead of a full arc scan (the fsttablecompose idea: G states
  // can carry very many word arcs).
  std::vector<int32_t> b_order(b.NumArcs());
  for (int64_t i = 0; i < b.NumArcs(); ++i) b_order[i] = (int32_t)i;
  for (int64_t s = 0; s < b.NumStates(); ++s)
    std::sort(b_order.begin() + b.arc_offset[s],
              b_order.begin() + b.arc_offset[s + 1],
              [&](int32_t x, int32_t y) {
                return b.arcs[x].ilabel < b.arcs[y].ilabel;
              });
  auto b_match = [&](int32_t sb, int32_t label, int64_t* lo, int64_t* hi) {
    int64_t first = b.arc_offset[sb], last = b.arc_offset[sb + 1];
    auto cmp = [&](int32_t idx, int32_t l) { return b.arcs[idx].ilabel < l; };
    auto it = std::lower_bound(b_order.begin() + first,
                               b_order.begin() + last, label, cmp);
    *lo = it - b_order.begin();
    int64_t j = *lo;
    while (j < last && b.arcs[b_order[j]].ilabel == label) ++j;
    *hi = j;
  };
  // pair state -> id
  std::unordered_map<int64_t, int64_t> ids;
  std::vector<std::pair<int32_t, int32_t>> stack;
  auto key = [&](int32_t sa, int32_t sb) {
    return ((int64_t)sa << 32) | (uint32_t)sb;
  };
  auto get_id = [&](int32_t sa, int32_t sb) {
    int64_t k = key(sa, sb);
    auto it = ids.find(k);
    if (it != ids.end()) return it->second;
    int64_t id = out.AddState();
    ids.emplace(k, id);
    float fa = a.final_weight[sa], fb = b.final_weight[sb];
    out.final_weight[id] =
        (fa == Fst::kInfinity || fb == Fst::kInfinity) ? Fst::kInfinity
                                                       : fa + fb;
    stack.emplace_back(sa, sb);
    return id;
  };
  out.start = get_id((int32_t)a.start, (int32_t)b.start);
  while (!stack.empty()) {
    auto [sa, sb] = stack.back();
    stack.pop_back();
    int64_t s = ids[key(sa, sb)];
    for (int64_t i = a.arc_offset[sa]; i < a.arc_offset[sa + 1]; ++i) {
      const Arc& aa = a.arcs[i];
      if (aa.olabel == 0) {
        out.AddArc(s, Arc{aa.ilabel, 0, aa.weight,
                          (int32_t)get_id(aa.nextstate, sb)});
      } else {
        int64_t lo, hi;
        b_match(sb, aa.olabel, &lo, &hi);
        for (int64_t j = lo; j < hi; ++j) {
          const Arc& ba = b.arcs[b_order[j]];
          out.AddArc(s, Arc{aa.ilabel, ba.olabel, aa.weight + ba.weight,
                            (int32_t)get_id(aa.nextstate, ba.nextstate)});
        }
      }
    }
    {
      int64_t lo, hi;
      b_match(sb, 0, &lo, &hi);
      for (int64_t j = lo; j < hi; ++j) {
        const Arc& ba = b.arcs[b_order[j]];
        out.AddArc(s, Arc{0, ba.olabel, ba.weight,
                          (int32_t)get_id(sa, ba.nextstate)});
      }
    }
  }
  return out.ToCsr();
}

// Connect: drop states not reachable from start or not co-reachable to a
// final state (fstconnect), renumbering the survivors.
Fst Connect(const Fst& f) {
  int64_t n = f.NumStates();
  MutableFst out;
  if (f.start < 0 || n == 0) return out.ToCsr();
  std::vector<char> fwd(n, 0), bwd(n, 0);
  std::vector<int32_t> stack{(int32_t)f.start};
  fwd[f.start] = 1;
  while (!stack.empty()) {
    int32_t s = stack.back();
    stack.pop_back();
    for (int64_t i = f.arc_offset[s]; i < f.arc_offset[s + 1]; ++i) {
      int32_t t = f.arcs[i].nextstate;
      if (!fwd[t]) { fwd[t] = 1; stack.push_back(t); }
    }
  }
  // reverse adjacency for co-reachability
  std::vector<std::vector<int32_t>> rev(n);
  for (int64_t s = 0; s < n; ++s)
    for (int64_t i = f.arc_offset[s]; i < f.arc_offset[s + 1]; ++i)
      rev[f.arcs[i].nextstate].push_back((int32_t)s);
  for (int64_t s = 0; s < n; ++s)
    if (f.final_weight[s] != Fst::kInfinity && fwd[s] && !bwd[s]) {
      bwd[s] = 1;
      stack.push_back((int32_t)s);
    }
  while (!stack.empty()) {
    int32_t s = stack.back();
    stack.pop_back();
    for (int32_t p : rev[s])
      if (fwd[p] && !bwd[p]) { bwd[p] = 1; stack.push_back(p); }
  }
  std::vector<int64_t> remap(n, -1);
  for (int64_t s = 0; s < n; ++s)
    if (fwd[s] && bwd[s]) {
      remap[s] = out.AddState();
      out.final_weight[remap[s]] = f.final_weight[s];
    }
  if (remap[f.start] < 0) return MutableFst().ToCsr();
  out.start = remap[f.start];
  for (int64_t s = 0; s < n; ++s) {
    if (remap[s] < 0) continue;
    for (int64_t i = f.arc_offset[s]; i < f.arc_offset[s + 1]; ++i) {
      const Arc& a = f.arcs[i];
      if (remap[a.nextstate] < 0) continue;
      out.AddArc(remap[s], Arc{a.ilabel, a.olabel, a.weight,
                               (int32_t)remap[a.nextstate]});
    }
  }
  return out.ToCsr();
}

Fst RenumberBfs(const Fst& f) {
  const int64_t n = f.NumStates();
  Fst out;
  if (f.start < 0 || n == 0) return out;
  // BFS order from start; per-state arc order preserved, so with the
  // canonical eps-first layout each blank twin (reached by the first,
  // epsilon, arc) is numbered immediately after its original.
  std::vector<int32_t> order;
  order.reserve(n);
  std::vector<int32_t> newid(n, -1);
  newid[f.start] = 0;
  order.push_back((int32_t)f.start);
  for (size_t head = 0; head < order.size(); ++head) {
    int32_t s = order[head];
    for (int64_t i = f.arc_offset[s]; i < f.arc_offset[s + 1]; ++i) {
      int32_t t = f.arcs[i].nextstate;
      if (newid[t] < 0) {
        newid[t] = (int32_t)order.size();
        order.push_back(t);
      }
    }
  }
  for (int64_t s = 0; s < n; ++s)
    if (newid[s] < 0) {
      newid[s] = (int32_t)order.size();
      order.push_back((int32_t)s);
    }
  // Rebuild CSR directly in the new order (no MutableFst round trip —
  // this runs on multi-GB graphs).
  out.start = newid[f.start];  // == 0
  out.final_weight.resize(n);
  out.arc_offset.resize(n + 1);
  out.arcs.resize(f.arcs.size());
  int64_t k = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int32_t olds = order[i];
    out.arc_offset[i] = k;
    out.final_weight[i] = f.final_weight[olds];
    for (int64_t j = f.arc_offset[olds]; j < f.arc_offset[olds + 1];
         ++j, ++k) {
      const Arc& a = f.arcs[j];
      out.arcs[k] = Arc{a.ilabel, a.olabel, a.weight,
                        newid[a.nextstate]};
    }
  }
  out.arc_offset[n] = k;
  return out;
}

}  // namespace ctc_native
