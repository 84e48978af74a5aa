#include "fst.h"

#include <cstdio>
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

}  // namespace ctc_native
