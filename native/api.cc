// C API for the native FST + decoder (consumed from Python via ctypes).

#include <cstring>
#include <memory>
#include <mutex>
#include <string>
#include <unordered_map>

#include "decoder.h"
#include "det_lattice.h"
#include "fst.h"
#include "lattice.h"

using namespace ctc_native;

namespace {

// Per-graph decoder index cache.  BuildDecodeIndex is O(arcs) in time
// AND memory (an eps-first copy of the whole arc array) — rebuilding it
// per decode call is invisible on small graphs but dominates on big
// ones (measured: a 33M-state / 80M-arc 20k-vocab TLG spends ~80% of
// single-utterance decode wall time rebuilding a 1.3 GB index, RTF
// 0.45 vs 0.10 once shared).  Fst handles are immutable after
// construction, so the index is built once per handle and dropped with
// it in ctcn_fst_free.
std::mutex g_idx_mu;
std::unordered_map<const Fst*,
                   std::shared_ptr<const DecodeIndex>> g_idx_cache;

std::shared_ptr<const DecodeIndex> CachedIndex(const Fst* fst) {
  // Build under the lock; happens once per graph, after that every
  // lookup is a map hit.  The Fst is NOT mutated here: an in-place
  // CanonicalizeEpsFirst through const_cast would race with concurrent
  // reads (ctypes releases the GIL) and would make serialization depend
  // on whether a decode happened first.  Graphs from the CTC transform
  // are already eps-first (canonicalized at construction in
  // ctcn_make_ctc_graph), so BuildDecodeIndex stays zero-copy for the
  // common decode path; anything else pays a one-off reordered copy.
  std::lock_guard<std::mutex> lk(g_idx_mu);
  auto it = g_idx_cache.find(fst);
  if (it != g_idx_cache.end()) return it->second;
  auto idx = std::make_shared<const DecodeIndex>(BuildDecodeIndex(*fst));
  g_idx_cache.emplace(fst, idx);
  return idx;
}

void DropCachedIndex(const Fst* fst) {
  std::lock_guard<std::mutex> lk(g_idx_mu);
  g_idx_cache.erase(fst);
}

}  // namespace

extern "C" {

// ---- FST handling ----

void* ctcn_fst_load(const char* path, char* err_buf, int err_len) {
  auto* fst = new Fst();
  std::string err;
  if (!ReadVectorFst(path, fst, &err)) {
    if (err_buf && err_len > 0) {
      std::strncpy(err_buf, err.c_str(), err_len - 1);
      err_buf[err_len - 1] = '\0';
    }
    delete fst;
    return nullptr;
  }
  return fst;
}

// Build from flat arrays (testing / Python-constructed graphs).
// arcs_flat: [num_arcs, 4] int32 rows (state, ilabel, olabel, nextstate),
// weights: [num_arcs] float, finals: [num_states] float (inf = non-final).
void* ctcn_fst_from_arrays(int64_t start, int64_t num_states,
                           int64_t num_arcs, const int32_t* arcs_flat,
                           const float* weights, const float* finals) {
  MutableFst m;
  m.start = start;
  for (int64_t s = 0; s < num_states; ++s) {
    m.AddState();
    m.final_weight[s] = finals[s];
  }
  for (int64_t i = 0; i < num_arcs; ++i) {
    const int32_t* r = arcs_flat + i * 4;
    m.AddArc(r[0], Arc{r[1], r[2], weights[i], r[3]});
  }
  auto* fst = new Fst(m.ToCsr());
  return fst;
}

void ctcn_fst_free(void* fst) {
  DropCachedIndex(static_cast<Fst*>(fst));
  delete static_cast<Fst*>(fst);
}

int64_t ctcn_fst_num_states(void* fst) {
  return static_cast<Fst*>(fst)->NumStates();
}
int64_t ctcn_fst_num_arcs(void* fst) {
  return static_cast<Fst*>(fst)->NumArcs();
}
int64_t ctcn_fst_start(void* fst) { return static_cast<Fst*>(fst)->start; }

int ctcn_fst_write(void* fst, const char* path) {
  std::string err;
  return WriteVectorFst(path, *static_cast<Fst*>(fst), &err) ? 0 : -1;
}

// Composition + connect (graph building).
void* ctcn_fst_compose(void* a, void* b) {
  return new Fst(Connect(Compose(*static_cast<Fst*>(a),
                                 *static_cast<Fst*>(b))));
}

// Determinize-star (subset determinization + input-eps removal).
// Returns nullptr on failure (non-determinizable / eps cycles) with the
// message in err_buf.
void* ctcn_fst_determinize_star(void* fst, char* err_buf, int err_len,
                                int64_t max_states,
                                int allow_nonfunctional) {
  auto* out = new Fst();
  std::string err;
  if (!DeterminizeStar(*static_cast<Fst*>(fst), out, &err,
                       max_states > 0 ? max_states : 20 * 1000 * 1000,
                       allow_nonfunctional != 0)) {
    if (err_buf && err_len > 0) {
      std::strncpy(err_buf, err.c_str(), err_len - 1);
      err_buf[err_len - 1] = '\0';
    }
    delete out;
    return nullptr;
  }
  return out;
}

// Encoded minimization (fstminimizeencoded).
void* ctcn_fst_minimize(void* fst) {
  return new Fst(MinimizeEncoded(*static_cast<Fst*>(fst)));
}

// Push-special weight equalization (fstpushspecial).
void* ctcn_fst_push_special(void* fst) {
  return new Fst(PushSpecial(*static_cast<Fst*>(fst)));
}

// Map ilabels >= first_disambig to epsilon (fstrmsymbols).
void* ctcn_fst_remove_disambig(void* fst, int32_t first_disambig) {
  MutableFst m = MutableFst::FromCsr(*static_cast<Fst*>(fst));
  RemoveDisambigSymbols(&m, first_disambig);
  return new Fst(m.ToCsr());
}

// Connect (drop non-accessible / non-coaccessible states).
void* ctcn_fst_connect(void* fst) {
  return new Fst(Connect(*static_cast<Fst*>(fst)));
}

// BFS state renumbering (decode-time memory locality; pure isomorphism).
void* ctcn_fst_renumber_bfs(void* fst) {
  return new Fst(RenumberBfs(*static_cast<Fst*>(fst)));
}

// add-self-loops --ctc=true (per-arc self-loop states, weight One).
void* ctcn_add_self_loops(void* fst) {
  MutableFst m = MutableFst::FromCsr(*static_cast<Fst*>(fst));
  AddSelfLoops(&m);
  return new Fst(m.ToCsr());
}

// CTC graph transform (ShiftTransitionIdAndAddBlanks).
void* ctcn_make_ctc_graph(void* fst) {
  MutableFst m = MutableFst::FromCsr(*static_cast<Fst*>(fst));
  ShiftLabelsAndAddBlanks(&m);
  auto* out = new Fst(m.ToCsr());
  // Eps-first arc order at construction (safe: freshly built, no other
  // reader) so BuildDecodeIndex is zero-copy and serialization of the
  // graph never depends on decode history.
  CanonicalizeEpsFirst(out);
  return out;
}

// Copy the FST out as flat arrays (inverse of ctcn_fst_from_arrays);
// caller allocates to num_arcs/num_states.
void ctcn_fst_get_arrays(void* fst_ptr, int32_t* arcs_flat, float* weights,
                         float* finals) {
  const Fst& f = *static_cast<Fst*>(fst_ptr);
  int64_t k = 0;
  for (int64_t s = 0; s < f.NumStates(); ++s) {
    finals[s] = f.final_weight[s];
    for (int64_t i = f.arc_offset[s]; i < f.arc_offset[s + 1]; ++i, ++k) {
      const Arc& a = f.arcs[i];
      arcs_flat[k * 4 + 0] = (int32_t)s;
      arcs_flat[k * 4 + 1] = a.ilabel;
      arcs_flat[k * 4 + 2] = a.olabel;
      arcs_flat[k * 4 + 3] = a.nextstate;
      weights[k] = a.weight;
    }
  }
}

// ---- Decoding ----

// Returns 0 on success. Outputs are truncated to their max lengths;
// *num_words/*num_align report the untruncated sizes.
int ctcn_decode_best_path(void* fst_ptr, const float* scores,
                          int64_t num_frames, int64_t num_cols,
                          const int32_t* ilabel_map, int64_t map_size,
                          float beam, int32_t max_active,
                          float acoustic_scale,
                          int32_t* words_out, int64_t max_words,
                          int64_t* num_words, int32_t* align_out,
                          int64_t max_align, int64_t* num_align,
                          float* total_cost, int32_t* reached_final) {
  const Fst& fst = *static_cast<Fst*>(fst_ptr);
  DecodeOptions opts;
  opts.beam = beam;
  opts.max_active = max_active;
  opts.acoustic_scale = acoustic_scale;
  DecodeResult res;
  auto idx = CachedIndex(&fst);
  if (!DecodeBestPath(fst, *idx, scores, num_frames, num_cols, ilabel_map,
                      map_size, opts, &res))
    return -1;
  *num_words = (int64_t)res.words.size();
  *num_align = (int64_t)res.alignment.size();
  for (int64_t i = 0; i < std::min<int64_t>(*num_words, max_words); ++i)
    words_out[i] = res.words[i];
  for (int64_t i = 0; i < std::min<int64_t>(*num_align, max_align); ++i)
    align_out[i] = res.alignment[i];
  *total_cost = res.total_cost;
  *reached_final = res.reached_final ? 1 : 0;
  return 0;
}

// Threaded batch decode.  words_out/align_out are [num_utts, max_len]
// row-major; lengths reported per utterance (truncated to max_len).
// ok_out[u] = 1 on success.  Returns the success count.
int ctcn_decode_best_path_batch(
    void* fst_ptr, const float* scores, const int64_t* frame_offsets,
    int64_t num_utts, int64_t num_cols, const int32_t* ilabel_map,
    int64_t map_size, float beam, int32_t max_active, float acoustic_scale,
    int num_threads, int32_t* words_out, int64_t max_words,
    int64_t* num_words, int32_t* align_out, int64_t max_align,
    int64_t* num_align, float* total_costs, int32_t* ok_out) {
  const Fst& fst = *static_cast<Fst*>(fst_ptr);
  DecodeOptions opts;
  opts.beam = beam;
  opts.max_active = max_active;
  opts.acoustic_scale = acoustic_scale;
  std::vector<DecodeResult> results;
  std::vector<int> ok;
  auto idx = CachedIndex(&fst);
  int n_ok = DecodeBestPathBatch(fst, *idx, scores, frame_offsets,
                                 num_utts, num_cols, ilabel_map, map_size,
                                 opts, &results, &ok, num_threads);
  for (int64_t u = 0; u < num_utts; ++u) {
    const DecodeResult& r = results[u];
    num_words[u] = (int64_t)r.words.size();
    num_align[u] = (int64_t)r.alignment.size();
    total_costs[u] = r.total_cost;
    ok_out[u] = ok[u];
    for (int64_t i = 0; i < std::min<int64_t>(num_words[u], max_words); ++i)
      words_out[u * max_words + i] = r.words[i];
    for (int64_t i = 0; i < std::min<int64_t>(num_align[u], max_align); ++i)
      align_out[u * max_align + i] = r.alignment[i];
  }
  return n_ok;
}

// ---- Lattice generation ----

void* ctcn_decode_lattice(void* fst_ptr, const float* scores,
                          int64_t num_frames, int64_t num_cols,
                          const int32_t* ilabel_map, int64_t map_size,
                          float beam, int32_t max_active,
                          float acoustic_scale, float lattice_beam) {
  const Fst& fst = *static_cast<Fst*>(fst_ptr);
  LatticeOptions opts;
  opts.beam = beam;
  opts.max_active = max_active;
  opts.acoustic_scale = acoustic_scale;
  opts.lattice_beam = lattice_beam;
  auto* lat = new RawLattice();
  auto idx = CachedIndex(&fst);
  if (!DecodeLattice(fst, *idx, scores, num_frames, num_cols, ilabel_map,
                     map_size, opts, lat)) {
    delete lat;
    return nullptr;
  }
  return lat;
}

void ctcn_lat_free(void* lat) { delete static_cast<RawLattice*>(lat); }

int64_t ctcn_lat_num_states(void* lat) {
  return static_cast<RawLattice*>(lat)->num_states;
}
int64_t ctcn_lat_num_arcs(void* lat) {
  return (int64_t)static_cast<RawLattice*>(lat)->arc_from.size();
}
int64_t ctcn_lat_start(void* lat) {
  return static_cast<RawLattice*>(lat)->start;
}
int ctcn_lat_reached_final(void* lat) {
  return static_cast<RawLattice*>(lat)->reached_final ? 1 : 0;
}
float ctcn_lat_best_cost(void* lat) {
  return static_cast<RawLattice*>(lat)->best_cost;
}

// Copy arcs/finals/frames out; caller allocates to the sizes above.
void ctcn_lat_get_arcs(void* lat_ptr, int32_t* from, int32_t* to,
                       int32_t* ilabel, int32_t* olabel, float* graph_cost,
                       float* acoustic_cost) {
  const RawLattice& l = *static_cast<RawLattice*>(lat_ptr);
  int64_t n = (int64_t)l.arc_from.size();
  std::memcpy(from, l.arc_from.data(), n * sizeof(int32_t));
  std::memcpy(to, l.arc_to.data(), n * sizeof(int32_t));
  std::memcpy(ilabel, l.arc_ilabel.data(), n * sizeof(int32_t));
  std::memcpy(olabel, l.arc_olabel.data(), n * sizeof(int32_t));
  std::memcpy(graph_cost, l.arc_graph_cost.data(), n * sizeof(float));
  std::memcpy(acoustic_cost, l.arc_acoustic_cost.data(), n * sizeof(float));
}

void ctcn_lat_get_finals(void* lat_ptr, float* out) {
  const RawLattice& l = *static_cast<RawLattice*>(lat_ptr);
  std::memcpy(out, l.final_cost.data(),
              l.final_cost.size() * sizeof(float));
}

void ctcn_lat_get_frames(void* lat_ptr, int32_t* out) {
  const RawLattice& l = *static_cast<RawLattice*>(lat_ptr);
  std::memcpy(out, l.state_frame.data(),
              l.state_frame.size() * sizeof(int32_t));
}

// ---- Pruned lattice determinization ----

void* ctcn_det_lattice(int64_t num_states, int64_t start, int64_t num_arcs,
                       const int32_t* arc_from, const int32_t* arc_to,
                       const int32_t* arc_ilabel, const int32_t* arc_olabel,
                       const float* arc_graph_cost,
                       const float* arc_acoustic_cost,
                       const float* final_cost, float det_beam,
                       int64_t max_states) {
  RawLatticeView in;
  in.num_states = num_states;
  in.start = start;
  in.num_arcs = num_arcs;
  in.arc_from = arc_from;
  in.arc_to = arc_to;
  in.arc_ilabel = arc_ilabel;
  in.arc_olabel = arc_olabel;
  in.arc_graph_cost = arc_graph_cost;
  in.arc_acoustic_cost = arc_acoustic_cost;
  in.final_cost = final_cost;
  auto* out = new CompactLat();
  if (!DeterminizeLatticePruned(in, det_beam, max_states, out)) {
    delete out;
    return nullptr;  // blowup: caller halves the beam and retries
  }
  return out;
}

void ctcn_clat_free(void* p) { delete static_cast<CompactLat*>(p); }

int64_t ctcn_clat_num_states(void* p) {
  return static_cast<CompactLat*>(p)->num_states;
}
int64_t ctcn_clat_num_arcs(void* p) {
  return (int64_t)static_cast<CompactLat*>(p)->arc_from.size();
}
int64_t ctcn_clat_start(void* p) {
  return static_cast<CompactLat*>(p)->start;
}
int64_t ctcn_clat_arc_ilabels_size(void* p) {
  return (int64_t)static_cast<CompactLat*>(p)->arc_ilabels.size();
}
int64_t ctcn_clat_final_ilabels_size(void* p) {
  return (int64_t)static_cast<CompactLat*>(p)->final_ilabels.size();
}

void ctcn_clat_get_arcs(void* p, int32_t* from, int32_t* to, int32_t* word,
                        float* graph_cost, float* acoustic_cost,
                        int64_t* il_offset, int32_t* ilabels) {
  const CompactLat& c = *static_cast<CompactLat*>(p);
  int64_t n = (int64_t)c.arc_from.size();
  std::memcpy(from, c.arc_from.data(), n * sizeof(int32_t));
  std::memcpy(to, c.arc_to.data(), n * sizeof(int32_t));
  std::memcpy(word, c.arc_word.data(), n * sizeof(int32_t));
  std::memcpy(graph_cost, c.arc_graph_cost.data(), n * sizeof(float));
  std::memcpy(acoustic_cost, c.arc_acoustic_cost.data(), n * sizeof(float));
  std::memcpy(il_offset, c.arc_il_offset.data(),
              (n + 1) * sizeof(int64_t));
  std::memcpy(ilabels, c.arc_ilabels.data(),
              c.arc_ilabels.size() * sizeof(int32_t));
}

void ctcn_clat_get_finals(void* p, float* graph_cost, float* acoustic_cost,
                          int64_t* il_offset, int32_t* ilabels) {
  const CompactLat& c = *static_cast<CompactLat*>(p);
  std::memcpy(graph_cost, c.final_graph_cost.data(),
              c.num_states * sizeof(float));
  std::memcpy(acoustic_cost, c.final_acoustic_cost.data(),
              c.num_states * sizeof(float));
  std::memcpy(il_offset, c.final_il_offset.data(),
              (c.num_states + 1) * sizeof(int64_t));
  std::memcpy(ilabels, c.final_ilabels.data(),
              c.final_ilabels.size() * sizeof(int32_t));
}

}  // extern "C"
