// Pruned lattice determinization (raw lattice -> CompactLattice).
//
// Native replacement for the decode-time pruned determinization the
// reference runs in C++ (lat/determinize-lattice-pruned.{h,cc} via
// DeterminizeLatticePhonePrunedWrapperCtc, ctc/ctc-graph.cc:245-269).
// The algorithm here is the same weighted subset construction over the
// word-projected acceptor as kaldi_ctc_tpu/decoding/det_lattice.py (the
// pure-Python reference implementation it is parity-tested against):
// epsilon (word-0) arcs are folded by best-cost closure, then classic
// subset determinization with (graph, acoustic, ilabel-string) residuals,
// common-prefix extraction onto the arc, and two prunes -- per-subset
// (elements > det_beam worse than the subset's best completion) and
// global (det paths whose best completion falls > det_beam behind the
// lattice's best path).  Raw lattices are acyclic, which this exploits
// throughout.

#pragma once

#include <cstdint>
#include <vector>

namespace ctc_native {

// Input view over the Python Lattice arrays (not owned).
struct RawLatticeView {
  int64_t num_states = 0;
  int64_t start = 0;
  int64_t num_arcs = 0;
  const int32_t* arc_from = nullptr;
  const int32_t* arc_to = nullptr;
  const int32_t* arc_ilabel = nullptr;
  const int32_t* arc_olabel = nullptr;
  const float* arc_graph_cost = nullptr;
  const float* arc_acoustic_cost = nullptr;
  const float* final_cost = nullptr;  // +inf = non-final
};

// Deterministic word lattice; arcs/finals carry CompactLatticeWeight-style
// (graph, acoustic, ilabel string) triples.  Strings are flattened with
// offset arrays (offsets have size count+1).
struct CompactLat {
  int64_t num_states = 0;
  int64_t start = 0;
  std::vector<int32_t> arc_from, arc_to, arc_word;
  std::vector<float> arc_graph_cost, arc_acoustic_cost;
  std::vector<int64_t> arc_il_offset;
  std::vector<int32_t> arc_ilabels;
  std::vector<float> final_graph_cost, final_acoustic_cost;  // +inf pair
  std::vector<int64_t> final_il_offset;
  std::vector<int32_t> final_ilabels;
};

// Returns false when the subset construction exceeds max_states (the
// caller backs off: halve det_beam, prune the input, retry -- the
// reference wrapper's retry loop).
bool DeterminizeLatticePruned(const RawLatticeView& in, float det_beam,
                              int64_t max_states, CompactLat* out);

}  // namespace ctc_native
