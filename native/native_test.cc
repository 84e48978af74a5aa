// Self-checking native unit test (the reference's *-test.cc idiom,
// src/makefiles/default_rules.mk:74-91: asserts internally, nonzero exit
// on failure).  Covers the C++ layer directly — FST CSR build, CTC graph
// transform, composition/connect, best-path and lattice decoding — so
// `make test` works without Python, and `make asan` runs the same checks
// under AddressSanitizer (the valgrind-target analogue).

#include <cassert>
#include <cmath>
#include <cstdio>
#include <vector>

#include "decoder.h"
#include "fst.h"
#include "det_lattice.h"
#include "lattice.h"

using namespace ctc_native;

namespace {

Fst ChainFst(const std::vector<int32_t>& labels) {
  MutableFst m;
  m.start = 0;
  int64_t s = m.AddState();
  for (size_t i = 0; i < labels.size(); ++i) {
    int64_t t = m.AddState();
    m.AddArc(s, Arc{labels[i], labels[i], 0.0f, (int32_t)t});
    s = t;
  }
  m.final_weight[s] = 0.0f;
  return m.ToCsr();
}

void TestBestPath() {
  Fst fst = ChainFst({1, 2, 3});
  // identity-ish map: ilabel i -> column i
  std::vector<int32_t> map = {-1, 1, 2, 3};
  std::vector<float> scores(3 * 4, -5.0f);
  scores[0 * 4 + 1] = 5.0f;
  scores[1 * 4 + 2] = 5.0f;
  scores[2 * 4 + 3] = 5.0f;
  DecodeOptions opts;
  DecodeResult res;
  bool ok = DecodeBestPath(fst, scores.data(), 3, 4, map.data(),
                           (int64_t)map.size(), opts, &res);
  assert(ok);
  assert(res.reached_final);
  assert(res.words.size() == 3 && res.words[0] == 1 && res.words[2] == 3);
  std::printf("TestBestPath ok\n");
}

void TestBatchMatchesSingle() {
  Fst fst = ChainFst({1, 2});
  std::vector<int32_t> map = {-1, 1, 2};
  std::vector<float> scores(2 * 3, -2.0f);
  scores[0 * 3 + 1] = 2.0f;
  scores[1 * 3 + 2] = 2.0f;
  DecodeOptions opts;
  DecodeResult single;
  assert(DecodeBestPath(fst, scores.data(), 2, 3, map.data(), 3, opts,
                        &single));
  // batch: same utterance twice
  std::vector<float> packed;
  packed.insert(packed.end(), scores.begin(), scores.end());
  packed.insert(packed.end(), scores.begin(), scores.end());
  std::vector<int64_t> offsets = {0, 2, 4};
  std::vector<DecodeResult> results;
  std::vector<int> ok_flags;
  int n_ok = DecodeBestPathBatch(fst, packed.data(), offsets.data(), 2, 3,
                                 map.data(), 3, opts, &results, &ok_flags,
                                 2);
  assert(n_ok == 2);
  for (const auto& r : results) {
    assert(r.words == single.words);
    assert(std::fabs(r.total_cost - single.total_cost) < 1e-5f);
  }
  std::printf("TestBatchMatchesSingle ok\n");
}

void TestHashTokenGrowth() {
  // A wide star graph whose active set (~40k states, beam/max_active
  // wide open) far exceeds the token map's initial 16k-slot table:
  // exercises StateHashMap::Grow() mid-frame plus the sparse Clear()
  // path (statemap.h).  Decode result must be exact: only arcs with
  // ilabel 1 score high, so the best path is deterministic.
  const int32_t n_branch = 40000;
  MutableFst m;
  m.start = 0;
  m.AddState();
  for (int32_t i = 0; i < n_branch; ++i) {
    int64_t s = m.AddState();
    // label 1 on branch 7 (the winner), label 2 elsewhere
    int32_t lab = (i == 7) ? 1 : 2;
    m.AddArc(0, Arc{lab, i + 1, 0.0f, (int32_t)s});
    m.final_weight[s] = 0.0f;
  }
  Fst fst = m.ToCsr();
  std::vector<int32_t> map = {-1, 1, 2};
  std::vector<float> scores = {0.0f, 10.0f, -10.0f};  // 1 frame, 3 cols
  DecodeOptions opts;
  opts.beam = 1e9f;        // keep everything
  opts.max_active = n_branch + 1;
  DecodeResult res;
  assert(DecodeBestPath(fst, scores.data(), 1, 3, map.data(), 3, opts,
                        &res));
  assert(res.reached_final);
  assert(res.words.size() == 1 && res.words[0] == 8);  // branch 7 -> olabel 8
  // run again on the same (thread-local, now-grown) scratch: the
  // sparse-clear path and table reuse must not leak stale tokens
  DecodeResult res2;
  assert(DecodeBestPath(fst, scores.data(), 1, 3, map.data(), 3, opts,
                        &res2));
  assert(res2.words == res.words);
  assert(std::fabs(res2.total_cost - res.total_cost) < 1e-5f);
  std::printf("TestHashTokenGrowth ok\n");
}

void TestCtcTransformAndLattice() {
  // word-loop graph, 2 words
  MutableFst m;
  m.start = 0;
  m.AddState();
  for (int32_t lab = 1; lab <= 2; ++lab) {
    int64_t s = m.AddState();
    m.AddArc(0, Arc{lab, lab, 1.0f, (int32_t)s});
    m.AddArc(s, Arc{lab, 0, 0.0f, (int32_t)s});
    m.AddArc(s, Arc{0, 0, 0.0f, 0});
  }
  m.final_weight[0] = 0.0f;
  Fst base = m.ToCsr();
  MutableFst mm = MutableFst::FromCsr(base);
  ShiftLabelsAndAddBlanks(&mm);
  Fst g = mm.ToCsr();
  assert(g.NumStates() > base.NumStates());

  // scores: labels 1,1,blank,2 -> words 1, 2 (CTC default map g -> g-1)
  std::vector<int32_t> map = {-1, 0, 1, 2};
  std::vector<float> scores(4 * 3, -4.0f);
  scores[0 * 3 + 1] = 4.0f;
  scores[1 * 3 + 1] = 4.0f;
  scores[2 * 3 + 0] = 4.0f;
  scores[3 * 3 + 2] = 4.0f;
  LatticeOptions lopts;
  RawLattice lat;
  bool ok = DecodeLattice(g, scores.data(), 4, 3, map.data(), 4, lopts,
                          &lat);
  assert(ok);
  assert(lat.num_states > 0);
  // the best-path decoder agrees on the word sequence
  DecodeOptions dopts;
  DecodeResult res;
  assert(DecodeBestPath(g, scores.data(), 4, 3, map.data(), 4, dopts,
                        &res));
  assert(res.words.size() == 2 && res.words[0] == 1 && res.words[1] == 2);

  // BFS renumbering is a pure isomorphism: identical words, alignment
  // and total cost through the renumbered graph.
  Fst rn = RenumberBfs(g);
  assert(rn.NumStates() == g.NumStates());
  assert(rn.NumArcs() == g.NumArcs());
  assert(rn.start == 0);
  DecodeResult res2;
  assert(DecodeBestPath(rn, scores.data(), 4, 3, map.data(), 4, dopts,
                        &res2));
  assert(res2.words == res.words);
  assert(res2.alignment == res.alignment);
  assert(std::abs(res2.total_cost - res.total_cost) < 1e-5);
  std::printf("TestCtcTransformAndLattice ok\n");
}

void TestComposeConnect() {
  // A: 1:7 then 2:8 ; B: 7->70, 8->80 loop
  MutableFst a;
  a.start = 0;
  a.AddState(); a.AddState(); a.AddState();
  a.AddArc(0, Arc{1, 7, 0.5f, 1});
  a.AddArc(1, Arc{2, 8, 0.25f, 2});
  a.final_weight[2] = 0.0f;
  MutableFst b;
  b.start = 0;
  b.AddState();
  b.AddArc(0, Arc{7, 70, 1.0f, 0});
  b.AddArc(0, Arc{8, 80, 2.0f, 0});
  b.final_weight[0] = 0.0f;
  Fst c = Connect(Compose(a.ToCsr(), b.ToCsr()));
  assert(c.NumStates() == 3);
  assert(c.NumArcs() == 2);
  assert(c.arcs[0].olabel == 70 || c.arcs[1].olabel == 70);
  std::printf("TestComposeConnect ok\n");
}

void TestVectorFstRoundTrip() {
  Fst fst = ChainFst({3, 1, 4});
  std::string path = "/tmp/ctc_native_test.fst";
  std::string err;
  assert(WriteVectorFst(path, fst, &err));
  Fst back;
  assert(ReadVectorFst(path, &back, &err));
  assert(back.NumStates() == fst.NumStates());
  assert(back.NumArcs() == fst.NumArcs());
  assert(back.start == fst.start);
  std::printf("TestVectorFstRoundTrip ok\n");
}

}  // namespace

void TestDeterminizeMinimizePush() {
  // two equal-input paths with different weights; determinize keeps min
  MutableFst m;
  m.start = 0;
  for (int i = 0; i < 4; ++i) m.AddState();
  m.AddArc(0, Arc{1, 7, 0.5f, 1});
  m.AddArc(0, Arc{1, 7, 1.0f, 2});
  m.AddArc(1, Arc{2, 0, 0.25f, 3});
  m.AddArc(2, Arc{2, 0, 0.25f, 3});
  m.final_weight[3] = 0.0f;
  Fst f = m.ToCsr();
  Fst det;
  std::string err;
  bool ok = DeterminizeStar(f, &det, &err);
  assert(ok);
  // deterministic: start state has one arc on ilabel 1, total best path
  // cost 0.75 preserved
  assert(det.start >= 0);
  int n_start_arcs =
      (int)(det.arc_offset[det.start + 1] - det.arc_offset[det.start]);
  assert(n_start_arcs == 1);
  Fst mini = MinimizeEncoded(det);
  assert(mini.NumStates() <= det.NumStates());
  Fst pushed = PushSpecial(mini);
  // per-state outgoing mass equal across states
  double mass0 = -1.0;
  for (int64_t s = 0; s < pushed.NumStates(); ++s) {
    double acc = 0.0;
    for (int64_t i = pushed.arc_offset[s]; i < pushed.arc_offset[s + 1];
         ++i)
      acc += std::exp(-(double)pushed.arcs[i].weight);
    if (pushed.final_weight[s] != Fst::kInfinity)
      acc += std::exp(-(double)pushed.final_weight[s]);
    if (mass0 < 0) mass0 = acc;
    assert(std::abs(acc - mass0) < 1e-3);
  }
  std::printf("TestDeterminizeMinimizePush ok\n");
}

void TestDetLattice() {
  // two state-paths with the same word (1) at costs 1 and 5, plus word 2
  // at cost 1.5 — at det_beam 2 the cost-5 duplicate is beam-pruned from
  // the word-1 subset, word 2 survives, exactly one arc per word leaves
  // the start state, and the winning alignment (5,8) survives end to end
  // (common-prefix extraction runs before beam pruning, so here it rides
  // the target state's final string rather than the arc)
  std::vector<int32_t> fr = {0, 0, 0, 1, 2, 3};
  std::vector<int32_t> to = {1, 2, 3, 4, 4, 4};
  std::vector<int32_t> il = {5, 6, 7, 8, 9, 9};
  std::vector<int32_t> ol = {1, 1, 2, 0, 0, 0};
  std::vector<float> g = {1.0f, 5.0f, 1.5f, 0.0f, 0.0f, 0.0f};
  std::vector<float> a(6, 0.0f);
  std::vector<float> fc(5, Fst::kInfinity);
  fc[4] = 0.0f;
  RawLatticeView v;
  v.num_states = 5;
  v.start = 0;
  v.num_arcs = 6;
  v.arc_from = fr.data();
  v.arc_to = to.data();
  v.arc_ilabel = il.data();
  v.arc_olabel = ol.data();
  v.arc_graph_cost = g.data();
  v.arc_acoustic_cost = a.data();
  v.final_cost = fc.data();
  CompactLat out;
  bool ok = DeterminizeLatticePruned(v, 2.0f, 100000, &out);
  assert(ok);
  // start state must have exactly one arc per word (determinism)
  int arcs_from_start = 0;
  bool saw1 = false, saw2 = false;
  for (size_t i = 0; i < out.arc_from.size(); ++i) {
    if (out.arc_from[i] == out.start) {
      ++arcs_from_start;
      if (out.arc_word[i] == 1) {
        saw1 = true;
        assert(std::abs(out.arc_graph_cost[i] + out.arc_acoustic_cost[i] -
                        1.0f) < 1e-3);
        // winning alignment (5,8): arc prefix + target final string
        std::vector<int32_t> align(
            out.arc_ilabels.begin() + out.arc_il_offset[i],
            out.arc_ilabels.begin() + out.arc_il_offset[i + 1]);
        int32_t t = out.arc_to[i];
        align.insert(align.end(),
                     out.final_ilabels.begin() + out.final_il_offset[t],
                     out.final_ilabels.begin() + out.final_il_offset[t + 1]);
        assert((align == std::vector<int32_t>{5, 8}));
      }
      if (out.arc_word[i] == 2) saw2 = true;
    }
  }
  assert(arcs_from_start == 2 && saw1 && saw2);
  // blowup contract: tiny max_states fails cleanly
  CompactLat small;
  assert(!DeterminizeLatticePruned(v, 2.0f, 1, &small));
  std::printf("TestDetLattice ok\n");
}

int main() {
  TestBestPath();
  TestBatchMatchesSingle();
  TestHashTokenGrowth();
  TestCtcTransformAndLattice();
  TestComposeConnect();
  TestVectorFstRoundTrip();
  TestDeterminizeMinimizePush();
  TestDetLattice();
  std::printf("ALL NATIVE TESTS PASSED\n");
  return 0;
}
