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

#ifdef DETSTATS
struct DetStats {
  long long append = 0, strip = 0, strip_hit = 0, group_arcs = 0,
            groups = 0, members_total = 0, closure_pops = 0,
            closure_relax = 0, lcp_steps = 0, interns = 0;
} g_detstats;
#define DSTAT(x) (g_detstats.x)
#else
static inline long long& detstats_noop() { static long long v; return v; }
#define DSTAT(x) (detstats_noop())
#endif

namespace {

// Flat open-addressing int64 -> int32 map (linear probing).  Key 0 is
// reserved as the empty sentinel — callers must never pass it.  Replaces
// std::unordered_map on the determinizer's hottest lookup paths, where
// the node-based map's per-find pointer chase dominated.
class FlatMap64 {
 public:
  explicit FlatMap64(size_t cap = 1u << 16) : slots_(cap, Entry{0, 0}) {}

  // Pointer to the value slot for `key`; *created says if it was new
  // (value uninitialized in that case — caller must assign).
  int32_t* FindOrInsert(int64_t key, bool* created) {
    if ((used_ + 1) * 10 >= slots_.size() * 7) Grow();
    size_t mask = slots_.size() - 1;
    size_t i = Mix(key) & mask;
    while (slots_[i].key != 0) {
      if (slots_[i].key == key) {
        *created = false;
        return &slots_[i].val;
      }
      i = (i + 1) & mask;
    }
    slots_[i].key = key;
    ++used_;
    *created = true;
    return &slots_[i].val;
  }

 private:
  static size_t Mix(int64_t k) {
    uint64_t h = (uint64_t)k * 0x9E3779B97F4A7C15ull;
    return (size_t)(h ^ (h >> 29));
  }

  void Grow() {
    std::vector<Entry> old;
    old.swap(slots_);
    slots_.assign(old.size() * 2, Entry{0, 0});
    size_t mask = slots_.size() - 1;
    for (const Entry& e : old) {
      if (e.key == 0) continue;
      size_t i = Mix(e.key) & mask;
      while (slots_[i].key != 0) i = (i + 1) & mask;
      slots_[i] = e;
    }
  }

  struct Entry {
    int64_t key;
    int32_t val;
  };
  std::vector<Entry> slots_;
  size_t used_ = 0;
};

// ---------------------------------------------------------------------------
// Hash-consed output strings (prefix-shared trie; id 0 = empty string).
// Hash-consing is canonical: equal label sequences always intern to the
// same id, so the trie supports O(len) longest-common-prefix (deepest
// common ancestor) without expanding strings.
// ---------------------------------------------------------------------------

class StringRepo {
 public:
  // Append one label to the string `prefix`, returning the new id.
  // Key never 0: label != 0 on every call path (epsilon olabels are
  // filtered before Append; Expand never yields 0).
  int32_t Append(int32_t prefix, int32_t label) {
    ++DSTAT(append);
    int64_t key = ((int64_t)prefix << 32) | (uint32_t)label;
    bool created;
    int32_t* v = intern_.FindOrInsert(key, &created);
    if (!created) return *v;
    int32_t depth = prefix == 0 ? 1 : nodes_[prefix - 1].depth + 1;
    nodes_.push_back({prefix, label, depth});
    *v = (int32_t)nodes_.size();  // ids are 1-based; 0 = empty
    return *v;
  }

  // Expand to front-to-back label vector.
  void Expand(int32_t id, std::vector<int32_t>* out) const {
    out->clear();
    while (id != 0) {
      out->push_back(nodes_[id - 1].label);
      id = nodes_[id - 1].prefix;
    }
    std::reverse(out->begin(), out->end());
  }

  int32_t FromVector(const std::vector<int32_t>& labels) {
    int32_t id = 0;
    for (int32_t l : labels) id = Append(id, l);
    return id;
  }

  int32_t Depth(int32_t id) const {
    return id == 0 ? 0 : nodes_[id - 1].depth;
  }
  int32_t Parent(int32_t id) const { return nodes_[id - 1].prefix; }
  int32_t Label(int32_t id) const { return nodes_[id - 1].label; }

  // Deepest common ancestor == longest common prefix of the two strings.
  int32_t Lcp(int32_t a, int32_t b) const {
    while (Depth(a) > Depth(b)) a = Parent(a);
    while (Depth(b) > Depth(a)) b = Parent(b);
    while (a != b) {
      a = Parent(a);
      b = Parent(b);
    }
    return a;
  }

  // Residual of `s` below its ancestor `p`, re-interned from the root.
  // O(|residual|) on a miss — typically 0-2 labels even when the full
  // strings are long — and O(1) via the memo table on repeats, which
  // dominate: subsets recur, so the same (string, prefix) residuals are
  // requested millions of times at TLG scale.
  int32_t StripPrefix(int32_t s, int32_t p, std::vector<int32_t>* tmp) {
    if (s == p) return 0;
    ++DSTAT(strip);
    // key never 0: s > 0 (s != p and p is an ancestor), so s<<32 != 0
    int64_t key = ((int64_t)s << 32) | (uint32_t)p;
    bool created;
    int32_t* v = strip_memo_.FindOrInsert(key, &created);
    if (!created) {
      ++DSTAT(strip_hit);
      return *v;
    }
    tmp->clear();
    int32_t cur = s;
    while (cur != p) {
      tmp->push_back(Label(cur));
      cur = Parent(cur);
    }
    int32_t id = 0;
    for (size_t i = tmp->size(); i-- > 0;) id = Append(id, (*tmp)[i]);
    // Append may grow strip_memo_?  No — Append only touches intern_;
    // v stays valid.
    *v = id;
    return id;
  }

 private:
  struct Node {
    int32_t prefix, label, depth;
  };
  std::vector<Node> nodes_;
  FlatMap64 intern_;
  FlatMap64 strip_memo_;
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

// Open-addressing intern table for canonical subsets, keyed by a
// 128-bit ORDER-INSENSITIVE hash (sum of per-element SplitMix hashes
// over the canonical (state, weight-bits|string-id) pairs).  The
// commutative key lets the hot lookup path skip sorting the subset and
// packing a byte-exact key entirely: ~95% of interns are hits at TLG
// scale, so only the ~5% that allocate a new det state pay the
// sort+pack.  Equality trusts the 128-bit hash plus the element count
// — a false merge needs two distinct subsets colliding in 128 bits
// (probability ~n^2 / 2^129 ~ 1e-25 at 100M subsets), far below any
// hardware error rate.  Canonical element spans for NEW subsets are
// stored (sorted) in one arena for later expansion.
class SubsetTable {
 public:
  SubsetTable() : slots_(1u << 16) {}

  static uint64_t SplitMix(uint64_t x) {
    x += 0x9E3779B97F4A7C15ull;
    x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ull;
    x = (x ^ (x >> 27)) * 0x94D049BB133111EBull;
    return x ^ (x >> 31);
  }

  // -1 if absent.
  int64_t Find(uint64_t h1, uint64_t h2, int32_t nelem) const {
    size_t mask = slots_.size() - 1;
    size_t i = (size_t)h1 & mask;
    while (slots_[i].id >= 0) {
      const Slot& s = slots_[i];
      if (s.h1 == h1 && s.h2 == h2 && s.nelem == nelem) return s.id;
      i = (i + 1) & mask;
    }
    return -1;
  }

  // Caller guarantees (h1, h2, nelem) is absent.  `key[0:len]` is the
  // canonical sorted packed span; it is copied into the arena.
  void Insert(uint64_t h1, uint64_t h2, int32_t nelem, const int64_t* key,
              int32_t len, int64_t id, int64_t* off_out) {
    *off_out = (int64_t)pool_.size();
    pool_.insert(pool_.end(), key, key + len);
    size_t mask = slots_.size() - 1;
    size_t i = (size_t)h1 & mask;
    while (slots_[i].id >= 0) i = (i + 1) & mask;
    slots_[i] = Slot{h1, h2, nelem, id};
    if (++used_ * 10 >= slots_.size() * 7) Grow();
  }

  const int64_t* Pool() const { return pool_.data(); }
  int64_t PoolSize() const { return (int64_t)pool_.size(); }

 private:
  struct Slot {
    uint64_t h1;
    uint64_t h2;
    int32_t nelem;
    int64_t id = -1;
  };

  void Grow() {
    std::vector<Slot> bigger(slots_.size() * 2);
    size_t mask = bigger.size() - 1;
    for (const Slot& s : slots_) {
      if (s.id < 0) continue;
      size_t i = (size_t)s.h1 & mask;
      while (bigger[i].id >= 0) i = (i + 1) & mask;
      bigger[i] = s;
    }
    slots_.swap(bigger);
  }

  std::vector<int64_t> pool_;
  std::vector<Slot> slots_;
  size_t used_ = 0;
};

}  // namespace

bool DeterminizeStar(const Fst& in, Fst* out, std::string* err,
                     int64_t max_states, bool allow_nonfunctional) {
  // Subset determinization with input-epsilon removal, engineered for
  // TLG-scale inputs (millions of subsets with hundreds of elements):
  //  * dense epoch-stamped per-input-state scratch replaces the
  //    per-label unordered_map<state, Element> (the old code spent
  //    >40% of build time in hash-node churn: ~830M map ops at 5k
  //    vocab);
  //  * arcs are pre-split into eps/non-eps CSR and bucketed by label
  //    with a counting pass instead of std::sort over every subset's
  //    full arc list (another ~22%);
  //  * normalization runs once per target subset (the old path
  //    normalized twice: once for the key, once for storage) and uses
  //    the string trie's O(len) LCP instead of expanding every
  //    residual string;
  //  * canonical subsets intern into one arena (SubsetTable) and the
  //    output accumulates as flat (src, arc) pairs finished by a
  //    stable counting sort — no vector-of-vectors MutableFst.
  // Results are identical to the previous implementation: per-label
  // visit order, tie-breaks, weight quantization, and state-allocation
  // order are all preserved.
  const char* kNonFunc =
      "determinize-star: input is not functional (two paths with the "
      "same input sequence and weight produce different outputs); add "
      "lexicon disambiguation symbols, or allow_nonfunctional to keep "
      "the lexicographically smaller output";
  if (in.start < 0) {
    *out = Fst{};
    return true;
  }
  const int64_t n_in = in.NumStates();
  StringRepo repo;
  std::vector<int32_t> tmp_a, tmp_b, tmp_c, chain_buf;

  // --- split input arcs into eps / non-eps CSR (original order kept) --
  std::vector<int64_t> eps_off(n_in + 1, 0), lab_off(n_in + 1, 0);
  int32_t max_label = 0;
  for (int64_t s = 0; s < n_in; ++s) {
    for (int64_t i = in.arc_offset[s]; i < in.arc_offset[s + 1]; ++i) {
      if (in.arcs[i].ilabel == 0) {
        ++eps_off[s + 1];
      } else {
        ++lab_off[s + 1];
        max_label = std::max(max_label, in.arcs[i].ilabel);
      }
    }
  }
  for (int64_t s = 0; s < n_in; ++s) {
    eps_off[s + 1] += eps_off[s];
    lab_off[s + 1] += lab_off[s];
  }
  std::vector<Arc> eps_arcs(eps_off[n_in]), lab_arcs(lab_off[n_in]);
  {
    std::vector<int64_t> ep = eps_off, lp = lab_off;
    for (int64_t s = 0; s < n_in; ++s)
      for (int64_t i = in.arc_offset[s]; i < in.arc_offset[s + 1]; ++i) {
        const Arc& a = in.arcs[i];
        if (a.ilabel == 0)
          eps_arcs[ep[s]++] = a;
        else
          lab_arcs[lp[s]++] = a;
      }
  }

  // --- dense per-input-state subset scratch (epoch-stamped) -----------
  struct StSlot {
    uint32_t epoch;
    float w;
    int32_t str;
  };
  std::vector<StSlot> st(n_in, StSlot{0, 0.0f, 0});
  uint32_t epoch = 0;
  auto next_epoch = [&]() {
    if (++epoch == 0) {  // uint32 wraparound: invalidate all stamps
      for (StSlot& s : st) s.epoch = 0;
      epoch = 1;
    }
  };
  std::vector<int32_t> members;   // input states of the subset in flight
  std::vector<int32_t> queue;     // closure worklist (FIFO via qhead)

  // --- det output: flat accumulation ----------------------------------
  std::vector<float> det_final;
  std::vector<int32_t> arc_src;
  std::vector<Arc> arc_dat;
  // (pool offset, element count) per det state; (-1,-1) for chain states
  std::vector<std::pair<int64_t, int32_t>> sub_span;
  auto add_state = [&]() -> int64_t {
    det_final.push_back(Fst::kInfinity);
    sub_span.emplace_back(-1, -1);
    return (int64_t)det_final.size() - 1;
  };
  auto add_arc = [&](int64_t s, const Arc& a) {
    arc_src.push_back((int32_t)s);
    arc_dat.push_back(a);
  };

  SubsetTable table;
  std::vector<int64_t> key_buf;
  std::vector<Element> norm_buf;
  std::deque<int64_t> work;
  int64_t superfinal = -1;

  // --- epsilon closure over the dense subset ---------------------------
  auto closure = [&](std::string* cerr) -> bool {
    if (eps_arcs.empty()) return true;
    queue.assign(members.begin(), members.end());
    size_t qhead = 0;
    int64_t updates = 0;
    const int64_t update_limit =
        64 * (int64_t)(members.size() + 16) * (n_in + 16);
    while (qhead < queue.size()) {
      ++DSTAT(closure_pops);
      int32_t s = queue[qhead++];
      float cw = st[s].w;
      int32_t cstr = st[s].str;
      for (int64_t i = eps_off[s]; i < eps_off[s + 1]; ++i) {
        const Arc& a = eps_arcs[i];
        float w2 = Quantize((double)cw + a.weight);
        int32_t str2 = a.olabel ? repo.Append(cstr, a.olabel) : cstr;
        int32_t t = a.nextstate;
        bool take;
        if (st[t].epoch != epoch) {
          st[t].epoch = epoch;
          members.push_back(t);
          take = true;
        } else if (w2 < st[t].w) {
          take = true;
        } else if (w2 == st[t].w && str2 != st[t].str) {
          if (!allow_nonfunctional) {
            *cerr = kNonFunc;
            return false;
          }
          take = StringLess(repo, str2, st[t].str, &tmp_a, &tmp_b);
        } else {
          take = false;
        }
        if (take) {
          ++DSTAT(closure_relax);
          st[t].w = w2;
          st[t].str = str2;
          queue.push_back(t);
          if (++updates > update_limit) {
            *cerr = "epsilon cycle detected in determinize-star input";
            return false;
          }
        }
      }
    }
    return true;
  };

  // --- precomputed transitive eps-closure rows -------------------------
  // When the eps graph is acyclic (true for LG: backoff arcs point to
  // strictly lower-order histories), the per-group dynamic closure —
  // 415M queue pops at 5k vocab, ~2x the total member count — is
  // replaced by per-state transitive closure rows computed once:
  // row(s) = all (t, dw, dstr) reachable from s via eps arcs, min-merged
  // with the same tie rule as the dynamic closure.  Group processing
  // then applies each pre-closure member's row directly (transitivity
  // makes one application per member complete).  Falls back to the
  // dynamic closure on eps cycles or if rows blow past a size guard.
  struct RowEnt {
    int32_t t;
    float dw;      // quantized weight of the best eps path
    int32_t dstr;  // interned olabel string of that path
  };
  std::vector<RowEnt> rows_pool;
  std::vector<int64_t> row_off;
  bool rows_ok = false;
  if (!eps_arcs.empty()) {
    // Kahn over eps out-edges: a state finalizes when every eps
    // successor has (successors-first topological order)
    std::vector<int32_t> outdeg(n_in, 0);
    std::vector<int64_t> rev_off(n_in + 1, 0);
    for (int64_t s = 0; s < n_in; ++s) {
      outdeg[s] = (int32_t)(eps_off[s + 1] - eps_off[s]);
      for (int64_t i = eps_off[s]; i < eps_off[s + 1]; ++i)
        ++rev_off[eps_arcs[i].nextstate + 1];
    }
    for (int64_t s = 0; s < n_in; ++s) rev_off[s + 1] += rev_off[s];
    std::vector<int32_t> rev_src(eps_off[n_in]);
    {
      std::vector<int64_t> rp(rev_off.begin(), rev_off.end() - 1);
      for (int64_t s = 0; s < n_in; ++s)
        for (int64_t i = eps_off[s]; i < eps_off[s + 1]; ++i)
          rev_src[rp[eps_arcs[i].nextstate]++] = (int32_t)s;
    }
    std::vector<int32_t> topo;
    topo.reserve(n_in);
    for (int64_t s = 0; s < n_in; ++s)
      if (outdeg[s] == 0) topo.push_back((int32_t)s);
    for (size_t qi = 0; qi < topo.size(); ++qi) {
      int32_t t = topo[qi];
      for (int64_t i = rev_off[t]; i < rev_off[t + 1]; ++i)
        if (--outdeg[rev_src[i]] == 0) topo.push_back(rev_src[i]);
    }
    if ((int64_t)topo.size() == n_in) {
      rows_ok = true;
      row_off.assign(n_in + 1, 0);
      std::vector<int64_t> row_at(n_in, -1);  // offset into rows_pool
      std::vector<int32_t> row_len(n_in, 0);
      const int64_t row_guard = 32 * n_in + 1024;
      for (int32_t s : topo) {
        if (eps_off[s + 1] == eps_off[s]) continue;  // empty row
        next_epoch();
        members.clear();
        for (int64_t i = eps_off[s]; i < eps_off[s + 1]; ++i) {
          const Arc& a = eps_arcs[i];
          // direct edge, then the successor's full row shifted by it
          float base_w = Quantize((double)a.weight);
          int32_t base_str = a.olabel ? repo.Append(0, a.olabel) : 0;
          int32_t t = a.nextstate;
          int64_t r0 = row_at[t], rn = row_len[t];
          for (int64_t k = -1; k < rn; ++k) {
            int32_t u;
            float w2;
            int32_t str2;
            if (k < 0) {
              u = t;
              w2 = base_w;
              str2 = base_str;
            } else {
              const RowEnt& r = rows_pool[r0 + k];
              u = r.t;
              w2 = Quantize((double)base_w + r.dw);
              str2 = base_str == 0
                         ? r.dstr
                         : (r.dstr == 0 ? base_str : -1);
              if (str2 == -1) {
                // rare: both the edge and the row entry emit output
                repo.Expand(r.dstr, &tmp_c);
                str2 = base_str;
                for (int32_t l : tmp_c) str2 = repo.Append(str2, l);
              }
            }
            bool take;
            if (st[u].epoch != epoch) {
              st[u].epoch = epoch;
              members.push_back(u);
              take = true;
            } else if (w2 < st[u].w) {
              take = true;
            } else if (w2 == st[u].w && str2 != st[u].str) {
              if (!allow_nonfunctional) {
                *err = kNonFunc;
                return false;
              }
              take = StringLess(repo, str2, st[u].str, &tmp_a, &tmp_b);
            } else {
              take = false;
            }
            if (take) {
              st[u].w = w2;
              st[u].str = str2;
            }
          }
        }
        row_at[s] = (int64_t)rows_pool.size();
        row_len[s] = (int32_t)members.size();
        for (int32_t u : members)
          rows_pool.push_back(RowEnt{u, st[u].w, st[u].str});
        if ((int64_t)rows_pool.size() > row_guard) {
          rows_ok = false;  // eps structure too dense; dynamic is leaner
          break;
        }
      }
      if (rows_ok) {
        // CSR-ify in state order (row_at order is topo, not id order)
        for (int64_t s = 0; s < n_in; ++s) row_off[s + 1] = row_len[s];
        for (int64_t s = 0; s < n_in; ++s) row_off[s + 1] += row_off[s];
        std::vector<RowEnt> csr(rows_pool.size());
        for (int64_t s = 0; s < n_in; ++s)
          for (int32_t k = 0; k < row_len[s]; ++k)
            csr[row_off[s] + k] = rows_pool[row_at[s] + k];
        rows_pool.swap(csr);
      }
    }
  }

  // interned-string concatenation with memo (row application composes
  // a member string with a row's olabel string; nonzero dstr is rare)
  FlatMap64 concat_memo;
  auto concat_str = [&](int32_t a, int32_t b) -> int32_t {  // b != 0
    if (a == 0) return b;
    int64_t key = ((int64_t)a << 32) | (uint32_t)b;  // nonzero: a != 0
    bool created;
    int32_t* v = concat_memo.FindOrInsert(key, &created);
    if (!created) return *v;
    repo.Expand(b, &tmp_c);
    int32_t id = a;
    for (int32_t l : tmp_c) id = repo.Append(id, l);
    *v = id;
    return id;
  };

  // closure of the pre-closure subset in `members`/dense scratch:
  // apply each member's row (transitive, so one pass over the
  // pre-closure members is complete), or fall back to the dynamic
  // relaxation when rows are unavailable
  auto close_subset = [&](std::string* cerr) -> bool {
    if (!rows_ok) return closure(cerr);
    size_t m0 = members.size();
    for (size_t mi = 0; mi < m0; ++mi) {
      int32_t m = members[mi];
      float mw = st[m].w;
      int32_t mstr = st[m].str;
      for (int64_t ri = row_off[m]; ri < row_off[m + 1]; ++ri) {
        const RowEnt& r = rows_pool[ri];
        float w2 = Quantize((double)mw + r.dw);
        int32_t str2 = r.dstr ? concat_str(mstr, r.dstr) : mstr;
        int32_t u = r.t;
        bool take;
        if (st[u].epoch != epoch) {
          st[u].epoch = epoch;
          members.push_back(u);
          take = true;
        } else if (w2 < st[u].w) {
          take = true;
        } else if (w2 == st[u].w && str2 != st[u].str) {
          if (!allow_nonfunctional) {
            *cerr = kNonFunc;
            return false;
          }
          take = StringLess(repo, str2, st[u].str, &tmp_a, &tmp_b);
        } else {
          take = false;
        }
        if (take) {
          st[u].w = w2;
          st[u].str = str2;
        }
      }
    }
    return true;
  };

  // Normalize the subset in `members`/dense scratch (subtract min
  // weight, strip the common output prefix), intern it, and return the
  // det state id.  `*common_w` and `*prefix_id` receive the stripped
  // weight/prefix for the incoming arc.
  auto intern_subset = [&](float* common_w, int32_t* prefix_id) -> int64_t {
    ++DSTAT(interns);
    DSTAT(members_total) += (long long)members.size();
    float wmin = st[members[0]].w;
    for (int32_t m : members) wmin = std::min(wmin, st[m].w);
    int32_t p = st[members[0]].str;
    bool all_same = true;
    for (size_t i = 1; i < members.size(); ++i)
      if (st[members[i]].str != p) {
        all_same = false;
        break;
      }
    if (!all_same) {
      for (size_t i = 1; i < members.size() && p != 0; ++i)
        p = repo.Lcp(p, st[members[i]].str);
    }
    // canonical elements + commutative 128-bit hash — no sort needed
    // unless the subset turns out to be new
    norm_buf.clear();
    uint64_t h1 = 0, h2 = 0;
    for (int32_t m : members) {
      float wq = Quantize((double)st[m].w - wmin);
      int32_t str = all_same ? 0
                    : p == 0 ? st[m].str
                             : repo.StripPrefix(st[m].str, p, &tmp_c);
      uint32_t wb;
      std::memcpy(&wb, &wq, 4);
      uint64_t w0 = (uint64_t)(uint32_t)m;
      uint64_t w1 = ((uint64_t)wb << 32) | (uint32_t)str;
      uint64_t e = SubsetTable::SplitMix(w0 ^ SubsetTable::SplitMix(w1));
      h1 += e;
      h2 += SubsetTable::SplitMix(e ^ 0xA5A5A5A5A5A5A5A5ull);
      norm_buf.push_back(Element{m, wq, (int32_t)str});
    }
    int64_t id = table.Find(h1, h2, (int32_t)members.size());
    if (id < 0) {
      std::sort(norm_buf.begin(), norm_buf.end(),
                [](const Element& a, const Element& b) {
                  return a.state < b.state;
                });
      key_buf.clear();
      for (const Element& e : norm_buf) {
        uint32_t wb;
        std::memcpy(&wb, &e.w, 4);
        key_buf.push_back(e.state);
        key_buf.push_back(((int64_t)wb << 32) | (uint32_t)e.str);
      }
      id = (int64_t)det_final.size();
      add_state();
      int64_t off;
      table.Insert(h1, h2, (int32_t)members.size(), key_buf.data(),
                   (int32_t)key_buf.size(), id, &off);
      sub_span[id] = {off, (int32_t)key_buf.size()};
      work.push_back(id);
    }
    *common_w = wmin;
    *prefix_id = p;
    return id;
  };

  // Emit an output-label chain from `src`: first arc carries (ilabel, w),
  // subsequent labels ride input-epsilon arcs; the chain ends at `dst`.
  auto emit_chain = [&](int64_t src, int32_t ilabel, float w,
                        const std::vector<int32_t>& labels, int64_t dst) {
    int64_t cur = src;
    if (labels.empty()) {
      add_arc(cur, Arc{ilabel, 0, w, (int32_t)dst});
      return;
    }
    for (size_t i = 0; i < labels.size(); ++i) {
      bool last = i + 1 == labels.size();
      int64_t nxt = last ? dst : add_state();
      add_arc(cur, Arc{i == 0 ? ilabel : 0, labels[i],
                       i == 0 ? w : 0.0f, (int32_t)nxt});
      cur = nxt;
    }
  };

  int64_t det_start;
  // start subset
  {
    next_epoch();
    members.clear();
    int32_t s0 = (int32_t)in.start;
    st[s0].epoch = epoch;
    st[s0].w = 0.0f;
    st[s0].str = 0;
    members.push_back(s0);
    std::string cerr;
    if (!close_subset(&cerr)) {
      *err = cerr;
      return false;
    }
    float cw;
    int32_t prefix;
    int64_t id = intern_subset(&cw, &prefix);
    // A common weight/prefix on the start subset cannot be attached to an
    // incoming arc; re-add it via an auxiliary start state if nonzero.
    if (cw != 0.0f || prefix != 0) {
      int64_t real_start = add_state();
      repo.Expand(prefix, &chain_buf);
      emit_chain(real_start, 0, cw, chain_buf, id);
      det_start = real_start;
    } else {
      det_start = id;
    }
  }

  // label-bucketing scratch (stable counting sort by ilabel)
  std::vector<int32_t> lab_count(max_label + 1, 0);
  std::vector<int32_t> lab_pos(max_label + 1, 0);
  std::vector<int32_t> touched;
  struct GroupArc {
    int32_t elem;
    int64_t arc;
  };
  std::vector<GroupArc> grouped;
  std::vector<Element> cur_elems;

  while (!work.empty()) {
    int64_t id = work.front();
    work.pop_front();
    if ((int64_t)det_final.size() > max_states) {
      *err = "determinize-star exceeded max states (" +
             std::to_string(max_states) +
             "): input is likely not determinizable; add lexicon "
             "disambiguation symbols";
      return false;
    }
    // unpack the subset from the intern pool (sorted by state)
    {
      int64_t off = sub_span[id].first;
      int32_t len = sub_span[id].second;
      cur_elems.clear();
      const int64_t* p = table.Pool() + off;
      for (int32_t i = 0; i < len; i += 2) {
        Element e;
        e.state = (int32_t)p[i];
        uint32_t wb = (uint32_t)((uint64_t)p[i + 1] >> 32);
        std::memcpy(&e.w, &wb, 4);
        e.str = (int32_t)(uint32_t)((uint64_t)p[i + 1] & 0xffffffffu);
        cur_elems.push_back(e);
      }
    }

    // final handling
    float best_final = Fst::kInfinity;
    for (const Element& e : cur_elems) {
      float f = in.final_weight[e.state];
      if (f == Fst::kInfinity) continue;
      float total = Quantize((double)e.w + f);
      if (e.str == 0) {
        best_final = std::min(best_final, total);
      } else {
        if (superfinal < 0) {
          superfinal = add_state();
          det_final[superfinal] = 0.0f;
        }
        repo.Expand(e.str, &chain_buf);
        emit_chain(id, 0, total, chain_buf, superfinal);
      }
    }
    det_final[id] = best_final;

    // Bucket the subset's non-eps arcs by label: a stable counting sort
    // over (element index, arc index) gives the exact per-label visit
    // order of the old (label, elem, arc) comparison sort at
    // O(A + L log L) instead of O(A log A) over the full arc list.
    touched.clear();
    for (size_t ei = 0; ei < cur_elems.size(); ++ei) {
      int32_t s = cur_elems[ei].state;
      for (int64_t i = lab_off[s]; i < lab_off[s + 1]; ++i) {
        int32_t l = lab_arcs[i].ilabel;
        if (lab_count[l]++ == 0) touched.push_back(l);
      }
    }
    std::sort(touched.begin(), touched.end());
    int32_t run = 0;
    for (int32_t l : touched) {
      lab_pos[l] = run;
      run += lab_count[l];
    }
    grouped.resize(run);
    for (size_t ei = 0; ei < cur_elems.size(); ++ei) {
      int32_t s = cur_elems[ei].state;
      for (int64_t i = lab_off[s]; i < lab_off[s + 1]; ++i)
        grouped[lab_pos[lab_arcs[i].ilabel]++] = GroupArc{(int32_t)ei, i};
    }
    // lab_pos[l] now points one past the group's end; start = end-count.
    for (int32_t l : touched) {
      int32_t lo = lab_pos[l] - lab_count[l], hi = lab_pos[l];
      ++DSTAT(groups);
      DSTAT(group_arcs) += hi - lo;
      next_epoch();
      members.clear();
      for (int32_t k = lo; k < hi; ++k) {
        const Element& e = cur_elems[grouped[k].elem];
        const Arc& a = lab_arcs[grouped[k].arc];
        float w2 = Quantize((double)e.w + a.weight);
        int32_t str2 = a.olabel ? repo.Append(e.str, a.olabel) : e.str;
        int32_t t = a.nextstate;
        bool take;
        if (st[t].epoch != epoch) {
          st[t].epoch = epoch;
          members.push_back(t);
          take = true;
        } else if (w2 < st[t].w) {
          take = true;
        } else if (w2 == st[t].w && str2 != st[t].str) {
          if (!allow_nonfunctional) {
            *err = kNonFunc;
            return false;
          }
          take = StringLess(repo, str2, st[t].str, &tmp_a, &tmp_b);
        } else {
          take = false;
        }
        if (take) {
          st[t].w = w2;
          st[t].str = str2;
        }
      }
      std::string cerr;
      if (!close_subset(&cerr)) {
        *err = cerr;
        return false;
      }
      float cw;
      int32_t prefix;
      int64_t dst = intern_subset(&cw, &prefix);
      repo.Expand(prefix, &chain_buf);
      emit_chain(id, l, cw, chain_buf, dst);
      lab_count[l] = 0;  // reset scratch for the next subset
    }
  }

  // finish: stable counting sort of the flat (src, arc) pairs into CSR
  const int64_t n_det = (int64_t)det_final.size();
  out->start = det_start;
  out->final_weight = std::move(det_final);
  out->arc_offset.assign(n_det + 1, 0);
  for (int32_t s : arc_src) ++out->arc_offset[s + 1];
  for (int64_t s = 0; s < n_det; ++s)
    out->arc_offset[s + 1] += out->arc_offset[s];
  out->arcs.resize(arc_dat.size());
  {
    std::vector<int64_t> pos(out->arc_offset.begin(),
                             out->arc_offset.end() - 1);
    for (size_t i = 0; i < arc_dat.size(); ++i)
      out->arcs[pos[arc_src[i]]++] = arc_dat[i];
  }
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
