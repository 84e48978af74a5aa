// Standalone determinize-star profiling harness: load an LG dumped by
// tools/dump_lg.py, run DeterminizeStar (+optionally minimize), print
// wall times.  Build: make detprof   Run: ./detprof /tmp/lg_v5000.fst
#include <chrono>
#include <ctime>
#include <cstdio>
#include <cstdlib>
#include <string>

#include "fst.h"

#ifdef DETSTATS
namespace ctc_native {
struct DetStats {
  long long append, strip, strip_hit, group_arcs, groups, members_total,
      closure_pops, closure_relax, lcp_steps, interns;
};
extern DetStats g_detstats;
}
#endif

using namespace ctc_native;
using Clock = std::chrono::steady_clock;

static double secs(Clock::time_point a, Clock::time_point b) {
  return std::chrono::duration<double>(b - a).count();
}

static double cpu_secs() {
  timespec ts;
  clock_gettime(CLOCK_PROCESS_CPUTIME_ID, &ts);
  return ts.tv_sec + 1e-9 * ts.tv_nsec;
}

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: detprof LG.fst [--minimize]\n");
    return 2;
  }
  Fst lg;
  std::string err;
  if (!ReadVectorFst(argv[1], &lg, &err)) {
    std::fprintf(stderr, "load: %s\n", err.c_str());
    return 1;
  }
  std::printf("LG: states=%lld arcs=%lld\n",
              (long long)lg.NumStates(), (long long)lg.NumArcs());
  auto t0 = Clock::now();
  double c0 = cpu_secs();
  Fst det;
  if (!DeterminizeStar(lg, &det, &err, 200 * 1000 * 1000)) {
    std::fprintf(stderr, "determinize: %s\n", err.c_str());
    return 1;
  }
  auto t1 = Clock::now();
  std::printf("det: states=%lld arcs=%lld  %.2f s wall, %.2f s cpu\n",
              (long long)det.NumStates(), (long long)det.NumArcs(),
              secs(t0, t1), cpu_secs() - c0);
#ifdef DETSTATS
  const auto& st = g_detstats;
  std::printf("stats: append=%lld strip=%lld(hit %lld) groups=%lld "
              "group_arcs=%lld interns=%lld members=%lld "
              "closure_pops=%lld closure_relax=%lld\n",
              st.append, st.strip, st.strip_hit, st.groups, st.group_arcs,
              st.interns, st.members_total, st.closure_pops,
              st.closure_relax);
#endif
  if (argc > 2 && std::string(argv[2]) == "--minimize") {
    auto t2 = Clock::now();
    Fst mn = MinimizeEncoded(det);
    auto t3 = Clock::now();
    std::printf("min: states=%lld arcs=%lld  %.2f s\n",
                (long long)mn.NumStates(), (long long)mn.NumArcs(),
                secs(t2, t3));
  }
  return 0;
}
