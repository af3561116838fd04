// Golden-fixture harness: builds the REFERENCE SpatialIndex (nanoflann
// k-d tree) over synthetic z-scored signals read from f32 files, then
// runs GenerateChains on a query feature signal and dumps chains.
// Inputs: ref_pos.f32 ref_neg.f32 query.f32   (raw f32 arrays)
// Output: per chain: direction refidx score n_anchors start end mapq,
// then each anchor (tpos qpos dist).
#include <cstdio>
#include <cstdlib>
#include <vector>
#include "spatial_index.h"
using namespace sigmap;

static std::vector<float> load(const char* p) {
  FILE* f = fopen(p, "rb");
  fseek(f, 0, SEEK_END); long n = ftell(f) / 4; fseek(f, 0, SEEK_SET);
  std::vector<float> v(n);
  if (fread(v.data(), 4, n, f) != (size_t)n) exit(1);
  fclose(f);
  return v;
}

int main(int argc, char** argv) {
  std::vector<float> pos = load(argv[1]);
  std::vector<float> neg = load(argv[2]);
  std::vector<float> query = load(argv[3]);
  float radius = atof(argv[4]);
  int step = atoi(argv[5]);
  int dim = 6, max_leaf = 20;
  SpatialIndex index(dim, max_leaf, 1, "/tmp/goldens/idx");
  std::vector<std::vector<bool> > pmask(1), nmask(1);
  pmask[0].assign(pos.size(), false);
  nmask[0].assign(neg.size(), false);
  std::vector<std::vector<float> > psig(1, pos), nsig(1, neg);
  index.Construct(1, pmask, nmask, psig, nsig);
  std::vector<float> stdvs(query.size(), 1.0f);
  std::vector<SignalAnchorChain> chains;
  index.GenerateChains(query, stdvs, 0, step, radius, 1, chains);
  printf("%zu\n", chains.size());
  for (auto &c : chains) {
    printf("C %d %u %.6g %u %lu %lu %d %zu\n", (int)c.direction,
           c.reference_sequence_index, c.score, c.num_anchors,
           (unsigned long)c.start_position, (unsigned long)c.end_position,
           c.mapq, c.anchors.size());
    for (auto &a : c.anchors)
      printf("A %lu %lu %.7g\n", (unsigned long)a.target_position,
             (unsigned long)a.query_position, a.distance);
  }
  return 0;
}
