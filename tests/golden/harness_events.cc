// Golden-fixture harness: runs the REFERENCE event detector (event.h)
// on a raw f32 signal read from a file, dumps events as text.
#include <cstdio>
#include <cstdlib>
#include <vector>
#include "event.h"
using namespace sigmap;

int main(int argc, char** argv) {
  FILE* f = fopen(argv[1], "rb");
  fseek(f, 0, SEEK_END); long n = ftell(f) / 4; fseek(f, 0, SEEK_SET);
  std::vector<float> sig(n);
  if (fread(sig.data(), 4, n, f) != (size_t)n) return 1;
  fclose(f);
  DetectorArgs ed = event_detection_defaults;
  std::vector<float> ps, pss, t1, t2;
  std::vector<size_t> peaks;
  std::vector<Event> events;
  DetectEvents(sig.data(), n, ed, ps, pss, t1, t2, peaks, events);
  printf("%zu\n", events.size());
  for (auto &e : events)
    printf("%llu %llu %.7g %.7g\n",
           (unsigned long long)e.start, (unsigned long long)e.length,
           e.mean, e.stdv);
  return 0;
}
