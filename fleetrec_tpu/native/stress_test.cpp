// TSAN/stress driver for the ingest ring: 3 senders x many batches over
// localhost, small slots, consumer validating per-sender fill patterns.
// Build: make stress && ./stress_test   (or make stress_tsan)
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {
void* ing_create(int, const long*, int, int);
int ing_listen(void*);
void ing_start(void*);
int ing_acquire(void*, int);
float* ing_slot_data(void*, int);
void ing_release(void*, int);
long ing_total_batches(void*);
void ing_destroy(void*);
long loadgen_run(const char*, int, long, long, float);
}

int main() {
  const int SENDERS = 3, SLOTS = 2, PORT = 19080;
  const long NB = 500;
  long bytes[SENDERS] = {256, 1024, 512};
  void* h = ing_create(SENDERS, bytes, SLOTS, PORT);
  if (ing_listen(h) != 0) {
    fprintf(stderr, "listen failed\n");
    return 1;
  }
  ing_start(h);
  std::vector<std::thread> senders;
  for (int s = 0; s < SENDERS; ++s) {
    senders.emplace_back([=] {
      long r = loadgen_run("127.0.0.1", PORT + s, bytes[s], NB, (float)(s + 1));
      if (r != NB) fprintf(stderr, "sender %d failed: %ld\n", s, r);
    });
  }
  long total_floats = (bytes[0] + bytes[1] + bytes[2]) / 4;
  for (long b = 0; b < NB; ++b) {
    int slot = ing_acquire(h, 10000);
    if (slot < 0) {
      fprintf(stderr, "acquire failed at %ld: %d\n", b, slot);
      return 1;
    }
    float* d = ing_slot_data(h, slot);
    long off = 0;
    for (int s = 0; s < SENDERS; ++s) {
      for (long i = 0; i < bytes[s] / 4; ++i) {
        if (d[off + i] != (float)(s + 1)) {
          fprintf(stderr, "batch %ld sender %d corrupt at %ld: %f\n", b, s, i,
                  d[off + i]);
          return 1;
        }
      }
      off += bytes[s] / 4;
    }
    ing_release(h, slot);
  }
  for (auto& t : senders) t.join();
  long tb = ing_total_batches(h);
  ing_destroy(h);
  printf("stress OK: %ld batches\n", tb);
  return 0;
}
