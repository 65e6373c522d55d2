// Native audio-input runtime: level/zero-cross trigger, head/tail margin
// segmenter, DC-offset removal and FIR decimation.
//
// Re-designed from the reference's C adin layer (libsent/src/adin/zc-e.c
// zero-cross counter, adin-cut.c margin logic, zmean.c DC removal,
// ds48to16.c polyphase decimator) as a small self-contained C++ core
// with a C ABI for ctypes.  Per-sample work belongs in native code —
// the Python fallback in frontend/stream.py is ~100x slower and exists
// for environments without a compiler.

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------
// zero-cross / level trigger (reference zc-e.c)
// ---------------------------------------------------------------------

struct ZeroCross {
  int level;
  int zc_thres;
  int win;            // window length in samples
  std::vector<int8_t> ring;
  int pos;
  int zc;
  int sign;
};

void *zc_create(int level, int zc_thres, int window_samples) {
  ZeroCross *z = new ZeroCross();
  z->level = level;
  z->zc_thres = zc_thres;
  z->win = window_samples;
  z->ring.assign(window_samples, 0);
  z->pos = 0;
  z->zc = 0;
  z->sign = 0;
  return z;
}

void zc_free(void *h) { delete static_cast<ZeroCross *>(h); }

void zc_reset(void *h) {
  ZeroCross *z = static_cast<ZeroCross *>(h);
  std::fill(z->ring.begin(), z->ring.end(), 0);
  z->pos = 0;
  z->zc = 0;
  z->sign = 0;
}

// feed samples; writes per-sample trigger flags (0/1) to out
void zc_feed(void *h, const float *s, int n, uint8_t *out) {
  ZeroCross *z = static_cast<ZeroCross *>(h);
  const int lv = z->level;
  for (int i = 0; i < n; i++) {
    int8_t mark = 0;
    const float x = s[i];
    if (x > lv && z->sign <= 0) {
      mark = 1;
      z->sign = 1;
    } else if (x < -lv && z->sign >= 0) {
      mark = -1;
      z->sign = -1;
    }
    const int8_t old = z->ring[z->pos];
    if (old != 0) z->zc--;
    if (mark != 0) z->zc++;
    z->ring[z->pos] = mark;
    z->pos++;
    if (z->pos >= z->win) z->pos = 0;
    out[i] = (z->zc >= z->zc_thres) ? 1 : 0;
  }
}

// ---------------------------------------------------------------------
// segmenter with head/tail margins (reference adin-cut.c adin_cut)
// event codes written to ev[]: 0 = silence, 1 = speech-start at this
// sample (head margin handled by caller via start_offset), 2 = in
// speech, 3 = speech-end at this sample
// ---------------------------------------------------------------------

struct Segmenter {
  void *zc;
  int head;           // head margin samples
  int tail;           // tail margin samples
  int in_speech;
  int silence_run;
};

void *seg_create(int level, int zc_thres, int window_samples,
                 int head_samples, int tail_samples) {
  Segmenter *g = new Segmenter();
  g->zc = zc_create(level, zc_thres, window_samples);
  g->head = head_samples;
  g->tail = tail_samples;
  g->in_speech = 0;
  g->silence_run = 0;
  return g;
}

void seg_free(void *h) {
  Segmenter *g = static_cast<Segmenter *>(h);
  zc_free(g->zc);
  delete g;
}

void seg_reset(void *h) {
  Segmenter *g = static_cast<Segmenter *>(h);
  zc_reset(g->zc);
  g->in_speech = 0;
  g->silence_run = 0;
}

void seg_feed(void *h, const float *s, int n, uint8_t *ev) {
  Segmenter *g = static_cast<Segmenter *>(h);
  std::vector<uint8_t> trig(n);
  zc_feed(g->zc, s, n, trig.data());
  for (int i = 0; i < n; i++) {
    if (!g->in_speech) {
      if (trig[i]) {
        ev[i] = 1;
        g->in_speech = 1;
        g->silence_run = 0;
      } else {
        ev[i] = 0;
      }
    } else {
      if (trig[i]) {
        g->silence_run = 0;
        ev[i] = 2;
      } else {
        g->silence_run++;
        if (g->silence_run >= g->tail) {
          ev[i] = 3;
          g->in_speech = 0;
          g->silence_run = 0;
        } else {
          ev[i] = 2;
        }
      }
    }
  }
}

// ---------------------------------------------------------------------
// DC offset removal (reference zmean.c: exponential running mean)
// ---------------------------------------------------------------------

struct ZMean {
  double mean;
  double weight;
  long long count;
};

void *zmean_create() {
  ZMean *m = new ZMean();
  m->mean = 0.0;
  m->weight = 0.0;
  m->count = 0;
  return m;
}

void zmean_free(void *h) { delete static_cast<ZMean *>(h); }

void zmean_feed(void *h, float *s, int n) {
  ZMean *m = static_cast<ZMean *>(h);
  // same semantics as the reference: estimate from a long running sum
  // with a cap so the mean can track slow drift
  const double CAP = 480000.0;   // ~30 s at 16 kHz
  for (int i = 0; i < n; i++) {
    m->mean = (m->mean * m->weight + s[i]) / (m->weight + 1.0);
    if (m->weight < CAP) m->weight += 1.0;
    s[i] -= (float)m->mean;
  }
}

// ---------------------------------------------------------------------
// FIR decimation by an integer factor (the 48->16 kHz role of
// ds48to16.c, generalised: caller supplies the low-pass taps)
// ---------------------------------------------------------------------

struct Decimator {
  std::vector<float> taps;
  std::vector<float> hist;
  int factor;
  int phase;
};

void *dec_create(const float *taps, int n_taps, int factor) {
  Decimator *d = new Decimator();
  d->taps.assign(taps, taps + n_taps);
  d->hist.assign(n_taps, 0.0f);
  d->factor = factor;
  d->phase = 0;
  return d;
}

void dec_free(void *h) { delete static_cast<Decimator *>(h); }

// returns number of output samples written
int dec_feed(void *h, const float *s, int n, float *out) {
  Decimator *d = static_cast<Decimator *>(h);
  const int nt = (int)d->taps.size();
  int m = 0;
  for (int i = 0; i < n; i++) {
    // shift history (small nt; adequate for a front-end)
    std::memmove(d->hist.data() + 1, d->hist.data(),
                 sizeof(float) * (nt - 1));
    d->hist[0] = s[i];
    if (++d->phase == d->factor) {
      d->phase = 0;
      float acc = 0.0f;
      const float *hp = d->hist.data();
      const float *tp = d->taps.data();
      for (int k = 0; k < nt; k++) acc += hp[k] * tp[k];
      out[m++] = acc;
    }
  }
  return m;
}

}  // extern "C"
