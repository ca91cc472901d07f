// wavio — fast WAV decode + mono mixdown + resample for dataset preparation.
//
// The offline feature pipeline walks tens of thousands of utterance wavs
// (IEMOCAP ~10k, RAVDESS ~7k); Python-side decoding dominates prep time.
// This library does RIFF parse → PCM decode → mono mixdown → anti-aliased
// linear resample in one pass, and releases the GIL via ctypes.
//
// API (C, ctypes-friendly):
//   long wav_read(const char* path, int target_sr, float* out, long out_cap)
//     out == NULL      → return the number of samples the decode would yield
//     out != NULL      → decode into out (≤ out_cap), return samples written
//     returns < 0 on error (see WAVIO_E*)
//
// Supports PCM 8/16/24/32-bit and IEEE float32/64, any channel count.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

enum {
  WAVIO_EOPEN = -1,
  WAVIO_EFORMAT = -2,
  WAVIO_EDATA = -3,
  WAVIO_ECAP = -4,
};

struct Fmt {
  uint16_t format = 0;
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
};

static bool read_exact(FILE* f, void* dst, size_t n) {
  return fread(dst, 1, n, f) == n;
}

// Decode the data chunk into mono float32 at the file's native rate.
static long decode_mono(FILE* f, const Fmt& fmt, uint32_t data_bytes,
                        std::vector<float>& mono) {
  const int ch = fmt.channels;
  const int bytes_per = fmt.bits / 8;
  if (ch <= 0 || bytes_per <= 0) return WAVIO_EFORMAT;
  const long n_frames = (long)(data_bytes / (bytes_per * ch));
  mono.resize(n_frames);

  std::vector<uint8_t> buf((size_t)bytes_per * ch * 4096);
  long frame = 0;
  while (frame < n_frames) {
    long take = std::min<long>(4096, n_frames - frame);
    if (!read_exact(f, buf.data(), (size_t)take * bytes_per * ch))
      return WAVIO_EDATA;
    for (long i = 0; i < take; i++) {
      double acc = 0.0;
      for (int c = 0; c < ch; c++) {
        const uint8_t* p = buf.data() + ((size_t)i * ch + c) * bytes_per;
        double v = 0.0;
        if (fmt.format == 1) {  // PCM
          switch (fmt.bits) {
            case 8:  v = ((int)p[0] - 128) / 128.0; break;
            case 16: v = (int16_t)(p[0] | (p[1] << 8)) / 32768.0; break;
            case 24: {
              int32_t s = (p[0] << 8) | (p[1] << 16) | ((int32_t)p[2] << 24);
              v = (s >> 8) / 8388608.0;
              break;
            }
            case 32: {
              int32_t s;
              memcpy(&s, p, 4);
              v = s / 2147483648.0;
              break;
            }
            default: return WAVIO_EFORMAT;
          }
        } else if (fmt.format == 3) {  // IEEE float
          if (fmt.bits == 32) {
            float s;
            memcpy(&s, p, 4);
            v = s;
          } else if (fmt.bits == 64) {
            double s;
            memcpy(&s, p, 8);
            v = s;
          } else {
            return WAVIO_EFORMAT;
          }
        } else {
          return WAVIO_EFORMAT;
        }
        acc += v;
      }
      mono[frame + i] = (float)(acc / ch);
    }
    frame += take;
  }
  return n_frames;
}

// Anti-aliased resample: windowed-sinc low-pass (when downsampling) +
// linear interpolation. Adequate for speech-feature extraction.
static void resample(const std::vector<float>& in, uint32_t sr_in,
                     int sr_out, std::vector<float>& out) {
  if ((int)sr_in == sr_out || in.empty()) {
    out = in;
    return;
  }
  const std::vector<float>* src = &in;
  std::vector<float> filtered;
  if (sr_out < (int)sr_in) {
    // 33-tap Hamming-windowed sinc at cutoff = 0.45 * sr_out.
    const int taps = 33, half = taps / 2;
    const double fc = 0.45 * sr_out / sr_in;  // normalized to sr_in
    double h[taps], sum = 0.0;
    for (int i = 0; i < taps; i++) {
      int k = i - half;
      double s = (k == 0) ? 2.0 * fc
                          : sin(2.0 * M_PI * fc * k) / (M_PI * k);
      double w = 0.54 - 0.46 * cos(2.0 * M_PI * i / (taps - 1));
      h[i] = s * w;
      sum += h[i];
    }
    for (int i = 0; i < taps; i++) h[i] /= sum;
    filtered.resize(in.size());
    const long n = (long)in.size();
    for (long t = 0; t < n; t++) {
      double acc = 0.0;
      for (int i = 0; i < taps; i++) {
        long idx = t + i - half;
        if (idx < 0) idx = 0;
        if (idx >= n) idx = n - 1;
        acc += h[i] * in[(size_t)idx];
      }
      filtered[(size_t)t] = (float)acc;
    }
    src = &filtered;
  }
  const double ratio = (double)sr_in / sr_out;
  const long n_out = (long)((double)src->size() / ratio);
  out.resize(n_out);
  for (long t = 0; t < n_out; t++) {
    double pos = t * ratio;
    long i0 = (long)pos;
    long i1 = std::min<long>(i0 + 1, (long)src->size() - 1);
    double frac = pos - i0;
    out[(size_t)t] =
        (float)((1.0 - frac) * (*src)[(size_t)i0] + frac * (*src)[(size_t)i1]);
  }
}

static long wav_read_impl(const char* path, int target_sr, float* out,
                          long out_cap) {
  FILE* f = fopen(path, "rb");
  if (!f) return WAVIO_EOPEN;

  char riff[4], wave[4];
  uint32_t riff_size;
  if (!read_exact(f, riff, 4) || !read_exact(f, &riff_size, 4) ||
      !read_exact(f, wave, 4) || memcmp(riff, "RIFF", 4) ||
      memcmp(wave, "WAVE", 4)) {
    fclose(f);
    return WAVIO_EFORMAT;
  }

  Fmt fmt;
  std::vector<float> mono;
  long decoded = WAVIO_EDATA;
  char id[4];
  uint32_t size;
  while (read_exact(f, id, 4) && read_exact(f, &size, 4)) {
    if (!memcmp(id, "fmt ", 4)) {
      uint8_t hdr[16];
      if (size < 16 || !read_exact(f, hdr, 16)) {
        fclose(f);
        return WAVIO_EFORMAT;
      }
      memcpy(&fmt.format, hdr + 0, 2);
      memcpy(&fmt.channels, hdr + 2, 2);
      memcpy(&fmt.sample_rate, hdr + 4, 4);
      memcpy(&fmt.bits, hdr + 14, 2);
      if (fmt.format == 0xFFFE) {
        // WAVE_FORMAT_EXTENSIBLE: the real format is the first two bytes of
        // the SubFormat GUID at chunk offset 24 (PCM=1, IEEE float=3).
        uint8_t ext[24];
        if (size < 40 || !read_exact(f, ext, 24)) {
          fclose(f);
          return WAVIO_EFORMAT;
        }
        memcpy(&fmt.format, ext + 8, 2);
        if (size > 40) fseek(f, size - 40, SEEK_CUR);
      } else if (size > 16) {
        fseek(f, size - 16, SEEK_CUR);
      }
    } else if (!memcmp(id, "data", 4)) {
      if (fmt.sample_rate == 0) {
        fclose(f);
        return WAVIO_EFORMAT;
      }
      // Bound a corrupt chunk size by the bytes actually left in the file so
      // decode_mono can't be asked for a multi-GB allocation.
      long pos = ftell(f);
      fseek(f, 0, SEEK_END);
      long remaining = ftell(f) - pos;
      fseek(f, pos, SEEK_SET);
      if (remaining < 0) remaining = 0;
      if ((long)size > remaining) size = (uint32_t)remaining;
      decoded = decode_mono(f, fmt, size, mono);
      break;
    } else {
      fseek(f, size + (size & 1), SEEK_CUR);
    }
  }
  fclose(f);
  if (decoded < 0) return decoded;

  std::vector<float> res;
  resample(mono, fmt.sample_rate, target_sr, res);
  if (out == nullptr) return (long)res.size();
  if ((long)res.size() > out_cap) return WAVIO_ECAP;
  memcpy(out, res.data(), res.size() * sizeof(float));
  return (long)res.size();
}

long wav_read(const char* path, int target_sr, float* out, long out_cap) {
  // No exception may cross the extern "C"/ctypes boundary (bad_alloc on a
  // corrupt header would otherwise terminate the host process).
  try {
    return wav_read_impl(path, target_sr, out, out_cap);
  } catch (...) {
    return WAVIO_EFORMAT;
  }
}

}  // extern "C"
