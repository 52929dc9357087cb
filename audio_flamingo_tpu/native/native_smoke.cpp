// Sanitizer smoke test for the native components: exercises WAV decode, the resampler,
// and the BPE engine under ASan/UBSan (built via CMakeLists.txt with AF_SANITIZE=ON).

#include <cassert>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
int af_decode_wav(const uint8_t* data, uint64_t len, float** out, uint64_t* out_len,
                  int* sample_rate);
int af_resample(const float* in, uint64_t n_in, int sr_in, int sr_out, int zeros,
                double beta, float** out, uint64_t* n_out);
void af_free(void* p);
void* af_bpe_new(const char* vocab_data, uint64_t vocab_len, const char* merges_data,
                 uint64_t merges_len);
void af_bpe_free(void* handle);
int64_t af_bpe_encode(void* handle, const char* pretoken, uint64_t len, int32_t* out,
                      uint64_t out_cap);
}

static void wr_u32(std::vector<uint8_t>& v, uint32_t x) {
  v.push_back(x & 0xFF);
  v.push_back((x >> 8) & 0xFF);
  v.push_back((x >> 16) & 0xFF);
  v.push_back((x >> 24) & 0xFF);
}
static void wr_u16(std::vector<uint8_t>& v, uint16_t x) {
  v.push_back(x & 0xFF);
  v.push_back((x >> 8) & 0xFF);
}

int main() {
  // --- WAV decode: 1000 samples of PCM16 mono 16 kHz
  const int n = 1000;
  std::vector<uint8_t> wav;
  wav.insert(wav.end(), {'R', 'I', 'F', 'F'});
  wr_u32(wav, 36 + n * 2);
  wav.insert(wav.end(), {'W', 'A', 'V', 'E', 'f', 'm', 't', ' '});
  wr_u32(wav, 16);
  wr_u16(wav, 1);        // PCM
  wr_u16(wav, 1);        // mono
  wr_u32(wav, 16000);    // sr
  wr_u32(wav, 32000);    // byte rate
  wr_u16(wav, 2);        // block align
  wr_u16(wav, 16);       // bits
  wav.insert(wav.end(), {'d', 'a', 't', 'a'});
  wr_u32(wav, n * 2);
  for (int i = 0; i < n; ++i) wr_u16(wav, (uint16_t)(int16_t)(i * 13 % 4096 - 2048));

  float* pcm = nullptr;
  uint64_t pcm_n = 0;
  int sr = 0;
  int rc = af_decode_wav(wav.data(), wav.size(), &pcm, &pcm_n, &sr);
  assert(rc == 0 && pcm_n == (uint64_t)n && sr == 16000);

  // --- resample 16k -> 48k -> check length
  float* up = nullptr;
  uint64_t up_n = 0;
  rc = af_resample(pcm, pcm_n, 16000, 48000, 16, 8.555, &up, &up_n);
  assert(rc == 0 && up_n == 3 * pcm_n);
  af_free(pcm);
  af_free(up);

  // --- truncated/garbage WAV must fail cleanly (no OOB reads under ASan)
  rc = af_decode_wav(wav.data(), 20, &pcm, &pcm_n, &sr);
  assert(rc != 0);
  std::vector<uint8_t> garbage(64, 0xAB);
  rc = af_decode_wav(garbage.data(), garbage.size(), &pcm, &pcm_n, &sr);
  assert(rc != 0);

  // --- BPE
  std::string vocab = "a\nb\nc\nab\nabc";
  std::string merges = "a b\nab c";
  void* bpe = af_bpe_new(vocab.data(), vocab.size(), merges.data(), merges.size());
  assert(bpe);
  int32_t ids[16];
  int64_t m = af_bpe_encode(bpe, "abc", 3, ids, 16);
  assert(m == 1 && ids[0] == 4);  // "abc" fully merged
  m = af_bpe_encode(bpe, "abab", 4, ids, 16);
  assert(m == 2 && ids[0] == 3 && ids[1] == 3);
  m = af_bpe_encode(bpe, "zzz", 3, ids, 16);  // unknown pieces -> -1, no crash
  assert(m == -1);
  af_bpe_free(bpe);

  printf("native_smoke: OK\n");
  return 0;
}
