// Native wavelet-matrix builder for the quality store.
//
// Role twin of the reference's `wavelet-matrix` crate dependency
// (/root/reference/src/quality/quality.rs:74-122 builds one WaveletMatrix
// per read); here one call builds the level bit-vectors + rank directories
// for the whole file's concatenated 3-bit symbols, in the exact layout
// kmerutils_tpu.quality.WaveletMatrix/_BitVecRank use:
//
//   level d (d = 0 .. bit_len-1, processing bit (bit_len-1-d)):
//     words: u64[nw]        LSB-first packed bits, nw = ceil(n/64), zero pad
//     sub:   u16[nw]        ones-prefix within the 8-word (512-bit) superblock
//     sup:   u32[nsup+1]    cumulative ones per superblock, nsup = ceil(nw/8)
//     zeros: i64            count of zero bits at this level
//   between levels the symbol array is stably partitioned: zeros first.
//
// Single sequential pass per level (pack+directories, then partition):
// ~9 linear passes total for bit_len=3 — memory-bandwidth bound, which is
// the point (the numpy build's boolean fancy-indexing ran at ~7 Msym/s).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

long ktp_wavelet_build(const uint8_t *vals, long n, int bit_len,
                       uint64_t *words, uint16_t *sub, uint32_t *sup,
                       int64_t *zeros) {
  if (n < 0 || bit_len <= 0 || bit_len > 8) return -1;
  const long nw = (n + 63) / 64;
  const long nsup = (nw + 7) / 8;

  std::vector<uint8_t> buf_a(vals, vals + n), buf_b(n);
  uint8_t *cur = buf_a.data(), *nxt = buf_b.data();

  for (int d = 0; d < bit_len; ++d) {
    const int lvl = bit_len - 1 - d;
    uint64_t *W = words + (long)d * nw;
    uint16_t *SB = sub + (long)d * nw;
    uint32_t *SP = sup + (long)d * (nsup + 1);

    // pack bits + build both rank directories in one pass
    SP[0] = 0;
    uint64_t cum = 0;      // ones before current superblock
    uint32_t within = 0;   // ones within current superblock, before word w
    long i = 0;
    for (long w = 0; w < nw; ++w) {
      if ((w & 7) == 0) within = 0;
      uint64_t word = 0;
      const long lim = (i + 64 <= n) ? 64 : (n - i);
      for (long j = 0; j < lim; ++j, ++i)
        word |= (uint64_t)((cur[i] >> lvl) & 1) << j;
      W[w] = word;
      SB[w] = (uint16_t)within;
      within += (uint32_t)__builtin_popcountll(word);
      if ((w & 7) == 7 || w == nw - 1) {
        cum += within;
        SP[(w >> 3) + 1] = (uint32_t)cum;
      }
    }
    // superblocks made only of pad words (none for w<=nw-1) can't occur,
    // but keep the [0] convention for nw == 0
    if (nw == 0) SP[0] = 0;
    const long ones = (long)cum;
    zeros[d] = n - ones;

    if (d == bit_len - 1) break;  // last level: no further partition
    // stable partition: zeros first, ones after
    long z = 0, o = n - ones;
    for (long k = 0; k < n; ++k) {
      const uint8_t v = cur[k];
      const int b = (v >> lvl) & 1;
      nxt[b ? o : z] = v;
      o += b;
      z += 1 - b;
    }
    uint8_t *tmp = cur;
    cur = nxt;
    nxt = tmp;
  }
  return 0;
}

}  // extern "C"
