"""ntHash consistency tests — vectorized closed form vs the rolling
recurrence, mirroring nthash.rs:302-381 (recompute-from-scratch equals cycled
value at every position)."""

import numpy as np

from kmerutils_tpu.base import alphabet, nthash
from kmerutils_tpu.base.sequence import pack_ascii_reads

SEQ80 = ("TCAAAGGGAAACATTCAAAATCAGTATGCGCCCGTTCAGTTACGTATTGCTCTCGCT"
         "AATGAGATGGGCTGGGTACAGAG")

M64 = (1 << 64) - 1


def rotl(x, r):
    r %= 64
    return ((x << r) | (x >> (64 - r))) & M64 if r else x


def rotr(x, r):
    return rotl(x, 64 - (r % 64))


def codes_of(s):
    return alphabet.encode_2b(np.frombuffer(s.encode(), dtype=np.uint8))


def rolling_fhash(codes, k):
    """The reference recurrence (nthash_cycle, nthash.rs:172-176)."""
    seeds = [int(nthash.SEEDS_2B[c]) for c in codes]
    h = 0
    for i in range(k):
        h ^= rotl(seeds[i], k - 1 - i)
    out = [h]
    for p in range(1, len(codes) - k + 1):
        h = rotl(h, 1) ^ rotl(seeds[p - 1], k) ^ seeds[p + k - 1]
        out.append(h)
    return out


def rolling_rhash(codes, k):
    """nthash_rcomp_cycle (nthash.rs:198-202)."""
    cseeds = [int(nthash.CSEEDS_2B[c]) for c in codes]
    h = 0
    for i in range(k):
        h ^= rotl(cseeds[i], i)
    out = [h]
    for p in range(1, len(codes) - k + 1):
        h = rotr(h, 1) ^ rotr(cseeds[p - 1], 1) ^ rotl(cseeds[p + k - 1], k - 1)
        out.append(h)
    return out


class TestNtHash:
    def test_init_matches_rolling(self):
        codes = codes_of(SEQ80)
        for k in (4, 16, 31):
            assert nthash.nthash_init_ref(codes[:k]) == rolling_fhash(codes[:k], k)[0]
            assert nthash.nthash_rcomp_init_ref(codes[:k]) == rolling_rhash(codes[:k], k)[0]

    def test_vectorized_matches_rolling(self):
        batch = pack_ascii_reads([SEQ80])
        codes = codes_of(SEQ80)
        for k in (5, 16, 27):
            fh, rh, can, strand, valid = nthash.nthash_kmers(batch, k)
            fh, rh = np.asarray(fh)[0], np.asarray(rh)[0]
            want_f = rolling_fhash(codes, k)
            want_r = rolling_rhash(codes, k)
            n = len(SEQ80) - k + 1
            assert [int(x) for x in fh[:n]] == want_f
            assert [int(x) for x in rh[:n]] == want_r
            can, strand = np.asarray(can)[0], np.asarray(strand)[0]
            for p in range(n):
                assert int(can[p]) == min(want_f[p], want_r[p])
                assert int(strand[p]) == (1 if want_r[p] < want_f[p] else 0)

    def test_rhash_is_fhash_of_revcomp(self):
        """rhash(kmer) must equal fhash(revcomp(kmer)) — the defining property."""
        codes = codes_of(SEQ80)
        k = 13
        for p in (0, 7, 33):
            km = codes[p : p + k]
            rc = (3 - km)[::-1]
            assert nthash.nthash_rcomp_init_ref(km) == nthash.nthash_init_ref(rc)

    def test_multi_hash(self):
        batch = pack_ascii_reads([SEQ80])
        k, nb = 9, 5
        _, _, can, _, _ = nthash.nthash_kmers(batch, k)
        mh = np.asarray(nthash.multi_hash(can, k, nb))
        assert mh.shape == (1, len(SEQ80) - 15, nb) or mh.shape[-1] == nb
        # golden recompute of the derivation (nthash.rs:63-72)
        h0 = int(np.asarray(can)[0, 0])
        for i in range(1, nb):
            tmp = (h0 * ((i ^ (k * int(nthash.MULTISEED))) & M64)) & M64
            tmp ^= tmp >> 27
            assert int(mh[0, 0, i]) == tmp
        assert int(mh[0, 0, 0]) == h0
