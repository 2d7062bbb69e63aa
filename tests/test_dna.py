import numpy as np

from tpumap.utils import dna


def test_encode_decode_roundtrip():
    s = "ACGTNacgtnACGT"
    codes, nmask = dna.encode(s)
    assert codes.tolist() == [0, 1, 2, 3, 0, 0, 1, 2, 3, 0, 0, 1, 2, 3]
    assert nmask.tolist() == [False] * 4 + [True] + [False] * 4 + [True] + [False] * 4
    assert dna.decode(codes, nmask) == "ACGTNACGTNACGT"


def test_revcomp():
    assert dna.revcomp("ACGT") == "ACGT"
    assert dna.revcomp("AACGTT") == "AACGTT"
    assert dna.revcomp("AAAC") == "GTTT"
    assert dna.revcomp("ANC") == "GNT"


def test_pack_unpack_2bit():
    rng = np.random.default_rng(0)
    for L in [1, 15, 16, 17, 33, 100]:
        codes = rng.integers(0, 4, L).astype(np.uint8)
        words = dna.pack_2bit(codes)
        assert words.dtype == np.uint32
        out = dna.unpack_2bit(words, L)
        np.testing.assert_array_equal(out, codes)


def test_pack_bits():
    mask = np.zeros(40, dtype=bool)
    mask[[0, 5, 31, 32, 39]] = True
    words = dna.pack_bits(mask)
    assert words[0] == (1 | (1 << 5) | (1 << 31))
    assert words[1] == (1 | (1 << 7))


def test_kmer_codes():
    codes, _ = dna.encode("ACGTA")
    kmers = dna.kmer_codes(codes, 3)
    # ACG = 0*16+1*4+2 = 6; CGT = 1*16+2*4+3 = 27; GTA = 2*16+3*4+0 = 44
    assert kmers.tolist() == [6, 27, 44]
