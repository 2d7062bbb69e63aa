import numpy as np
import pytest

import jax.numpy as jnp

from tpumap.index import build_db
from tpumap.index.device import DeviceIndex
from tpumap.ops import pack, seed, verify
from tpumap.utils import dna


@pytest.fixture(scope="module")
def small_db(tmp_path_factory):
    rng = np.random.default_rng(7)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 3000))
    seq = seq[:500] + "NNN" + seq[503:]
    fa = tmp_path_factory.mktemp("db") / "g.fa"
    fa.write_text(">chr1\n" + seq + "\n")
    db = build_db(fa, name="g", k=8, interval=1)
    return db, seq


def batch_from_seqs(seqs, L=None):
    L = L or max(len(s) for s in seqs)
    B = len(seqs)
    codes = np.zeros((B, L), dtype=np.uint8)
    nmask = np.zeros((B, L), dtype=bool)
    lengths = np.zeros(B, dtype=np.int32)
    for i, s in enumerate(seqs):
        c, m = dna.encode(s)
        codes[i, :len(s)] = c
        nmask[i, :len(s)] = m
        lengths[i] = len(s)
    return jnp.array(codes), jnp.array(nmask), jnp.array(lengths)


def test_pack_reads_matches_host():
    seqs = ["ACGTACGTACGTACGTA", "TTT"]
    codes, nmask, lengths = batch_from_seqs(seqs)
    packed = np.asarray(pack.pack_reads(codes))
    for i, s in enumerate(seqs):
        c, _ = dna.encode(s)
        host = dna.pack_2bit(np.concatenate([c, np.zeros(17 - len(c), np.uint8)]))
        np.testing.assert_array_equal(packed[i][:len(host)], host)


def test_revcomp_codes_batch():
    seqs = ["AACGTT", "AAAC"]
    codes, nmask, lengths = batch_from_seqs(seqs)
    rc = np.asarray(pack.revcomp_codes(codes, lengths))
    assert dna.decode(rc[0][:6]) == "AACGTT"
    assert dna.decode(rc[1][:4]) == "GTTT"
    assert rc[1][4:].tolist() == [0, 0]


def test_query_oligos():
    seqs = ["ACGTANC"]
    codes, nmask, lengths = batch_from_seqs(seqs)
    oligos, valid = seed.query_oligos(codes, nmask, lengths, 3)
    # ACG CGT GTA TAN ANC
    expect = [0 * 16 + 1 * 4 + 2, 1 * 16 + 2 * 4 + 3, 2 * 16 + 3 * 4 + 0]
    assert np.asarray(oligos)[0, :3].tolist() == expect
    assert np.asarray(valid)[0].tolist() == [True, True, True, False, False]


def test_extract_packed_window(small_db):
    db, seq = small_db
    idx = DeviceIndex.from_host(db)
    starts = jnp.array([0, 1, 15, 16, 17, 1000], dtype=jnp.uint32)
    win = np.asarray(verify.extract_packed_window(idx.genome_packed, starts, 4))
    for i, s in enumerate([0, 1, 15, 16, 17, 1000]):
        expect = dna.pack_2bit(db.get_codes(s, 64))
        np.testing.assert_array_equal(win[i], expect, err_msg=f"start={s}")


def test_extract_wide_window_no_clamp(small_db):
    """Regression (round 3): lax.dynamic_slice silently clamps the start
    index when start + nwords + 1 exceeds the padded genome, shifting the
    whole window to wrong coordinates.  GMAP's region buckets (Rp up to
    hundreds of kbp) exceed the fixed DeviceIndex pad on small genomes, so
    mid-genome fetches returned wrong bases and db-mode emitted nothing.
    Every in-genome base of a fetched window must be exact regardless of
    (genome size, window bucket)."""
    db, seq = small_db
    idx = DeviceIndex.from_host(db)
    glen = len(seq)
    truth, _ = dna.encode(seq)
    truth[500:503] = 0          # Ns encode as code 0 in get_codes
    # window widths spanning: take path (<16 words), dynamic-slice path
    # within SAFE_PAD_WORDS, and GMAP bucket sizes far beyond the pad
    for L in (64, 1024, 65536, 262144):
        starts = np.array([0, 1, 17, glen // 2, glen - 40], dtype=np.uint32)
        win = np.asarray(verify.extract_codes_window(
            idx.genome_packed, jnp.asarray(starts), L))
        for i, s in enumerate(starts.tolist()):
            n = min(L, glen - s)
            np.testing.assert_array_equal(
                win[i, :n], truth[s:s + n],
                err_msg=f"L={L} start={s}: window shifted/clamped")


def test_extract_bit_window(small_db):
    db, seq = small_db
    idx = DeviceIndex.from_host(db)
    # Ns at univcoords 500..502
    starts = jnp.array([480, 495, 500, 501], dtype=jnp.uint32)
    win = np.asarray(verify.extract_bit_window(idx.genome_nmask, starts, 4))
    for i, s in enumerate([480, 495, 500, 501]):
        flags = db.get_nmask(s, 64).astype(bool)
        got = np.zeros(64, dtype=bool)
        for w in range(4):
            for j in range(16):
                got[w * 16 + j] = (win[i, w] >> (2 * j)) & 1
        np.testing.assert_array_equal(got, flags, err_msg=f"start={s}")


def test_verify_diagonals_counts(small_db):
    db, seq = small_db
    idx = DeviceIndex.from_host(db)
    # read = genome[1000:1100] with substitutions at 10 and 50
    s = list(seq[1000:1100])
    s[10] = "ACGT"[("ACGT".index(s[10]) + 1) % 4]
    s[50] = "ACGT"[("ACGT".index(s[50]) + 2) % 4]
    read = "".join(s)
    codes, nmask, lengths = batch_from_seqs([read, seq[200:300]])
    packed = pack.pack_reads(codes)
    nmask2 = pack.pack_reads(nmask.astype(jnp.uint8))  # 1 -> bit 2j, same layout
    diags = jnp.array([[1000, 999, 0xFFFFFFFF], [200, 500, 202]], dtype=jnp.uint32)
    counts = np.asarray(verify.verify_diagonals(idx, packed, nmask2, lengths, diags))
    assert counts[0, 0] == 2
    assert counts[0, 1] > 10
    assert counts[0, 2] == 100          # invalid lane -> all mismatch
    assert counts[1, 0] == 0
    # window overlapping the NNN run must count them as mismatches
    assert counts[1, 1] >= 3


def test_seed_reads_finds_origin(small_db):
    db, seq = small_db
    idx = DeviceIndex.from_host(db)
    reads = [seq[100:200], seq[2000:2100], seq[1500:1600]]
    codes, nmask, lengths = batch_from_seqs(reads)
    diags, counts = seed.seed_reads(idx, codes, nmask, lengths,
                                    max_occ=16, top_k=4)
    diags = np.asarray(diags)
    assert diags[0, 0] == 100
    assert diags[1, 0] == 2000
    assert diags[2, 0] == 1500
    assert np.asarray(counts)[0, 0] >= 90   # ~93 supporting 8-mers


def test_prevalent_diagonals_counts():
    d = jnp.array([[5, 5, 5, 9, 9, 0xFFFFFFFF, 0xFFFFFFFF, 3]], dtype=jnp.uint32)
    diags, counts = seed.prevalent_diagonals(d, 3)
    assert np.asarray(diags)[0].tolist() == [5, 9, 3]
    assert np.asarray(counts)[0].tolist() == [3, 2, 1]
