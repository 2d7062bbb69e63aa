"""Unit tests for the chain-DP path solver + end trimming (ops/pathdp.py).

Oracle: an independent numpy implementation of the same recurrence
(per-read Python loops), mirroring how the reference validates its SIMD DP
against the scalar DP (src/dynprog.h DEBUG_SIMD).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from tpumap.index import build_db
from tpumap.index.device import DeviceIndex
from tpumap.ops import pathdp
from tpumap.utils import dna

INVALID = 0xFFFFFFFF


# ---------------------------------------------------------------- trim_ends

def oracle_trim_qstart(mmpos_desc, pos5, pos3):
    """Scalar transcription of Spliceends_trim_qstart_nosplice
    (reference src/spliceends.c:4121-4216): mismatch positions in
    DESCENDING order, returns qstart."""
    m = len(mmpos_desc)
    if m == 0:
        return pos5
    prevpos = pos3
    trimpos = pos = mmpos_desc[0]
    max_score = score = (prevpos - pos - 1)
    nmm_to_trim = 0
    prevpos = pos
    donep = False
    i = 1
    while not donep and i < m:
        pos = mmpos_desc[i]
        score += -3 + (prevpos - pos - 1)
        if score >= max_score:
            trimpos, nmm_to_trim, max_score = pos, i, score
        elif score + (pos + 1 - pos5) < 0:
            donep = True
        prevpos = pos
        i += 1
    if donep:
        pass
    elif nmm_to_trim == m - 1:
        trimpos = pos5 - 1
    else:
        pos = pos5 - 1
        score += -3 + (prevpos - pos - 1)
        if score >= max_score:
            trimpos = pos
    return trimpos + 1


def oracle_trim_qend(mmpos_asc, pos5, pos3):
    """Mirror image for qend: ascending mismatch positions, returns qend."""
    m = len(mmpos_asc)
    if m == 0:
        return pos3
    prevpos = pos5 - 1
    trimpos = pos = mmpos_asc[0]
    max_score = score = (pos - prevpos - 1)
    nmm_to_trim = 0
    prevpos = pos
    donep = False
    i = 1
    while not donep and i < m:
        pos = mmpos_asc[i]
        score += -3 + (pos - prevpos - 1)
        if score >= max_score:
            trimpos, nmm_to_trim, max_score = pos, i, score
        elif score + (pos3 - pos) < 0:
            donep = True
        prevpos = pos
        i += 1
    if donep:
        pass
    elif nmm_to_trim == m - 1:
        trimpos = pos3
    else:
        pos = pos3
        score += -3 + (pos - prevpos - 1)
        if score >= max_score:
            trimpos = pos
    return trimpos


def oracle_trim(mm, length):
    mmpos = [p for p in range(length) if mm[p]]
    qs = oracle_trim_qstart(mmpos[::-1], 0, length)
    qs = min(qs, length)
    qe = oracle_trim_qend([p for p in mmpos if p >= qs], qs, length)
    return qs, max(qe, qs)


def test_trim_ends_random():
    rng = np.random.default_rng(0)
    B, L = 64, 50
    mm = rng.random((B, L)) < 0.25
    mm[:16] = rng.random((16, L)) < 0.04      # mostly-clean reads too
    lengths = rng.integers(10, L + 1, B).astype(np.int32)
    qs, qe, score, nmm_in = (np.asarray(x) for x in pathdp.trim_ends(
        jnp.asarray(mm), jnp.asarray(lengths)))
    for b in range(B):
        ei, ej = oracle_trim(mm[b], lengths[b])
        assert (qs[b], qe[b]) == (ei, ej), b
        assert nmm_in[b] == mm[b][qs[b]:qe[b]].sum(), b
        alen = qe[b] - qs[b]
        assert score[b] == 8 * (alen - nmm_in[b]) - 24 * nmm_in[b], b


def test_trim_ends_oracle_cases():
    """CIGAR-verified against /tmp/refbin/gsnap (2024-02-22) on 100 bp
    reads with planted terminal mismatches (see docstring of trim_ends)."""
    L = 100
    cases = [  # (mismatch positions, expected qs, expected qe)
        ([0], 0, L),              # 1 leading mm kept -> 100M
        ([0, 1], 2, L),           # adjacent leading run -> 2S98M
        ([1, 2], 3, L),           # -> 3S97M
        ([0, 1, 2, 3], 4, L),     # -> 4S96M
        ([0, 5], 0, L),           # spread -> kept, 100M
        ([97], 0, L),             # 1 trailing mm kept
        ([90, 99], 0, L),         # spread trailing -> kept
        ([95, 96], 0, 95),        # -> 95M5S
        ([98, 99], 0, 98),        # -> 98M2S
    ]
    mm = np.zeros((len(cases), L), bool)
    for r, (poss, _, _) in enumerate(cases):
        mm[r, poss] = True
    lengths = np.full(len(cases), L, np.int32)
    qs, qe, _, _ = (np.asarray(x) for x in pathdp.trim_ends(
        jnp.asarray(mm), jnp.asarray(lengths)))
    for r, (poss, eqs, eqe) in enumerate(cases):
        assert (qs[r], qe[r]) == (eqs, eqe), (r, poss)


# ---------------------------------------------------------------- chain DP

def oracle_chain(genome, codes, length, diags, sc=pathdp.PathScoring(),
                 known=None):
    """Reference implementation of chain_solve's recurrence for one read.
    Returns (score, q_start, q_end, segments [(q, diag)])."""
    diags = sorted(d for d in diags if d != INVALID)
    K = len(diags)
    if K == 0:
        return None
    G = len(genome)

    def g(d, q):
        p = d + q
        return genome[p] if 0 <= p < G else 4

    mm = [[codes[q] != g(d, q) for q in range(length)] for d in diags]
    s = [[sc.match if not mm[k][q] else sc.mismatch
          for q in range(length)] for k in range(K)]

    def dinuc(d, q):
        return g(d, q) * 4 + g(d, q + 1)

    def jump_cost(kp, k, q):
        gap = diags[k] - diags[kp]
        if q < 1:
            return None
        if gap < 1:
            # insertion jump (exact correction of the n pre-jump scores)
            n = -gap
            if 1 <= n <= sc.max_insert and q >= n + 1:
                corr = sum(s[kp][q - j] for j in range(1, n + 1)
                           if q - j >= 0)
                return sc.ins_open + sc.ins_extend * (n - 1) - corr
            return None
        if gap < sc.min_intron:
            return sc.del_open + sc.del_extend * (gap - 1)
        if gap > sc.max_intron:
            return None
        dj = dinuc(diags[kp], q)
        aj = dinuc(diags[k], q - 2) if q >= 2 else 16
        if (dj, aj) in ((11, 2), (7, 1)):
            bonus = sc.bonus_gtag
        elif (dj, aj) in ((9, 2), (7, 9)):
            bonus = sc.bonus_gcag
        elif (dj, aj) in ((3, 1), (11, 3)):
            bonus = sc.bonus_atac
        else:
            bonus = 0
        if known is not None:
            site_l = diags[kp] + q
            site_r = diags[k] + q
            if ((site_l in known["donor"] and site_r in known["acceptor"])
                    or (site_l in known["antiacceptor"]
                        and site_r in known["antidonor"])):
                bonus = max(bonus, sc.bonus_known)
        if bonus == 0 and not sc.allow_noncanon:
            return None
        return sc.splice_base + bonus

    NEG = -(2 ** 20)
    H = [NEG] * K
    parent = [[None] * K for _ in range(length)]   # (type, kp)
    best = (NEG, 0, 0)
    for q in range(length):
        Hn = [NEG] * K
        for k in range(K):
            cands = [(H[k], ("cont", None)), (0, ("start", None))]
            for kp in range(K):
                c = jump_cost(kp, k, q)
                if c is not None:
                    cands.append((H[kp] + c, ("switch", kp)))
            # tie-break: cont > start > switch (kernel's where-chain order)
            val = max(c[0] for c in cands)
            for v, tag in cands:
                if v == val:
                    parent[q][k] = tag
                    break
            Hn[k] = val + s[k][q]
        H = Hn
        row_best = max(H)
        row_k = H.index(row_best)
        # ties keep the LATEST co-optimal end (kernel tie rule)
        if row_best >= best[0]:
            best = (row_best, q, row_k)
    score, bq, bk = best
    # traceback
    segs = []
    q, k = bq, bk
    while True:
        typ, kp = parent[q][k]
        if typ == "start":
            segs.append((q, diags[k]))
            break
        if typ == "switch":
            segs.append((q, diags[k]))
            k = kp
        q -= 1
    segs.reverse()
    return score, segs[0][0], bq + 1, segs


@pytest.fixture(scope="module")
def small_db(tmp_path_factory):
    d = tmp_path_factory.mktemp("pathdp")
    rng = np.random.default_rng(7)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 8000))
    # implant two GT..AG introns: [2000,2300) and [3000,3500)
    seq = (seq[:2000] + "GT" + seq[2002:2298] + "AG"
           + seq[2300:3000] + "GT" + seq[3002:3498] + "AG" + seq[3500:])
    (d / "g.fa").write_text(">chr1\n" + seq + "\n")
    db = build_db(d / "g.fa", name="g", k=12, interval=3)
    return db, seq


def run_chain(db, codes_list, diags_list, L=None, known=None,
              sc=pathdp.PathScoring()):
    index = DeviceIndex.from_host(db)
    R = len(codes_list)
    L = L or max(len(c) for c in codes_list)
    K = max(len(d) for d in diags_list)
    codes = np.zeros((R, L), np.uint8)
    nmask = np.zeros((R, L), bool)
    lengths = np.zeros(R, np.int32)
    diags = np.full((R, K), INVALID, np.uint32)
    for i, (c, ds) in enumerate(zip(codes_list, diags_list)):
        codes[i, :len(c)] = c
        lengths[i] = len(c)
        diags[i, :len(ds)] = ds
    kd = None
    if known is not None:
        kd = {k: jnp.asarray(np.asarray(sorted(v), np.uint32))
              for k, v in known.items()}
    out = pathdp.chain_solve(index, jnp.asarray(codes), jnp.asarray(nmask),
                             jnp.asarray(lengths), jnp.asarray(diags),
                             scoring=sc, known=kd)
    return {k: np.asarray(v) for k, v in out.items()}


def test_single_diagonal_clean(small_db):
    db, seq = small_db
    codes, _ = dna.encode(seq[500:600])
    out = run_chain(db, [codes], [[500]])
    assert out["nsegs"][0] == 1
    assert out["q_start"][0] == 0 and out["q_end"][0] == 100
    assert out["nmm"][0] == 0
    assert out["seg_diag"][0][0] == 500


def test_one_intron(small_db):
    db, seq = small_db
    # read: 40 bases before intron1 + 60 after => boundary q*=40
    read = seq[1960:2000] + seq[2300:2360]
    codes, _ = dna.encode(read)
    # diagonal A: aligns prefix (univdiag = 1960); B: suffix
    # (genome 2300 at q=40 -> diag 2260)
    out = run_chain(db, [codes], [[1960, 2260]])
    assert out["nsegs"][0] == 2
    assert out["q_start"][0] == 0 and out["q_end"][0] == 100
    assert out["seg_q"][0][0] == 0 and out["seg_q"][0][1] == 40
    assert out["seg_diag"][0][0] == 1960
    assert out["seg_diag"][0][1] == 2260
    assert out["nmm"][0] == 0


def test_two_introns(small_db):
    db, seq = small_db
    # 3 exons: 30 bases ending at 2000, exon2 = [2300, 3000) tail 40,
    # exon3 from 3500
    read = seq[1970:2000] + seq[2960:3000] + seq[3500:3550]
    codes, _ = dna.encode(read)
    dA = 1970                # prefix q in [0,30)
    dB = 2960 - 30           # exon2 q in [30, 70)
    dC = 3500 - 70           # exon3 q in [70, 120)
    out = run_chain(db, [codes], [[dA, dB, dC]])
    assert out["nsegs"][0] == 3
    assert list(out["seg_q"][0][:3]) == [0, 30, 70]
    assert list(out["seg_diag"][0][:3]) == [dA, dB, dC]
    assert out["nmm"][0] == 0
    assert out["q_start"][0] == 0 and out["q_end"][0] == 120


def test_deletion_gap(small_db):
    db, seq = small_db
    # 5-base deletion at genome 1000: read = 50 bases, skipping 5
    read = seq[975:1000] + seq[1005:1030]
    codes, _ = dna.encode(read)
    out = run_chain(db, [codes], [[975, 980]])
    assert out["nsegs"][0] == 2
    assert out["seg_q"][0][1] == 25
    assert out["nmm"][0] == 0


def test_soft_clip_tail(small_db):
    db, seq = small_db
    rng = np.random.default_rng(3)
    read = seq[600:680] + "".join("ACGT"[i] for i in rng.integers(0, 4, 20))
    codes, _ = dna.encode(read)
    out = run_chain(db, [codes], [[600]])
    assert out["q_start"][0] == 0
    assert 78 <= out["q_end"][0] <= 84      # garbage tail clipped
    assert out["nsegs"][0] == 1


def test_known_junction_bonus(small_db):
    """A non-canonical junction is rejected without known sites but
    accepted when the exact coords are in the known tables."""
    db, seq = small_db
    # fake junction at a non-canonical position: exon [4000,4040) then
    # jump 1000 to [5040, 5100): boundary q*=40
    read = seq[4000:4040] + seq[5040:5100]
    codes, _ = dna.encode(read)
    dA, dB = 4000, 5000
    out = run_chain(db, [codes], [[dA, dB]])
    known = {"donor": [4040], "acceptor": [5040],
             "antidonor": [], "antiacceptor": []}
    out_k = run_chain(db, [codes], [[dA, dB]], known=known)
    # with known sites the junction must score higher
    assert out_k["score"][0] >= out["score"][0]
    assert out_k["nsegs"][0] == 2
    assert out_k["seg_q"][0][1] == 40
    assert out_k["nmm"][0] == 0


def test_chain_random_vs_oracle(small_db):
    """Random candidate sets: kernel score must equal the numpy oracle."""
    db, seq = small_db
    genome, _ = dna.encode(seq)
    rng = np.random.default_rng(11)
    codes_list, diags_list, cases = [], [], []
    for t in range(24):
        L = int(rng.integers(40, 90))
        start = int(rng.integers(100, 7000))
        read = list(seq[start:start + L])
        for _ in range(int(rng.integers(0, 6))):        # mutations
            p = int(rng.integers(0, L))
            read[p] = "ACGT"[rng.integers(0, 4)]
        codes, _ = dna.encode("".join(read))
        k = int(rng.integers(1, 5))
        ds = [start] + [int(rng.integers(100, 7000)) for _ in range(k - 1)]
        ds = list(dict.fromkeys(ds))
        codes_list.append(codes)
        diags_list.append(ds)
        cases.append((codes, L, ds))
    out = run_chain(db, codes_list, diags_list)
    for i, (codes, L, ds) in enumerate(cases):
        exp = oracle_chain(genome, codes, L, ds)
        assert out["score"][i] == exp[0], (i, ds)
        assert out["q_start"][i] == exp[1], (i, out["q_start"][i], exp)
        assert out["q_end"][i] == exp[2], (i, out["q_end"][i], exp)
        assert out["nsegs"][i] == len(exp[3]), i


def test_chain_quality_weighting(small_db):
    """Low-quality mismatches cost less: a dirty-but-low-qual tail is kept
    with quals, trimmed without."""
    db, seq = small_db
    read = seq[700:780]
    codes, _ = dna.encode(read)
    codes = codes.copy()
    mmpos = np.arange(70, 78, 3)
    codes[mmpos] ^= 1                       # sparse mismatches in tail
    quals = np.full(80, 30, np.uint8)
    quals[mmpos] = 2                        # ...at quality 2
    index = DeviceIndex.from_host(db)
    args = (jnp.asarray(codes[None]), jnp.asarray(np.zeros((1, 80), bool)),
            jnp.asarray(np.array([80], np.int32)),
            jnp.asarray(np.array([[700]], np.uint32)))
    out_flat = pathdp.chain_solve(index, *args)
    out_q = pathdp.chain_solve(index, *args, with_quals=True,
                               quals=jnp.asarray(quals[None]))
    assert np.asarray(out_flat["q_end"])[0] == 70     # tail trimmed
    assert np.asarray(out_q["q_end"])[0] == 80        # tail kept


def test_middle_insertion(small_db):
    """Insertion INSIDE a chain (src/path-solve.c:309
    Indel_resolve_middle_insertion): a 2-base query insertion appears as
    a jump to a diagonal 2 EARLIER; the solver must chain both segments
    instead of soft-clipping the suffix."""
    db, seq = small_db
    # read = 40 genome bases + "CC" inserted + 50 more contiguous bases;
    # pick insert bases that differ from genome at the junction
    ins = "C" if seq[740] != "C" else "G"
    read = seq[700:740] + ins * 2 + seq[740:790]
    codes, _ = dna.encode(read)
    # suffix: query 42 aligns genome 740 -> diag 698
    out = run_chain(db, [codes], [[700, 698]])
    assert out["nsegs"][0] == 2
    assert out["seg_diag"][0][0] == 700
    assert out["seg_diag"][0][1] == 698
    assert out["seg_q"][0][1] == 42            # new segment starts past the insert
    assert out["q_start"][0] == 0 and out["q_end"][0] == 92


def test_intron_plus_insertion(small_db):
    """One intron AND one insertion in the same read (the r2 missing
    feature): intron [2000,2300), then a 2-base insertion 30 bases into
    exon 2 — three segments, mixed N and I junctions."""
    db, seq = small_db
    ins = "A" if seq[2330] != "A" else "T"
    read = seq[1960:2000] + seq[2300:2330] + ins * 2 + seq[2330:2380]
    codes, _ = dna.encode(read)
    dA = 1960                 # exon1 q in [0, 40)
    dB = 2300 - 40            # exon2a q in [40, 70)
    dC = 2330 - 72            # exon2b q in [72, 122)
    out = run_chain(db, [codes], [[dA, dB, dC]])
    assert out["nsegs"][0] == 3
    assert list(out["seg_diag"][0][:3]) == [dA, dB, dC]
    assert out["seg_q"][0][1] == 40
    # the I placement may left-shift within a homopolymer tie (SAM
    # convention allows either end of the run); the emitted alignment
    # must be mismatch-free either way
    qb = int(out["seg_q"][0][2])
    assert 70 <= qb <= 74
    assert out["q_start"][0] == 0 and out["q_end"][0] == 122
    assert out["nmm"][0] == 0
    from tpumap.io import sam as sam_mod
    segs = list(zip(out["seg_q"][0][:3].tolist(),
                    out["seg_diag"][0][:3].tolist()))
    rec = sam_mod.path_record(db, "q1", read, None, segs, 0, 122, 0, 40)
    import re
    parts = re.findall(r"(\d+)([MIDNS])", rec.cigar)
    assert ("2", "I") in parts and ("300", "N") in parts
    nm = next(int(t[5:]) for t in rec.tags if t.startswith("NM:i:"))
    assert nm == 2            # the 2 inserted bases only


def test_insertion_path_record(small_db):
    """path_record emits M/I/M CIGAR + MD/NM for an insertion path."""
    from tpumap.io import sam as sam_mod
    db, seq = small_db
    ins = "C" if seq[740] != "C" else "G"
    read = seq[700:740] + ins * 2 + seq[740:790]
    rec = sam_mod.path_record(db, "q1", read, None,
                              [(0, 700), (42, 698)], 0, 92, 0, 40)
    assert rec.cigar == "40M2I50M"
    assert rec.pos == 701
    nm = next(int(t[5:]) for t in rec.tags if t.startswith("NM:i:"))
    assert nm == 2
    md = next(t[5:] for t in rec.tags if t.startswith("MD:Z:"))
    assert md == "90"
