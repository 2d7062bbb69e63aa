"""Output filters and SAM-shaping options (src/gsnap.c output/SAM flag
groups): --nofails/--failsonly, -Q/--quiet-if-excessive, NH/HI tags,
--sam-extended-cigar, --sam-use-0M, --sam-sparse-secondaries,
--omit-softclipped, --paired-flag-means-concordant, cigar checking."""
import io
from contextlib import redirect_stdout

import numpy as np
import pytest

from tpumap.io.sam import (SamRecord, apply_sam_options, check_cigar,
                           cigar_query_length, extended_cigar, strip_zero_m)


def test_extended_cigar_pure_match():
    assert extended_cigar("10M", "10") == "10="


def test_extended_cigar_mismatch_runs():
    # MD 3A6: 3 match, 1 mismatch, 6 match
    assert extended_cigar("10M", "3A6") == "3=1X6="


def test_extended_cigar_with_intron_and_indel():
    # 5M 100N 5M with a mismatch in the second exon
    assert extended_cigar("5M100N5M", "7C2") == "5=100N2=1X2="
    # insertion consumes no MD; deletion consumes ^
    assert extended_cigar("4M2I4M1D4M", "8^G4") == "4=2I4=1D4="


def test_strip_zero_m():
    assert strip_zero_m("5M0M3I7M") == "5M3I7M"
    assert strip_zero_m("10M") == "10M"


def test_cigar_query_length():
    assert cigar_query_length("10M2I3S") == 15
    assert cigar_query_length("5M100N5M") == 10
    assert cigar_query_length("3=1X6=") == 10


def test_check_cigar_actions(capsys):
    rec = SamRecord("q", 0, "c", 1, 0, "5M", seq="ACGTACGT")
    assert check_cigar(rec, "ignore")
    assert check_cigar(rec, "warning")
    assert "disagrees" in capsys.readouterr().err
    rec2 = SamRecord("q", 0, "c", 1, 0, "5M", seq="ACGTACGT")
    check_cigar(rec2, "noprint")
    assert rec2.cigar == "*"
    with pytest.raises(ValueError):
        check_cigar(SamRecord("q", 0, "c", 1, 0, "5M", seq="ACGTACGT"),
                    "abort")


def test_apply_sam_options_sparse_and_primaries():
    prim = SamRecord("q", 0, "c", 1, 40, "4M", seq="ACGT", qual="IIII",
                     tags=["NM:i:0", "MD:Z:4"])
    sec_equal = SamRecord("q", 0x100, "c", 50, 40, "4M", seq="ACGT",
                          qual="IIII", tags=["NM:i:0", "MD:Z:4"])
    sec_worse = SamRecord("q", 0x100, "c", 90, 40, "4M", seq="ACGT",
                          qual="IIII", tags=["NM:i:1", "MD:Z:3A0"])
    prim.secondaries = [sec_equal, sec_worse]
    apply_sam_options(prim, sparse_secondaries=True,
                      multiple_primaries=True)
    assert not sec_equal.flag & 0x100       # equal score: primary too
    assert sec_worse.flag & 0x100
    assert sec_worse.seq == "*" and sec_worse.qual == "*"


def test_apply_sam_options_extended():
    rec = SamRecord("q", 0, "c", 1, 40, "8M", seq="ACGTACGT", qual="*",
                    tags=["NM:i:1", "MD:Z:2T5"])
    apply_sam_options(rec, extended_cigar_p=True)
    assert rec.cigar == "2=1X5="


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    d = tmp_path_factory.mktemp("outopts")
    rng = np.random.default_rng(11)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 6000))
    # a repeated block makes multimappers for quiet-if-excessive
    block = seq[500:580]
    genome = seq[:2000] + block + seq[2000:4000] + block + seq[4000:]
    (d / "g.fa").write_text(">chr1\n" + genome + "\n")
    (d / "reads.fa").write_text(
        f">uniq\n{seq[1000:1080]}\n>multi\n{block}\n")
    from tpumap.cli.build_cli import main as build_main
    build_main(["-D", str(d), "-d", "g", "-k", "12", "-q", "3",
                str(d / "g.fa")])
    (d / "nohit.fa").write_text(">none\n" + "A" * 80 + "\n")
    return d


def run_cli(args):
    from tpumap.cli.gsnap_cli import main as gsnap_main
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = gsnap_main(args)
    return rc, buf.getvalue()


def body(out):
    return [l for l in out.splitlines() if not l.startswith("@")]


def test_nh_tag_present(world):
    _rc, out = run_cli(["-D", str(world / "g"), str(world / "reads.fa")])
    by_name = {l.split("\t")[0]: l for l in body(out)}
    assert "NH:i:1" in by_name["uniq"]
    nh = int(by_name["multi"].split("NH:i:")[1].split("\t")[0])
    assert nh >= 2


def test_quiet_if_excessive(world):
    _rc, out = run_cli(["-D", str(world / "g"), "-Q", "-n", "1",
                        str(world / "reads.fa")])
    by_name = {l.split("\t")[0]: l for l in body(out)}
    assert not int(by_name["uniq"].split("\t")[1]) & 4
    assert int(by_name["multi"].split("\t")[1]) & 4      # suppressed


def test_nofails_failsonly(world):
    _rc, out = run_cli(["-D", str(world / "g"), "--nofails",
                        str(world / "nohit.fa")])
    assert body(out) == []
    _rc, out2 = run_cli(["-D", str(world / "g"), "--failsonly",
                         str(world / "nohit.fa")])
    assert len(body(out2)) == 1
    _rc, out3 = run_cli(["-D", str(world / "g"), "--failsonly",
                         str(world / "reads.fa")])
    assert body(out3) == []


def test_sam_extended_cigar_cli(world):
    _rc, out = run_cli(["-D", str(world / "g"), "--sam-extended-cigar",
                        str(world / "reads.fa")])
    uniq = next(l for l in body(out) if l.startswith("uniq"))
    assert uniq.split("\t")[5] == "80="


def test_paired_flag_means_concordant(world, tmp_path):
    import numpy as np
    # make a discordant pair: both ends map but far beyond pairmax
    d = world
    from tpumap.io.fasta import read_fasta
    g = next(read_fasta(str(d / "g.fa"))).sequence
    comp = str.maketrans("ACGT", "TGCA")
    r1 = tmp_path / "r1.fa"
    r2 = tmp_path / "r2.fa"
    r1.write_text(f">p\n{g[100:180]}\n")
    mate = g[5500:5580].translate(comp)[::-1]
    r2.write_text(f">p\n{mate}\n")
    _rc, out = run_cli(["-D", str(d / "g"), "--pairmax", "500",
                        str(r1), str(r2)])
    flags = [int(l.split("\t")[1]) for l in body(out)]
    assert all(f & 1 for f in flags)          # default: paired bit kept
    _rc, out2 = run_cli(["-D", str(d / "g"), "--pairmax", "500",
                         "--paired-flag-means-concordant", "1",
                         str(r1), str(r2)])
    flags2 = [int(l.split("\t")[1]) for l in body(out2)]
    assert all(not f & 1 for f in flags2)
