"""All remaining GMAP output formats: byte parity vs the oracle on HER2."""
import io
import pathlib
import subprocess
from contextlib import redirect_stdout

import pytest

REF_TESTS = pathlib.Path("/root/reference/tests")
REFBIN = pathlib.Path("/tmp/refbin")

need = pytest.mark.skipif(
    not REF_TESTS.is_dir() or not (REFBIN / "gmap").exists(),
    reason="reference fixtures/oracle unavailable")

CASES = [["-f", "1"], ["-f", "4"], ["-f", "6"], ["-f", "introns"],
         ["-f", "samse"], ["-E", "cdna"], ["-E", "genomic"],
         ["-E", "cdna+introns"], ["-E", "genomic+introns"], ["-P"], ["-Q"]]


@need
@pytest.mark.parametrize("args", CASES, ids=["".join(c) for c in CASES])
def test_format_parity_her2(args):
    from tpumap.cli.gmap_cli import main
    G = str(REF_TESTS / "ss.chr17test")
    Q = str(REF_TESTS / "ss.her2")
    buf = io.StringIO()
    with redirect_stdout(buf):
        main(args + ["-g", G, Q])
    mine = [l for l in buf.getvalue().splitlines() if not l.startswith("#")]
    ref = subprocess.run([str(REFBIN / "gmap")] + args + ["-g", G, Q],
                         capture_output=True, text=True).stdout
    refl = [l for l in ref.splitlines()
            if not (l.startswith("#") or l.startswith("@"))]
    assert mine == refl


def test_fa_coords_parity():
    """tpumap-fa_coords output == tests/coords1.test.ok (the coords1
    oracle, tests/coords1.test.in)."""
    import io as _io
    import pathlib
    from contextlib import redirect_stdout
    from tpumap.cli.fa_coords_cli import main as fa_main

    ok = pathlib.Path("/root/reference/tests/coords1.test.ok")
    src = pathlib.Path("/root/reference/tests/ss.chr17test")
    if not ok.exists():
        import pytest
        pytest.skip("reference fixture unavailable")
    buf = _io.StringIO()
    with redirect_stdout(buf):
        fa_main([str(src)])
    assert buf.getvalue() == ok.read_text()


def test_bedpe_format():
    """-f bedpe junction lines (src/pair.c Pair_print_bedpe)."""
    from tpumap.gmap.engine import Exon, ExonChain, Intron
    from tpumap.io.gmapfmt import bedpe

    chain = ExonChain(
        exons=[Exon(0, 50, 100, 150), Exon(50, 80, 400, 430),
               Exon(82, 100, 430, 448)],
        introns=[Intron("intron", 250, "GT-AG"),
                 Intron("insertion", 2)])
    out = bedpe(chain, "chr1", chrom_offset=0, query_seq="A" * 50 +
                "C" * 30 + "GT" + "T" * 18)
    lines = out.splitlines()
    assert lines[0] == "chr1\t149\t150\tchr1\t400\t401\tDELETION\t0\t+\t+\t250"
    assert lines[1] == "chr1\t429\t430\tchr1\t430\t431\tINSERTION\t0\t+\t+\tGT"
