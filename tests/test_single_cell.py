"""10x single-cell barcode handling (src/single-cell.c): whitelist
confirmation, posterior barcode correction, CR/CY/CB/UR/UY tags."""
import io
from contextlib import redirect_stdout

import numpy as np
import pytest

from tpumap.gsnap.single_cell import SingleCell


WL = ["AAAACCCCGGGGTTTT", "ACGTACGTACGTACGT", "TTTTGGGGCCCCAAAA"]


def test_confirmed_barcode():
    sc = SingleCell(WL)
    tags = sc.sam_tags("AAAACCCCGGGGTTTT" + "AACCGGTTAACC", "I" * 28)
    assert "CR:Z:AAAACCCCGGGGTTTT" in tags
    assert "CB:Z:AAAACCCCGGGGTTTT" in tags
    assert "UR:Z:AACCGGTTAACC" in tags
    assert "CY:Z:" + "I" * 16 in tags
    assert "UY:Z:" + "I" * 12 in tags


def test_correction_posterior():
    sc = SingleCell(WL)
    # dataset priors: one barcode dominates
    for _ in range(100):
        sc.observe("AAAACCCCGGGGTTTT" + "X" * 12)
    for _ in range(2):
        sc.observe("ACGTACGTACGTACGT" + "X" * 12)
    # one error in the dominant barcode, low quality at the error position
    bad = "TAAACCCCGGGGTTTT"
    qual = "#" + "I" * 15 + "I" * 12
    tags = sc.sam_tags(bad + "A" * 12, qual)
    assert "CB:Z:AAAACCCCGGGGTTTT" in tags
    assert "CR:Z:TAAACCCCGGGGTTTT" in tags


def test_unconfirmable_gets_no_cb():
    sc = SingleCell(WL)
    sc.observe(WL[0] + "X" * 12)
    # two edits away from everything
    tags = sc.sam_tags("CCAACCCCGGGGTTTT" + "A" * 12, "I" * 28)
    assert not any(t.startswith("CB:Z:") for t in tags)
    assert any(t.startswith("CR:Z:") for t in tags)


def test_cli_single_cell(tmp_path):
    from tpumap.cli.gsnap_cli import main as gsnap_main
    from tpumap.index import build_db

    rng = np.random.default_rng(9)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 20000))
    (tmp_path / "g.fa").write_text(">chr1\n" + seq + "\n")
    db = build_db(tmp_path / "g.fa", name="sc", k=13, interval=3)
    db.save(str(tmp_path / "db"))
    (tmp_path / "wl.txt").write_text("\n".join(WL) + "\n")
    bc = WL[1]
    umi = "GATTACAGATTA"
    (tmp_path / "r1.fq").write_text(
        f"@p1\n{bc}{umi}\n+\n{'I' * 28}\n")
    (tmp_path / "r2.fq").write_text(
        f"@p1\n{seq[3000:3100]}\n+\n{'I' * 100}\n")

    buf = io.StringIO()
    with redirect_stdout(buf):
        gsnap_main(["-D", str(tmp_path / "db"), "--10x-whitelist",
                    str(tmp_path / "wl.txt"),
                    str(tmp_path / "r1.fq"), str(tmp_path / "r2.fq")])
    lines = [l for l in buf.getvalue().splitlines() if not l.startswith("@")]
    assert len(lines) == 1
    assert "\tCB:Z:" + bc in lines[0]
    assert "\tUR:Z:" + umi in lines[0]
    assert lines[0].split("\t")[3] == "3001"
