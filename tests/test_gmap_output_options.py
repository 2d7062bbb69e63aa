"""gmap translation/GFF3/SAM output knobs: --translation-code,
--alt-start-codons, -F/-a, --gff3-swap-phase/--gff3-add-separators,
--sam-extended-cigar, SAM headers + read groups, -5/--md5."""
import io
from contextlib import redirect_stdout

import numpy as np
import pytest

from tpumap.gmap import translation as T
from tpumap.utils import dna


@pytest.fixture(autouse=True)
def reset_translation():
    yield
    T.set_translation_code(1)
    T.set_alt_start_codons(False)


def test_translation_code_tables():
    codes, _ = dna.encode("ATGAAATGA")
    assert T.translate_codes(codes) == "MK*"
    T.set_translation_code(2)              # vertebrate mito: TGA = W
    assert T.translate_codes(codes) == "MKW"
    T.set_translation_code(6)              # ciliate: TAA/TAG = Q
    c2, _ = dna.encode("TAATAG")
    assert T.translate_codes(c2) == "QQ"
    with pytest.raises(ValueError):
        T.set_translation_code(99)


def test_alt_start_codons():
    gtg, _ = dna.encode("TAAGTGAAATAA")
    s, e, aa = T.best_orf(gtg, fulllength=True)
    assert aa != "VK"                      # GTG start needs the flag
    T.set_alt_start_codons(True)
    s, e, aa = T.best_orf(gtg, fulllength=True)
    assert aa == "VK"


def test_cdsstart():
    codes, _ = dna.encode("CATGAAATGA")
    s, e, aa = T.best_orf(codes, cdsstart=1)
    assert (s, e) == (1, 10)
    assert aa == "MK"


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    d = tmp_path_factory.mktemp("gout")
    rng = np.random.default_rng(47)
    g = list("".join("ACGT"[i] for i in rng.integers(0, 4, 9000)))
    g[3080:3082] = "GT"
    g[3278:3280] = "AG"
    genome = "".join(g)
    (d / "g.fa").write_text(">chr1\n" + genome + "\n")
    cdna = genome[3000:3080] + genome[3280:3360]
    (d / "q.fa").write_text(f">q1\n{cdna}\n")
    from tpumap.cli.build_cli import main as build_main
    build_main(["-D", str(d), "-d", "g", "-k", "12", "-q", "3",
                str(d / "g.fa")])
    return d


def run_gmap(args):
    from tpumap.cli.gmap_cli import main as gmap_main
    buf = io.StringIO()
    with redirect_stdout(buf):
        gmap_main(args)
    return buf.getvalue()


def test_gff3_swap_phase_and_separators(world):
    out = run_gmap(["-f", "2", "-g", str(world / "g.fa"),
                    str(world / "q.fa")])
    assert "###" in out
    nosep = run_gmap(["-f", "2", "--gff3-add-separators", "0", "-g",
                      str(world / "g.fa"), str(world / "q.fa")])
    assert "###" not in nosep
    swapped = run_gmap(["-f", "2", "--gff3-swap-phase", "1", "-g",
                        str(world / "g.fa"), str(world / "q.fa")])

    def phases(txt):
        return [l.split("\t")[7] for l in txt.splitlines()
                if "\tCDS\t" in l]

    p0, p1 = phases(out), phases(swapped)
    assert p0 and len(p0) == len(p1)
    swap = {"0": "0", "1": "2", "2": "1"}
    assert p1 == [swap[x] for x in p0]


def test_sam_headers_and_extended_cigar(world):
    out = run_gmap(["-f", "samse", "-D", str(world / "g"),
                    "--read-group-id", "rg7", str(world / "q.fa")])
    lines = out.splitlines()
    assert lines[0].startswith("@HD")
    assert any(l.startswith("@SQ\tSN:chr1") for l in lines)
    assert any(l.startswith("@RG\tID:rg7") for l in lines)
    body = [l for l in lines if not l.startswith("@")]
    assert "RG:Z:rg7" in body[0]
    ext = run_gmap(["-f", "samse", "-D", str(world / "g"),
                    "--sam-extended-cigar", "--no-sam-headers",
                    str(world / "q.fa")])
    first = ext.splitlines()[0]
    assert "=" in first.split("\t")[5]
    assert "M" not in first.split("\t")[5]


def test_md5(world):
    import hashlib
    out = run_gmap(["-S", "-5", "-g", str(world / "g.fa"),
                    str(world / "q.fa")])
    from tpumap.io.fasta import read_fasta
    rec = next(read_fasta(str(world / "q.fa")))
    h = hashlib.md5(rec.sequence.upper().encode()).hexdigest()
    assert f"q1\t{h}" in out


def test_map_annotation(world, tmp_path):
    from tpumap.cli.iit_cli import store_main
    src = tmp_path / "map.src"
    src.write_text(">gene1 chr1:3001..3360 t\nannot\n"
                   ">gene2 chr1:3100..3200 t\n")
    import contextlib
    import io as _io
    with contextlib.redirect_stdout(_io.StringIO()):
        store_main(["-o", str(tmp_path / "mymap"), str(src)])
    out = run_gmap(["-S", "-D", str(world / "g"), "-m",
                    str(tmp_path / "mymap.iit"), str(world / "q.fa")])
    assert "Maps:" in out
    assert "Map hits for path 1 (2):" in out
    assert "\tmymap\tchr1:3001..3360\tgene1" in out
    assert "\tmymap\tchr1:3100..3200\tgene2" in out


import pathlib
import subprocess

REFBIN = pathlib.Path("/tmp/refbin")
need_oracle = pytest.mark.skipif(not (REFBIN / "gmap").exists(),
                                 reason="reference oracle unavailable")


@need_oracle
@pytest.mark.parametrize("flags", [["-3"], ["-4"], ["-f", "7"],
                                   ["-f", "8"], ["-f", "9"]])
def test_extra_formats_oracle_parity(world, flags):
    ref = subprocess.run([str(REFBIN / "gmap"), "-g",
                          str(world / "g.fa")] + flags
                         + [str(world / "q.fa")],
                         capture_output=True, text=True).stdout
    mine = run_gmap(flags + ["-g", str(world / "g.fa"),
                             str(world / "q.fa")])
    assert mine == ref


def test_map_exons_format(world):
    out = run_gmap(["-f", "map_exons", "-D", str(world / "g"),
                    str(world / "q.fa")])
    lines = out.splitlines()
    assert lines[0] == ">q1 chr1:3001..3360"
    assert lines[1] == "q1"
    assert lines[2] == "3001 3080"
    assert lines[3] == "3281 3360"
