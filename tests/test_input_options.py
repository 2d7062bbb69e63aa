"""Input preprocessing options (src/shortread.c / gsnap input flags):
--barcode-length, --endtrim-length, --fastq-id-start/end,
--filter-chastity, --quality-protocol, --force-single-end,
paired-accession checking, --read-files-command."""
import io
from contextlib import redirect_stdout

import numpy as np
import pytest

from tpumap.io.fasta import (ReadOptions, Record, apply_read_options,
                             chastity_fail, check_pair_names,
                             preprocess_pairs, preprocess_reads, read_seqs)


def recs(*seqs):
    return [Record(f"r{i}", "", s, "I" * len(s))
            for i, s in enumerate(seqs)]


def test_barcode_and_endtrim():
    r = Record("a", "", "NNNNACGTACGTTT", "####IIIIIIIIJJ")
    out = apply_read_options(r, ReadOptions(barcode_length=4,
                                            endtrim_length=2))
    assert out.sequence == "ACGTACGT"
    assert out.quality == "IIIIIIII"


def test_fastq_id_fields():
    r = Record("SRR001666.1", "071112_SLXA s7:5:1:817:345 length=36",
               "ACGT", None)
    out = apply_read_options(r, ReadOptions(fastq_id_start=2,
                                            fastq_id_end=2))
    assert out.accession == "071112_SLXA"
    r2 = Record("SRR001666.1", "071112_SLXA s7:5:1:817:345 length=36",
                "ACGT", None)
    out2 = apply_read_options(r2, ReadOptions(fastq_id_start=1,
                                              fastq_id_end=2))
    assert out2.accession == "SRR001666.1 071112_SLXA"


def test_chastity_flag_parse():
    assert chastity_fail(Record("a", "1:Y:0:CTTGTA", "ACGT", None))
    assert not chastity_fail(Record("a", "1:N:0:CTTGTA", "ACGT", None))
    assert not chastity_fail(Record("a", "comment", "ACGT", None))


def test_chastity_single_end_filtering():
    rs = [Record("a", "1:Y:0:X", "ACGT", None),
          Record("b", "1:N:0:X", "ACGT", None)]
    out = list(preprocess_reads(iter(rs),
                                ReadOptions(filter_chastity="either")))
    assert [r.accession for r in out] == ["b"]


def test_chastity_paired_either_vs_both():
    p = [(Record("a", "1:Y:0:X", "ACGT", None),
          Record("a", "2:N:0:X", "ACGT", None)),
         (Record("b", "1:Y:0:X", "ACGT", None),
          Record("b", "2:Y:0:X", "ACGT", None)),
         (Record("c", "1:N:0:X", "ACGT", None),
          Record("c", "2:N:0:X", "ACGT", None))]
    either = list(preprocess_pairs(iter(p),
                                   ReadOptions(filter_chastity="either")))
    assert [r1.accession for r1, _ in either] == ["c"]
    both = list(preprocess_pairs(iter(p),
                                 ReadOptions(filter_chastity="both")))
    assert [r1.accession for r1, _ in both] == ["a", "c"]


def test_quality_shift_illumina_to_sanger():
    r = Record("a", "", "ACGT", "hhhh")   # Illumina Q40 = 'h' (104)
    out = apply_read_options(r, ReadOptions(quality_shift=-31,
                                            quality_zero=64))
    assert out.quality == "IIII"          # Sanger Q40 = 'I' (73)


def test_pair_name_check():
    assert check_pair_names(Record("x/1", "", "A", None),
                            Record("x/2", "", "A", None))
    assert check_pair_names(Record("x", "", "A", None),
                            Record("x", "", "A", None))
    assert not check_pair_names(Record("x", "", "A", None),
                                Record("y", "", "A", None))


def test_read_files_command(tmp_path):
    f = tmp_path / "in.fa"
    f.write_text(">a\nACGT\n")
    out = list(read_seqs(str(f), read_files_command="cat"))
    assert len(out) == 1 and out[0].sequence == "ACGT"


@pytest.fixture(scope="module")
def small_db(tmp_path_factory):
    d = tmp_path_factory.mktemp("inopts")
    rng = np.random.default_rng(7)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 5000))
    (d / "g.fa").write_text(">chr1\n" + seq + "\n")
    from tpumap.cli.build_cli import main as build_main
    build_main(["-D", str(d), "-d", "g", "-k", "12", "-q", "3",
                str(d / "g.fa")])
    return d, seq


def run_cli(args):
    from tpumap.cli.gsnap_cli import main as gsnap_main
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = gsnap_main(args)
    return rc, buf.getvalue()


def test_cli_barcode_length(small_db, tmp_path):
    d, seq = small_db
    reads = tmp_path / "r.fq"
    # 6-base barcode prepended; the genomic part must still align
    reads.write_text(f"@q1\nTTTTTT{seq[100:180]}\n+\n{'I' * 86}\n")
    rc, out = run_cli(["-D", str(d / "g"), "--barcode-length", "6",
                       str(reads)])
    line = [l for l in out.splitlines() if not l.startswith("@")][0]
    cols = line.split("\t")
    assert not int(cols[1]) & 4
    assert cols[3] == "101"           # 1-based pos of seq[100:]
    assert len(cols[9]) == 80         # barcode stripped


def test_cli_force_single_end(small_db, tmp_path):
    d, seq = small_db
    r1 = tmp_path / "r1.fa"
    r2 = tmp_path / "r2.fa"
    r1.write_text(f">a\n{seq[200:280]}\n")
    r2.write_text(f">b\n{seq[300:380]}\n")
    rc, out = run_cli(["-D", str(d / "g"), "--force-single-end",
                       str(r1), str(r2)])
    lines = [l for l in out.splitlines() if not l.startswith("@")]
    assert len(lines) == 2
    assert all(not int(l.split("\t")[1]) & 1 for l in lines)  # unpaired


def test_cli_pe_name_mismatch_errors(small_db, tmp_path, capsys):
    d, seq = small_db
    r1 = tmp_path / "r1.fa"
    r2 = tmp_path / "r2.fa"
    r1.write_text(f">a\n{seq[200:280]}\n")
    r2.write_text(f">b\n{seq[300:380]}\n")
    rc, _out = run_cli(["-D", str(d / "g"), str(r1), str(r2)])
    assert rc == 2
    assert "do not match" in capsys.readouterr().err
    rc2, out2 = run_cli(["-D", str(d / "g"), "--allow-pe-name-mismatch",
                         str(r1), str(r2)])
    assert rc2 != 2
    lines = [l for l in out2.splitlines() if not l.startswith("@")]
    assert len(lines) == 2


def test_cli_check_and_version(capsys):
    from tpumap.cli.gsnap_cli import main as gsnap_main
    assert gsnap_main(["--check"]) == 0
    err = capsys.readouterr().err
    assert "check: ok" in err
    with pytest.raises(SystemExit) as e:
        gsnap_main(["--version"])
    assert e.value.code == 0
