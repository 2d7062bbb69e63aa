"""Runtime/IO features of the gsnap CLI: --part modular sharding,
--failed-input capture, --split-output per-category files, -o/--append,
--time (src/inbuffer.c:96-124, src/gsnap.c:720-726, src/outbuffer.c)."""
import io
import sys
from contextlib import redirect_stdout

import numpy as np
import pytest

from tpumap.cli.gsnap_cli import OutputRouter, main as gsnap_main, parse_part
from tpumap.io.sam import SamRecord


def test_parse_part():
    assert parse_part("0/4") == (0, 4)
    assert parse_part("3/4") == (3, 4)
    with pytest.raises(ValueError):
        parse_part("4/4")


def test_categories():
    assert OutputRouter.single_category(SamRecord("a", 4)) == "nomapping"
    assert OutputRouter.single_category(
        SamRecord("a", 0, mapq=40)) == "unpaired_uniq"
    assert OutputRouter.single_category(
        SamRecord("a", 0, mapq=0)) == "unpaired_mult"
    assert OutputRouter.paired_category(
        SamRecord("a", 4), SamRecord("a", 4)) == "nomapping"
    assert OutputRouter.paired_category(
        SamRecord("a", 99, mapq=40), SamRecord("a", 147, mapq=40)) == \
        "concordant_uniq"
    assert OutputRouter.paired_category(
        SamRecord("a", 4), SamRecord("a", 0, mapq=40)) == "halfmapping_uniq"


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    from tpumap.index import build_db

    d = tmp_path_factory.mktemp("rt")
    rng = np.random.default_rng(5)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 20000))
    (d / "g.fa").write_text(">chr1\n" + seq + "\n")
    db = build_db(d / "g.fa", name="rt", k=13, interval=3)
    db.save(str(d / "db"))
    lines = []
    for i in range(8):
        p = 1000 * (i + 1)
        lines.append(f"@r{i}\n{seq[p:p + 100]}\n+\n{'I' * 100}\n")
    # one garbage read that cannot align
    lines.append("@bad\n" + "ACGT" * 25 + "\n+\n" + "I" * 100 + "\n")
    (d / "r.fq").write_text("".join(lines))
    return d


def _run(args):
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = gsnap_main(args)
    return rc, buf.getvalue()


def test_part_sharding(world):
    d = world
    _, full = _run(["-D", str(d / "db"), str(d / "r.fq"),
                    "--no-sam-headers"])
    _, p0 = _run(["-D", str(d / "db"), "-q", "0/3", str(d / "r.fq"),
                  "--no-sam-headers"])
    _, p1 = _run(["-D", str(d / "db"), "-q", "1/3", str(d / "r.fq"),
                  "--no-sam-headers"])
    _, p2 = _run(["-D", str(d / "db"), "-q", "2/3", str(d / "r.fq"),
                  "--no-sam-headers"])
    assert sorted(full.splitlines()) == sorted(
        (p0 + p1 + p2).splitlines())
    names = [l.split("\t")[0] for l in p0.splitlines()]
    assert names == ["r0", "r3", "r6"]


def test_failed_input_and_split_output(world, tmp_path):
    d = world
    rc, _ = _run(["-D", str(d / "db"), str(d / "r.fq"),
                  "--failed-input", str(tmp_path / "failed.fq"),
                  "--split-output", str(tmp_path / "out")])
    assert rc == 0 or rc is None
    failed = (tmp_path / "failed.fq").read_text()
    assert failed.startswith("@bad\n")
    uniq = (tmp_path / "out.unpaired_uniq").read_text()
    assert "r0" in uniq and "bad" not in uniq.split("@PG")[-1].split()[0:1]
    nomap = (tmp_path / "out.nomapping").read_text()
    assert "bad\t4" in nomap.replace("bad\t4", "bad\t4")  # record present
    assert any(l.split("\t")[0] == "bad" for l in nomap.splitlines()
               if not l.startswith("@"))
    # headers present in every split file
    assert uniq.startswith("@HD") and nomap.startswith("@HD")


def test_output_file_and_append(world, tmp_path):
    d = world
    out = tmp_path / "x.sam"
    _run(["-D", str(d / "db"), "-q", "0/9", str(d / "r.fq"),
          "-o", str(out)])
    first = out.read_text()
    _run(["-D", str(d / "db"), "-q", "1/9", str(d / "r.fq"),
          "-o", str(out), "--append-output", "--no-sam-headers"])
    both = out.read_text()
    assert both.startswith(first)
    assert len(both.splitlines()) == len(first.splitlines()) + 1


def test_npaths_secondary(world):
    """gsnap -n: co-optimal hits beyond the first come out flagged 0x100
    (src/gsnap.c:704 maxpaths_report)."""
    import numpy as np
    from tpumap.index.build import GenomeDB

    d = world
    db = GenomeDB.load(str(d / "db"))
    # a read from a duplicated segment: copy seq[2000:2100] over
    # seq[12000:12100] in a fresh db
    from tpumap.index import build_db
    seq = db.get_seq(0, db.genome_length)
    seq2 = seq[:12000] + seq[2000:2100] + seq[12100:]
    (d / "g2.fa").write_text(">chr1\n" + seq2 + "\n")
    db2 = build_db(d / "g2.fa", name="rt2", k=13, interval=3)
    db2.save(str(d / "db2"))
    (d / "dup.fq").write_text(f"@dup\n{seq[2000:2100]}\n+\n{'I' * 100}\n")

    # bare default = reference default (-n 100, src/gsnap.c:523): both
    # co-optimal loci come out, the second flagged secondary
    _, dflt = _run(["-D", str(d / "db2"), str(d / "dup.fq"),
                    "--no-sam-headers"])
    assert len(dflt.splitlines()) == 2

    _, one = _run(["-D", str(d / "db2"), "-n", "1", str(d / "dup.fq"),
                   "--no-sam-headers"])
    assert len(one.splitlines()) == 1

    _, two = _run(["-D", str(d / "db2"), "-n", "4", str(d / "dup.fq"),
                   "--no-sam-headers"])
    lines = two.splitlines()
    assert len(lines) == 2
    flags = sorted(int(l.split("\t")[1]) & 0x100 for l in lines)
    assert flags == [0, 0x100]
    poss = sorted(int(l.split("\t")[3]) for l in lines)
    assert poss == [2001, 12001]
    # multimapper: MAPQ 0
    assert all(l.split("\t")[4] == "0" for l in lines)


def test_interleaved_paired(world, tmp_path):
    """--interleaved: one file, read1/read2 alternating (src/gsnap.c:612)."""
    from tpumap.index.build import GenomeDB

    d = world
    db = GenomeDB.load(str(d / "db"))
    seq = db.get_seq(0, db.genome_length)
    from tpumap.utils import dna as dna_mod
    r1 = seq[3000:3100]
    r2 = dna_mod.revcomp(seq[3200:3300])
    (tmp_path / "il.fq").write_text(
        f"@p\n{r1}\n+\n{'I' * 100}\n@p\n{r2}\n+\n{'I' * 100}\n")
    rc, out = _run(["-D", str(d / "db"), "--interleaved",
                    str(tmp_path / "il.fq"), "--no-sam-headers"])
    lines = [l for l in out.splitlines() if l.strip()]
    assert len(lines) == 2
    f1, f2 = (int(l.split("\t")[1]) for l in lines)
    assert f1 & 64 and f2 & 128          # first/second in pair
    assert f1 & 2 and f2 & 2             # proper pair


def test_failure_isolation(monkeypatch):
    """align_records_isolated quarantines a poison batch to per-read
    retries; the poison read comes back as an unmapped record."""
    import numpy as np
    from tpumap.gsnap import driver as drv
    from tpumap.index import build_db
    from tpumap.index.device import DeviceIndex
    from tpumap.io.fasta import Record

    rng = np.random.default_rng(61)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 4000))
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        import pathlib
        gfa = pathlib.Path(d) / "g.fa"
        gfa.write_text(">chr1\n" + seq + "\n")
        db = build_db(gfa, name="g", k=12, interval=3)
    index = DeviceIndex.from_host(db)
    recs = [Record(f"r{i}", "", seq[100 * i:100 * i + 80])
            for i in range(4)]

    real = drv.align_records
    calls = {"n": 0}

    def poisoned(db_, index_, records, *a, **kw):
        calls["n"] += 1
        if len(records) > 1:                    # batch call: blow up
            raise RuntimeError("poison read in batch")
        if records[0].accession == "r2":        # poison read alone
            raise RuntimeError("poison read")
        return real(db_, index_, records, *a, **kw)

    monkeypatch.setattr(drv, "align_records", poisoned)
    out = drv.align_records_isolated(db, index, recs, batch_size=4)
    assert len(out) == 4
    assert not out[0].flag & 4
    assert out[2].flag & 4                      # poison read unmapped
    assert out[2].qname == "r2"
    assert not out[3].flag & 4
