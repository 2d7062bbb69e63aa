"""SNP tolerance (snpindex + gsnap -v): alt-allele seeding and
ref-OR-alt mismatch counting (src/snpindex.c, src/gsnap.c genomebits_alt,
src/genomebits_mismatches.c masked variants)."""
import io

import numpy as np
import pytest

from tpumap.cli.snpindex_cli import snps_from_iit
from tpumap.io.iit import build_iit, parse_map_fasta

N_SNP = 12


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    from tpumap.index import build_db
    from tpumap.index.device import DeviceIndex

    d = tmp_path_factory.mktemp("snp")
    rng = np.random.default_rng(3)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 20000))
    (d / "g.fa").write_text(">chr1\n" + seq + "\n")
    db = build_db(d / "g.fa", name="s", k=13, interval=3)

    # a dense cluster of SNPs every 20 bp in [5000, 5240): a read carrying
    # all alt alleles has too many "mismatches" for the plain pipeline
    coords = np.arange(5000, 5000 + 20 * N_SNP, 20, dtype=np.int64)
    code = {b: i for i, b in enumerate("ACGT")}
    alts = np.asarray([(code[seq[c]] + 1) % 4 for c in coords], dtype=np.uint8)
    db.add_snp_index(coords, alts)

    alt_read = list(seq[5000:5000 + 20 * N_SNP])
    for i, c in enumerate(coords):
        alt_read[c - 5000] = "ACGT"[alts[i]]
    return db, DeviceIndex.from_host(db), seq, "".join(alt_read)


def test_snps_from_iit(world):
    db, _, seq, _ = world
    # 1-based position 101 = univcoord 100
    ref = seq[100]
    alt = "ACGT"[("ACGT".index(ref) + 1) % 4]
    text = (f">rs1 chr1:101 {ref}{alt}\n"
            f">rsbad chr1:201 {'C' if seq[200] != 'C' else 'G'}T\n")
    iit = build_iit(parse_map_fasta(io.StringIO(text)))
    coords, alts = snps_from_iit(iit, db)
    assert list(coords) == [100]
    assert "ACGT"[alts[0]] == alt


def test_alt_genome_content(world):
    db, _, seq, alt_read = world
    from tpumap.utils import dna
    altg = dna.unpack_2bit(db.genomealt_packed, db.genome_length)
    window = dna.decode(altg[5000:5000 + len(alt_read)],
                        np.zeros(len(alt_read), bool))
    assert window == alt_read


def test_snp_tolerant_alignment(world):
    from tpumap.gsnap.driver import align_records
    from tpumap.gsnap.engine import AlignConfig
    from tpumap.io.fasta import Record

    db, index, seq, alt_read = world
    recs = [Record("alt", "", alt_read),
            Record("ref", "", seq[5000:5000 + len(alt_read)]),
            Record("alt1mm", "", "ACGT"[("ACGT".index(alt_read[105]) + 1) % 4]
                   .join([alt_read[:105], alt_read[106:]]))]

    # plain mode: the all-alt read counts every SNP as a mismatch
    plain = align_records(db, index, recs, AlignConfig())
    assert f"NM:i:{N_SNP}" in plain[0].tags

    tol = align_records(db, index, recs, AlignConfig(snp_tolerant=True))
    assert not (tol[0].flag & 4)
    assert tol[0].pos == 5001
    # NM stays reference-based; XW = mismatch vs BOTH ref and alt, XV =
    # SNP-explained mismatches (src/path-print-sam.c:932-945)
    assert f"NM:i:{N_SNP}" in tol[0].tags
    assert "XW:i:0" in tol[0].tags
    assert f"XV:i:{N_SNP}" in tol[0].tags
    # the reference-allele read still aligns perfectly
    assert tol[1].pos == 5001 and "NM:i:0" in tol[1].tags
    assert "XW:i:0" in tol[1].tags
    # a true (non-SNP) mismatch still counts in XW
    assert "XW:i:1" in tol[2].tags
