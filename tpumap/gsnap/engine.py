"""GSNAP-style short-read alignment engine — batched cascade.

Replaces the reference's per-read method ladder (src/stage1hr-single.c:
Kmer_exact1 -> Extension_search -> Kmer_segment -> Kmer_prevalent, each
running only while found_score is insufficient) with a batched pipeline:
the whole `[B]` read batch flows through seed -> verify -> select under
masks; there are no per-read early exits, the cheap path IS the batch.

Round-1 scope: single-end, substitution-only alignments (the
KMER_EXACT1/PREVALENT + Genomebits_count equivalent). Indels, splices and
paired ends land on top of this skeleton.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpumap.index.device import DeviceIndex, INVALID_DIAG
from tpumap.ops import pack, seed, verify


@dataclass(frozen=True)
class AlignConfig:
    max_occ: int = 32          # per-oligo occurrence cap (overabundance)
    top_k: int = 8             # candidate diagonals per strand
    # Query oligos are sampled at EVERY position: with the genome index
    # sampled every `interval` bases, only 1-in-interval query offsets hit an
    # indexed position for any given alignment start, so skipping query
    # positions can miss alignments entirely (the reference also reads all
    # query oligos, src/stage1hr.c).
    qinterval: int = 1
    # alignment mode (src/mode.h Mode_T): standard | cmet-stranded |
    # atoi-stranded | ttoc-stranded; see ops/mode.py
    mode: str = "standard"
    # SNP-tolerant alignment (gsnap -v; requires a db prepared with
    # tpumap-snpindex): seeds from the snp-augmented index, mismatches
    # counted against ref OR alt allele
    snp_tolerant: bool = False
    max_mismatch_frac: float = 0.10   # unaligned if worse
    # N-base semantics (gsnap --query-unk-mismatch/--genome-unk-mismatch):
    # True = N counts as a mismatch, False = N matches anything
    # (reference defaults: query false, genome true — src/gsnap.c:336-337)
    query_unk_mismatch: bool = False
    genome_unk_mismatch: bool = True
    # end trimming / soft clips (src/path-trim.c, src/genomebits_trim.c;
    # gsnap --no-soft-clips sets soft_clips=False and mismatches are then
    # counted over the whole query, src/gsnap.c:553,697)
    soft_clips: bool = True
    # minimum fraction of the read that must stay aligned after trimming
    # for a clipped alignment to be reported (gsnap --min-coverage)
    min_coverage: float = 0.25


@partial(jax.jit, static_argnums=(2,))
def align_batch(index: DeviceIndex, batch, config: AlignConfig):
    """Align a read batch; returns per-read best hit info (device arrays).

    batch: dict with codes uint8[B, L], nmask bool[B, L], lengths int32[B].
    Returns dict: diag uint32[B] (univdiagonal of query base 0 on plus
    strand of the aligned read orientation), strand int32[B] (0 fwd/1 rc),
    nmismatch int32[B], second_nmismatch int32[B], mapped bool[B],
    n_best int32[B] (count of co-optimal candidates seen).
    """
    codes, nmask, lengths = batch["codes"], batch["nmask"], batch["lengths"]
    B, L = codes.shape

    rc_codes = pack.revcomp_codes(codes, lengths)
    # reverse the N flags via the same gather (N -> code 0 -> revcomp 3;
    # normal and padding positions end up 0)
    rc_nmask = pack.revcomp_codes(jnp.where(nmask, jnp.uint8(0), jnp.uint8(3)),
                                  lengths) == jnp.uint8(3)

    from tpumap.ops.mode import MODE_SPACES
    space_fwd, space_rc = MODE_SPACES[config.mode]

    snp = config.snp_tolerant

    def one_strand(c, m, space):
        packed = pack.pack_reads(c)
        nmask2 = pack.pack_reads(m.astype(jnp.uint8))
        diags, _counts = seed.seed_reads(index, c, m, lengths,
                                         max_occ=config.max_occ,
                                         top_k=config.top_k,
                                         qinterval=config.qinterval,
                                         space=space,
                                         index_space="snp" if snp else None)
        nmm = verify.verify_diagonals(index, packed, nmask2, lengths, diags,
                                      space=space, snp=snp,
                                      query_unk=config.query_unk_mismatch,
                                      genome_unk=config.genome_unk_mismatch)
        return diags, nmm

    fdiags, fnmm = one_strand(codes, nmask, space_fwd)
    rdiags, rnmm = one_strand(rc_codes, rc_nmask, space_rc)

    all_diags = jnp.concatenate([fdiags, rdiags], axis=1)
    all_nmm = jnp.concatenate([fnmm, rnmm], axis=1)
    K = fdiags.shape[1]
    strands = jnp.concatenate([jnp.zeros((B, K), jnp.int32),
                               jnp.ones((B, K), jnp.int32)], axis=1)
    return select_best(all_diags, all_nmm, strands, lengths, config)


def select_best(all_diags: jax.Array, all_nmm: jax.Array, strands: jax.Array,
                lengths: jax.Array, config: AlignConfig):
    """Rank candidates by mismatch count; emit best hit + MAPQ inputs."""
    B, K2 = all_diags.shape
    # mask duplicate candidates (same strand+diag) so n_best is meaningful
    sort_key = all_nmm * jnp.int32(2 ** 16) + jnp.arange(K2, dtype=jnp.int32)
    order = jnp.argsort(sort_key, axis=1)
    nmm_sorted = jnp.take_along_axis(all_nmm, order, axis=1)
    diag_sorted = jnp.take_along_axis(all_diags, order, axis=1)
    strand_sorted = jnp.take_along_axis(strands, order, axis=1)

    best_nmm = nmm_sorted[:, 0]
    best_diag = diag_sorted[:, 0]
    best_strand = strand_sorted[:, 0]

    is_best = nmm_sorted == best_nmm[:, None]
    dup = (diag_sorted == best_diag[:, None]) & (strand_sorted == best_strand[:, None])
    n_best = jnp.sum(is_best & ~dup, axis=1) + 1

    # second-best score among non-duplicate candidates
    second = jnp.where(dup, jnp.int32(2 ** 15), nmm_sorted)
    second_nmm = jnp.min(second, axis=1)

    max_nmm = (lengths.astype(jnp.float32) * config.max_mismatch_frac).astype(jnp.int32)
    mapped = (best_diag != INVALID_DIAG) & (best_nmm <= max_nmm)

    CAND_K = 8   # fixed width so cascade rungs can merge result dicts
    return {
        "diag": best_diag,
        "strand": best_strand,
        "nmismatch": best_nmm,
        "second_nmismatch": second_nmm,
        "n_best": n_best,
        "mapped": mapped,
        # ranked candidate lists for the downstream indel/splice stages
        "cand_diags": _pad_to(diag_sorted, CAND_K, jnp.uint32(0xFFFFFFFF)),
        "cand_strands": _pad_to(strand_sorted, CAND_K, jnp.int32(0)),
        "cand_nmm": _pad_to(nmm_sorted, CAND_K, jnp.int32(2 ** 15)),
    }


def _pad_to(arr: jax.Array, k: int, fill) -> jax.Array:
    B, n = arr.shape
    if n >= k:
        return arr[:, :k]
    return jnp.concatenate(
        [arr, jnp.full((B, k - n), fill, dtype=arr.dtype)], axis=1)


@partial(jax.jit, static_argnums=(2,))
def align_batch_ends(index: DeviceIndex, batch, config: AlignConfig):
    """Fast first rung of the cascade: end-oligo anchored candidates only.

    The KMER_EXACT1 analog (src/kmer-search.c Kmer_exact1): candidate
    diagonals come only from the first and last k-mers of the read (both
    strands), skipping the full per-position gather and the sort. Solves
    the overwhelming majority of DNA reads at a fraction of the cost; the
    remainder escalates to align_batch (the prevalent-diagonal rung) via
    align_batch_cascaded.
    """
    codes, nmask, lengths = batch["codes"], batch["nmask"], batch["lengths"]
    B, L = codes.shape
    k = index.k
    occ = config.max_occ
    from tpumap.ops.mode import CODE_MAPS, MODE_SPACES
    space_fwd, space_rc = MODE_SPACES[config.mode]

    if space_fwd is None and space_rc is None:
        # gather-free fast path (standard mode): rc oligos are computed
        # arithmetically from the fwd end-oligos (revcomp_kmer) and the rc
        # packed reads by bit reversal (revcomp_packed) — the [B, L]
        # per-element revcomp gather is the single most expensive op in
        # the rung otherwise
        return _ends_standard(index, codes, nmask, lengths, config)

    rc_codes = pack.revcomp_codes(codes, lengths)
    rc_nmask = pack.revcomp_codes(jnp.where(nmask, jnp.uint8(0), jnp.uint8(3)),
                                  lengths) == jnp.uint8(3)
    NE = 2 * _ends_iv(index)

    def end_candidates(c, m, space):
        if space is not None:
            c = jnp.take(jnp.asarray(CODE_MAPS[space]), c.astype(jnp.int32))
        offsets_a, positions_a = index.mode_index(
            "snp" if config.snp_tolerant else space)
        # oligos at q in {0..iv-1} and {qlast-iv+1..qlast}: one of each
        # group lands on an index-sampled genome position (interval iv)
        qpos_list = _end_qpos(index, lengths)
        oligo_list = []
        for qp in qpos_list:
            o = jnp.zeros((B,), jnp.uint32)
            for j in range(k):
                idx = jnp.minimum(qp + j, L - 1)
                o = (o << 2) | jnp.take_along_axis(
                    c, idx[:, None].astype(jnp.int32), axis=1)[:, 0].astype(jnp.uint32)
            oligo_list.append(o)
        oligos = jnp.stack(oligo_list, axis=1)                 # [B, NE]
        valid = jnp.ones((B, NE), jnp.bool_) & (lengths >= k)[:, None]
        qpos = jnp.stack(qpos_list, axis=1)
        # per-read qpos: lookup_diagonals wants shared qpos[NQ]; inline here
        start = jnp.take(offsets_a, oligos.astype(jnp.int32), mode="clip")
        end = jnp.take(offsets_a, oligos.astype(jnp.int32) + 1, mode="clip")
        count = (end - start).astype(jnp.int32)
        lane = jnp.arange(occ, dtype=jnp.int32)[None, None, :]
        idx = start.astype(jnp.int32)[..., None] + lane
        pos = jnp.take(positions_a, idx, mode="clip")
        ok = valid[..., None] & (lane < count[..., None]) & (count <= occ)[..., None]
        diag = pos - qpos[..., None].astype(jnp.uint32)
        bad = ~ok | (pos < qpos[..., None].astype(jnp.uint32))
        return jnp.where(bad, jnp.uint32(0xFFFFFFFF),
                         diag).reshape(B, NE * occ)

    fcands = _dedup_lanes(end_candidates(codes, nmask, space_fwd), ENDS_K)
    rcands = _dedup_lanes(end_candidates(rc_codes, rc_nmask, space_rc),
                          ENDS_K)

    # one fused verify for both strands: the window gather is the hot op
    # (its cost is per candidate lane), so lanes are deduplicated first and
    # the two strands stacked into a single call
    def packed_pair(c, m):
        return pack.pack_reads(c), pack.pack_reads(m.astype(jnp.uint8))

    fp, fn2 = packed_pair(codes, nmask)
    rp, rn2 = packed_pair(rc_codes, rc_nmask)
    if space_fwd == space_rc:
        stacked = verify.verify_diagonals(
            index, jnp.concatenate([fp, rp], axis=0),
            jnp.concatenate([fn2, rn2], axis=0),
            jnp.concatenate([lengths, lengths], axis=0),
            jnp.concatenate([fcands, rcands], axis=0),
            space=space_fwd, snp=config.snp_tolerant,
            query_unk=config.query_unk_mismatch,
            genome_unk=config.genome_unk_mismatch)
        fnmm, rnmm = stacked[:B], stacked[B:]
    else:
        fnmm = verify.verify_diagonals(index, fp, fn2, lengths, fcands,
                                       space=space_fwd,
                                       snp=config.snp_tolerant,
                                       query_unk=config.query_unk_mismatch,
                                       genome_unk=config.genome_unk_mismatch)
        rnmm = verify.verify_diagonals(index, rp, rn2, lengths, rcands,
                                       space=space_rc,
                                       snp=config.snp_tolerant,
                                       query_unk=config.query_unk_mismatch,
                                       genome_unk=config.genome_unk_mismatch)
    K = fcands.shape[1]
    all_diags = jnp.concatenate([fcands, rcands], axis=1)
    all_nmm = jnp.concatenate([fnmm, rnmm], axis=1)
    strands = jnp.concatenate([jnp.zeros((B, K), jnp.int32),
                               jnp.ones((B, K), jnp.int32)], axis=1)
    return select_best(all_diags, all_nmm, strands, lengths, config)



def _ends_iv(index) -> int:
    """End-oligo group size: one probe per sampled offset class, so a
    dense interval-1 index needs only {0} and {qlast} (3x fewer seed
    gathers — the HBM-for-gathers trade the device index exists for)."""
    return max(1, int(getattr(index, "interval", 3)))


def _end_qpos(index, lengths):
    k = index.k
    iv = _ends_iv(index)
    qlast = jnp.maximum(lengths - k, 0)
    return ([jnp.minimum(j, qlast) for j in range(iv)]
            + [jnp.maximum(qlast - j, 0) for j in range(iv - 1, -1, -1)])


def _ends_standard(index, codes, nmask, lengths, config: AlignConfig):
    """Standard-mode fast rung: end-anchored candidates, no code gathers."""
    B, L = codes.shape
    k = index.k
    occ = config.max_occ
    offsets_a, positions_a = index.mode_index(
        "snp" if config.snp_tolerant else None)

    qpos_list = _end_qpos(index, lengths)
    NE = len(qpos_list)
    fwd_qpos = jnp.stack(qpos_list, axis=1)               # [B, NE]
    # rolling k-mers over the whole read (k elementwise passes, NO
    # per-position gathers — gathered elements are the cost unit on this
    # chip), then one [B, 6] take for the end positions
    acc = jnp.zeros((B, L), jnp.uint32)
    for j in range(k):
        acc = (acc << 2) | jnp.roll(codes, -j, axis=1).astype(jnp.uint32)
    fwd_oligos = jnp.take_along_axis(acc, fwd_qpos.astype(jnp.int32),
                                     axis=1)              # [B, 6]
    # rc oligo at rc-position (len - k - q) == revcomp of fwd oligo at q;
    # all 6 end positions map onto the same 6 windows
    rc_oligos = pack.revcomp_kmer(fwd_oligos, k)
    rc_qpos = (lengths[:, None] - k - fwd_qpos).astype(jnp.int32)
    rc_qpos = jnp.maximum(rc_qpos, 0)

    def gather_diags(oligos, qpos):
        start = jnp.take(offsets_a, oligos.astype(jnp.int32), mode="clip")
        end = jnp.take(offsets_a, oligos.astype(jnp.int32) + 1, mode="clip")
        count = (end - start).astype(jnp.int32)
        lane = jnp.arange(occ, dtype=jnp.int32)[None, None, :]
        idx = start.astype(jnp.int32)[..., None] + lane
        pos = jnp.take(positions_a, idx, mode="clip")
        ok = ((lane < count[..., None]) & (count <= occ)[..., None]
              & (lengths >= k)[:, None, None])
        diag = pos - qpos[..., None].astype(jnp.uint32)
        bad = ~ok | (pos < qpos[..., None].astype(jnp.uint32))
        return jnp.where(bad, jnp.uint32(0xFFFFFFFF),
                         diag).reshape(B, NE * occ)

    fcands = _dedup_lanes(gather_diags(fwd_oligos, fwd_qpos), ENDS_K)
    rcands = _dedup_lanes(gather_diags(rc_oligos, rc_qpos), ENDS_K)

    packed = pack.pack_reads(codes)
    nmask2 = pack.pack_reads(nmask.astype(jnp.uint8))
    rc_packed = pack.revcomp_packed(packed, lengths)
    rc_nmask2 = pack.revcomp_packed(nmask2, lengths, complement=False)

    packed2 = jnp.concatenate([packed, rc_packed], axis=0)
    nmask22 = jnp.concatenate([nmask2, rc_nmask2], axis=0)
    lengths2 = jnp.concatenate([lengths, lengths], axis=0)
    cands2 = jnp.concatenate([fcands, rcands], axis=0)     # [2B, ENDS_K]

    if ENDS_K > ENDS_VERIFY_K:
        # probe prefilter: full verification gathers ~W words per lane;
        # ONE 16-base probe word ranks the lanes first so only the best
        # ENDS_VERIFY_K get the full gather (a wrong diagonal mismatches
        # ~12/16 probe bases; a true one ~0)
        cands2 = _probe_rank(index, packed2, lengths2, cands2,
                             ENDS_VERIFY_K)

    stacked = verify.verify_diagonals(
        index, packed2, nmask22, lengths2, cands2,
        snp=config.snp_tolerant,
        query_unk=config.query_unk_mismatch,
        genome_unk=config.genome_unk_mismatch)
    fnmm, rnmm = stacked[:B], stacked[B:]
    K = cands2.shape[1]
    all_diags = jnp.concatenate([cands2[:B], cands2[B:]], axis=1)
    all_nmm = jnp.concatenate([fnmm, rnmm], axis=1)
    strands = jnp.concatenate([jnp.zeros((B, K), jnp.int32),
                               jnp.ones((B, K), jnp.int32)], axis=1)
    return select_best(all_diags, all_nmm, strands, lengths, config)


ENDS_VERIFY_K = 3   # lanes fully verified after the probe prefilter


def _probe_rank(index, packed2: jax.Array, lengths2: jax.Array,
                cands2: jax.Array, keep: int) -> jax.Array:
    """Rank candidate lanes by a single mid-read 16-base probe word and
    keep the `keep` best (invalid lanes stay 0xFFFFFFFF and sort last)."""
    valid = cands2 != jnp.uint32(0xFFFFFFFF)
    # probe word index: a word fully inside the read for lengths >= 32
    # (length//32 => word at bases [16*w, 16*w+16) <= length for w>=1)
    pw = jnp.clip((lengths2 // 32).astype(jnp.int32), 0,
                  packed2.shape[1] - 1)
    rw = jnp.take_along_axis(packed2, pw[:, None], axis=1)[:, 0]
    starts = jnp.where(valid, cands2, 0) + (pw.astype(jnp.uint32) * 16)[:, None]
    gw = verify.extract_packed_window(index.genome_packed, starts, 1)[..., 0]
    diff = rw[:, None] ^ gw
    mm2 = (diff | (diff >> 1)) & jnp.uint32(0x55555555)
    probe_mm = jax.lax.population_count(mm2).astype(jnp.int32)
    probe_mm = jnp.where(valid, probe_mm, jnp.int32(999))
    _neg, top_idx = jax.lax.top_k(-probe_mm, keep)
    return jnp.take_along_axis(cands2, top_idx, axis=1)


ENDS_K = 8   # unique candidate lanes kept per strand in the fast rung


def _dedup_lanes(cands: jax.Array, keep: int) -> jax.Array:
    """Sort candidate lanes, drop duplicates, compact uniques to the
    front, keep the first `keep` lanes. The verify gather cost is per
    LANE (independent of address), so fewer unique lanes = linear savings
    (end-anchored candidates are massively duplicated: each end emits the
    same diagonal from up to 3 query offsets)."""
    s = jnp.sort(cands, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((s.shape[0], 1), bool), s[:, 1:] == s[:, :-1]], axis=1)
    s = jnp.where(dup, jnp.uint32(0xFFFFFFFF), s)
    s = jnp.sort(s, axis=1)          # compact: uniques first, INVALID last
    return s[:, :keep]


@partial(jax.jit, static_argnums=(2, 3, 4))
def align_batch_cascaded(index: DeviceIndex, batch, config: AlignConfig,
                         solved_nmm: int = 3, stage2_rows: int = 512):
    """Two-rung cascade in ONE jit: end-anchored fast path, then the full
    seed stage on a fixed-size on-device compaction of the unsolved reads.

    The TPU re-expression of the reference's per-read method ladder —
    no host round trip between rungs (device syncs are expensive on this
    backend), so up to `stage2_rows` unsolved reads per batch are gathered
    with top_k, re-aligned with the prevalent-diagonal rung, and scattered
    back where they improved. Batches with more unsolved rows than
    stage2_rows keep the fast-path result for the overflow (rare; size the
    constant for the workload's error profile).
    """
    codes, nmask, lengths = batch["codes"], batch["nmask"], batch["lengths"]
    B, L = codes.shape
    S = min(stage2_rows, B)
    res = align_batch_ends(index, batch, config)

    unsolved = res["nmismatch"] > solved_nmm
    # indices of up to S unsolved rows (priority by how bad they are)
    prio = jnp.where(unsolved, res["nmismatch"], -1)
    _, idx = jax.lax.top_k(prio, S)
    selected = jnp.take(unsolved, idx)

    sub = {
        "codes": jnp.take(codes, idx, axis=0),
        "nmask": jnp.take(nmask, idx, axis=0),
        "lengths": jnp.take(lengths, idx),
    }
    res2 = align_batch(index, sub, config)

    better = selected & (res2["nmismatch"] < jnp.take(res["nmismatch"], idx))
    out = {}
    for key in res:
        upd = jnp.where(_bcast(better, res2[key]), res2[key],
                        jnp.take(res[key], idx, axis=0))
        out[key] = res[key].at[idx].set(upd)
    # candidate lists: stage-2 rows get the UNION of both rungs' ranked
    # candidates regardless of which rung won on substitutions — the
    # prevalent rung can surface diagonals (e.g. a short middle exon) that
    # don't beat the ends rung on raw mismatches but that the downstream
    # chain-DP splice solver needs (Path_solve_from_diagonals consumes the
    # whole univdiagonal set, src/path-solve.c:4112)
    mcd, mcs, mcn = _merge_cand_lists(
        jnp.take(res["cand_diags"], idx, axis=0),
        jnp.take(res["cand_strands"], idx, axis=0),
        jnp.take(res["cand_nmm"], idx, axis=0),
        res2["cand_diags"], res2["cand_strands"], res2["cand_nmm"])
    sel_b = _bcast(selected, mcd)
    for key, merged in (("cand_diags", mcd), ("cand_strands", mcs),
                        ("cand_nmm", mcn)):
        keep = jnp.take(out[key], idx, axis=0)
        out[key] = out[key].at[idx].set(jnp.where(sel_b, merged, keep))
    # overflow visibility (VERDICT r1 weak #8): reads that wanted the
    # stage-2 rung but didn't fit in stage2_rows keep the fast-path
    # result SILENTLY otherwise; the count feeds the --stats histogram
    # (the reference's overabundance caps are visible the same way)
    n_uns = jnp.sum(unsolved.astype(jnp.int32))
    out["stage2_overflow"] = jnp.maximum(
        n_uns - jnp.sum(selected.astype(jnp.int32)), 0)
    if config.soft_clips:       # static: --no-soft-clips removes the stage
        out.update(_trim_stage(index, codes, nmask, lengths, out, config,
                               quals=batch.get("quals")))
    return out


def _trim_stage(index, codes, nmask, lengths, res, config: AlignConfig,
                quals=None):
    """End trimming of the best diagonal (Path_trim_qstart/qend +
    Genomebits_trim analog, src/path-trim.c): per-base mismatch mask in
    the aligned orientation -> max-scoring query subinterval. Runs inside
    the cascade jit; adds one window gather + prefix scans per batch.

    With quals (uint8[B, L], read order), also emits the quality-weighted
    MAPQ inputs (MAPQ_loglik_string role, src/mapq.c): mm_qualsum = sum
    of quality values at the best alignment's mismatch positions inside
    the kept interval, and qual_mean x16 over that interval."""
    from tpumap.ops import pathdp
    from tpumap.ops.mode import MODE_SPACES

    B, L = codes.shape
    packed = pack.pack_reads(codes)
    nmask2 = pack.pack_reads(nmask.astype(jnp.uint8))
    rc_packed = pack.revcomp_packed(packed, lengths)
    rc_nmask2 = pack.revcomp_packed(nmask2, lengths, complement=False)
    is_rc = (res["strand"] == 1)[:, None]
    sel_p = jnp.where(is_rc, rc_packed, packed)
    sel_n = jnp.where(is_rc, rc_nmask2, nmask2)
    space_fwd, space_rc = MODE_SPACES[config.mode]
    if space_fwd == space_rc:
        mm = verify.mismatch_mask_single(
            index, sel_p, sel_n, lengths, res["diag"], L,
            space=space_fwd, snp=config.snp_tolerant,
            query_unk=config.query_unk_mismatch,
            genome_unk=config.genome_unk_mismatch)
    else:
        mm_f = verify.mismatch_mask_single(
            index, sel_p, sel_n, lengths, res["diag"], L,
            space=space_fwd, snp=config.snp_tolerant,
            query_unk=config.query_unk_mismatch,
            genome_unk=config.genome_unk_mismatch)
        mm_r = verify.mismatch_mask_single(
            index, sel_p, sel_n, lengths, res["diag"], L,
            space=space_rc, snp=config.snp_tolerant,
            query_unk=config.query_unk_mismatch,
            genome_unk=config.genome_unk_mismatch)
        mm = jnp.where(is_rc, mm_r, mm_f)
    qs, qe, score, nmm_in = pathdp.trim_ends(mm, lengths)
    out = {"trim_qstart": qs, "trim_qend": qe, "trim_score": score,
           "trim_nmm": nmm_in}
    if quals is not None:
        idx = jnp.arange(L, dtype=jnp.int32)
        # orient quals like the alignment (plain reverse, length-aware)
        rev = jnp.clip(lengths[:, None] - 1 - idx, 0, L - 1)
        q_or = jnp.where(is_rc, jnp.take_along_axis(quals, rev, axis=1),
                         quals).astype(jnp.int32)
        kept = (idx >= qs[:, None]) & (idx < qe[:, None])
        out["mm_qualsum"] = jnp.sum(jnp.where(mm & kept, q_or, 0), axis=1)
        span = jnp.maximum(qe - qs, 1)
        out["qual_mean16"] = (16 * jnp.sum(jnp.where(kept, q_or, 0),
                                           axis=1)) // span
    return out


def _merge_cand_lists(cd_a, cs_a, cn_a, cd_b, cs_b, cn_b):
    """Union two ranked candidate lists [R, K] -> best K by nmm, dup-free.

    Duplicates (same strand+diagonal) keep the lower-nmm copy; INVALID
    lanes sort last. K is small (8) so the O((2K)^2) dup mask is cheap."""
    cd = jnp.concatenate([cd_a, cd_b], axis=1)
    cs = jnp.concatenate([cs_a, cs_b], axis=1)
    cn = jnp.concatenate([cn_a, cn_b], axis=1)
    K2 = cd.shape[1]
    lane = jnp.arange(K2, dtype=jnp.int32)
    key = jnp.where(cd == jnp.uint32(0xFFFFFFFF), jnp.int32(2 ** 20), cn)
    order = jnp.argsort(key * jnp.int32(K2) + lane, axis=1)
    cd = jnp.take_along_axis(cd, order, axis=1)
    cs = jnp.take_along_axis(cs, order, axis=1)
    cn = jnp.take_along_axis(cn, order, axis=1)
    same = ((cd[:, None, :] == cd[:, :, None])
            & (cs[:, None, :] == cs[:, :, None])
            & (lane[None, :] < lane[:, None])[None])   # j < i in rank order
    dup = jnp.any(same, axis=2)
    cd = jnp.where(dup, jnp.uint32(0xFFFFFFFF), cd)
    key2 = jnp.where(cd == jnp.uint32(0xFFFFFFFF), jnp.int32(2 ** 20), cn)
    order2 = jnp.argsort(key2 * jnp.int32(K2) + lane, axis=1)
    K = cd_a.shape[1]
    return (jnp.take_along_axis(cd, order2, axis=1)[:, :K],
            jnp.take_along_axis(cs, order2, axis=1)[:, :K],
            jnp.take_along_axis(cn, order2, axis=1)[:, :K])


def _bcast(mask: jax.Array, like: jax.Array) -> jax.Array:
    while mask.ndim < like.ndim:
        mask = mask[..., None]
    return mask


def indel_forward(index, codes: jax.Array, lengths: jax.Array,
                  diags: jax.Array, band: int, margin: int = 8):
    """Forward half of refine_indels: banded DP scores + direction
    matrix, NO traceback.  The fused ladder compacts rows on the DP
    score before walking the (sequential, per-step-gather) traceback —
    on this chip the traceback loop costs ~2/3 of the whole indel stage
    while only the few rows whose DP beats their substitution score
    ever need a transcript."""
    from tpumap.ops import dp

    B, L = codes.shape
    gstart = jnp.maximum(diags, jnp.uint32(margin)) - jnp.uint32(margin)
    W = L + band + margin
    gcodes = verify.extract_codes_window(index.genome_packed, gstart, W)
    glens = jnp.minimum(
        jnp.int32(W),
        (jnp.uint32(index.genome_length) - gstart).astype(jnp.int32))
    out = dp.banded_align(codes, lengths, gcodes, glens, band,
                          mode="glocal")
    out["gstart_off"] = (gstart.astype(jnp.int32)
                         - diags.astype(jnp.int32))
    return out


def indel_traceback(fwd, lengths: jax.Array, band: int):
    """Traceback half: edit transcripts + genome start offsets for the
    (compacted) rows of an indel_forward result."""
    from tpumap.ops import dp

    ops, k_final = dp.traceback(fwd["dirs"], lengths, fwd["end_k"], band)
    start_off = (k_final - band).astype(jnp.int32) + fwd["gstart_off"]
    return {"score": fwd["score"], "ops": ops, "start_off": start_off}


@partial(jax.jit, static_argnums=(4, 5))
def refine_indels(index, codes: jax.Array, lengths: jax.Array,
                  diags: jax.Array, band: int, margin: int = 8):
    """Banded-DP refinement around candidate diagonals (indel discovery).

    codes must be in the ALIGNED orientation (driver passes rc codes for
    strand-1 reads). The genome window starts `margin` bases before the
    diagonal so alignments whose true start precedes the seed diagonal
    (reads with leading insertions) stay in band; net deletions up to
    (band - margin) and insertions up to (band + margin) are reachable.

    Returns dict: score int32[B], ops uint8[B, S] (reverse transcripts),
    start_off int32[B] (alignment genome start relative to diag).
    """
    fwd = indel_forward(index, codes, lengths, diags, band, margin)
    return indel_traceback(fwd, lengths, band)


@jax.jit
def refine_splices(index, codes: jax.Array, nmask: jax.Array,
                   lengths: jax.Array, diagsA: jax.Array, diagsB: jax.Array,
                   known=None):
    """Score splice junctions for candidate diagonal pairs.

    Equivalent of the reference's Splice_resolve (src/splice.c): a read
    spanning one intron aligns its prefix on diagonal A and suffix on
    diagonal B (genomic; dB > dA); the exon boundary q* minimizes
    mismatches while favoring canonical dinucleotides.

    codes [B, L] aligned orientation; diagsA/diagsB [B, P] candidate pairs
    (INVALID-padded). known: optional dict of sorted uint32 device arrays
    {donor, acceptor, antidonor, antiacceptor} (0-based univcoords; see
    gsnap/knownsplicing.py) — boundaries landing on known sites get a
    bonus that outranks canonical dinucleotides, the Splice_resolve
    known-splice preference (src/splice.c, src/knownsplicing.c).
    Returns per pair: qstar int32[B, P], nmm int32[B, P]
    (total mismatches at the chosen boundary), bonus f32[B, P] (canonical
    score at the boundary), sense int32[B, P] (+1 GT-AG-side, -1 antisense,
    0 none).
    """
    B, L = codes.shape
    P = diagsA.shape[1]
    validp = (diagsA != jnp.uint32(0xFFFFFFFF)) & (diagsB != jnp.uint32(0xFFFFFFFF))
    dA = jnp.where(validp, diagsA, 0)
    dB = jnp.where(validp, diagsB, 0)

    # genome code windows on both diagonals: [B, P, L+1]
    gA = verify.extract_codes_window(index.genome_packed, dA, L + 1)
    gB = verify.extract_codes_window(index.genome_packed, dB, L + 1)
    q = codes[:, None, :]
    mmA = (q != gA[..., :L]) | nmask[:, None, :]
    mmB = (q != gB[..., :L]) | nmask[:, None, :]
    inlen = (jnp.arange(L)[None, None, :] < lengths[:, None, None])
    mmA = mmA & inlen
    mmB = mmB & inlen

    # boundary q* in [1, L-1]: prefix mm on A (q < q*), suffix mm on B
    prefA = jnp.cumsum(mmA, axis=2)                       # mm in [0, q]
    sufB_total = jnp.sum(mmB, axis=2, keepdims=True)
    prefB = jnp.cumsum(mmB, axis=2)
    # at boundary q*: cost = prefA[q*-1] + (total_B - prefB[q*-1])
    costs = prefA + (sufB_total - prefB)                  # index q*-1
    costs = costs[..., :L - 1].astype(jnp.float32)        # q* = 1..L-1

    # canonical dinucleotides: donor at gA[q*], gA[q*+1]; acceptor at
    # gB[q*-2], gB[q*-1]
    qs = jnp.arange(1, L, dtype=jnp.int32)
    don1 = gA[..., 1:L]
    don2 = gA[..., 2:L + 1]
    acc1 = jnp.where(qs[None, None, :] >= 2, gB[..., jnp.maximum(qs - 2, 0)], 4)
    acc2 = gB[..., 0:L - 1]
    # sense: GT..AG +2.0, GC..AG/AT..AC +1.2; antisense: CT..AC etc.
    def canon(a, b, c, d):
        gt_ag = (don1 == a) & (don2 == b) & (acc1 == c) & (acc2 == d)
        return gt_ag
    s_gtag = canon(2, 3, 0, 2)
    s_gcag = canon(2, 1, 0, 2)
    s_atac = canon(0, 3, 0, 1)
    a_ctac = canon(1, 3, 0, 1)
    a_ctgc = canon(1, 3, 2, 1)
    a_gtat = canon(2, 3, 0, 3)
    bonus = (jnp.where(s_gtag | a_ctac, 2.0,
                       jnp.where(s_gcag | a_ctgc, 1.2,
                                 jnp.where(s_atac | a_gtat, 0.8, 0.0)))
             .astype(jnp.float32))
    sense = jnp.where(s_gtag | s_gcag | s_atac, 1,
                      jnp.where(a_ctac | a_ctgc | a_gtat, -1, 0))

    if known is not None:
        from tpumap.gsnap.knownsplicing import coords_in_set
        # boundary univcoords at q*: left = first intron base on diagonal
        # A, right = first exon base on diagonal B
        left = dA[..., None] + qs[None, None, :].astype(jnp.uint32)
        right = dB[..., None] + qs[None, None, :].astype(jnp.uint32)
        known_s = (coords_in_set(known["donor"], left)
                   & coords_in_set(known["acceptor"], right))
        known_a = (coords_in_set(known["antiacceptor"], left)
                   & coords_in_set(known["antidonor"], right))
        bonus = jnp.where(known_s | known_a, bonus + 4.0, bonus)
        sense = jnp.where(known_s, 1, jnp.where(known_a, -1, sense))

    in_read = (qs[None, None, :] >= 1) & (qs[None, None, :] < lengths[:, None, None])
    score = jnp.where(in_read, bonus - 3.0 * costs, -jnp.inf)
    jbest = jnp.argmax(score, axis=2)
    qstar = jbest.astype(jnp.int32) + 1
    take = lambda arr: jnp.take_along_axis(arr, jbest[..., None], axis=2)[..., 0]
    nmm = take(costs).astype(jnp.int32)
    out_bonus = take(bonus)
    out_sense = take(sense).astype(jnp.int32)
    nmm = jnp.where(validp, nmm, lengths[:, None])
    return {"qstar": qstar, "nmm": nmm, "bonus": out_bonus,
            "sense": out_sense, "valid": validp}


def mapq_from_scores(nmm: np.ndarray, second: np.ndarray, n_best: np.ndarray,
                     lengths: np.ndarray, base_qual: float = 30.0,
                     mm_qualsum: np.ndarray | None = None,
                     qual_mean16: np.ndarray | None = None) -> np.ndarray:
    """MAPQ as the posterior error of the best alignment (src/mapq.c role).

    Candidate likelihood L_i = 10^(-loglik_i), loglik in phred/10 units.
    Without quality strings a flat per-mismatch quality Q is used
    (loglik_i = Q/10 * nmm_i).  With them (FASTQ input), the best
    alignment's loglik uses the REAL quality values at its mismatch
    positions (mm_qualsum, computed on device by the trim stage —
    MAPQ_loglik_string, src/mapq.h:20) and the runner-up is modeled at
    nmm=second mismatches of mean quality, so reads whose mismatches sit
    on low-quality bases keep high MAPQ while high-quality conflicts
    drop it:
    MAPQ = -10 log10 P(err), P(err) = (sum of other likelihoods) / (total).
    Multimappers (n_best > 1) get 0; the cap is 40.
    """
    if mm_qualsum is not None and qual_mean16 is not None:
        qbar = qual_mean16.astype(np.float64) / 16.0
        gap = np.clip((second.astype(np.float64) * qbar - mm_qualsum)
                      / base_qual, 0, 12)
    else:
        gap = np.clip(second - nmm, 0, 12).astype(np.float64)
    # runner-up likelihood relative to best; at gap 0 the runner-up is
    # equally likely (l2 = 1 -> MAPQ ~3), it must NOT drop out of the sum
    l2 = 10.0 ** (-(base_qual / 10.0) * gap)
    no_second = second >= 2 ** 15               # sentinel: no runner-up
    others = np.maximum(n_best - 1, 0).astype(np.float64) +         np.where(no_second, 0.0, l2)
    p_err = others / (1.0 + others)
    with np.errstate(divide="ignore"):
        mapq = np.where(p_err > 0, -10.0 * np.log10(p_err + 1e-12), 40.0)
    mapq = np.where(n_best > 1, 0.0, mapq)
    return np.clip(mapq, 0, 40).astype(np.int32)


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def align_batch_cascaded_packed(index: DeviceIndex, pbatch,
                                config: AlignConfig, L: int,
                                solved_nmm: int = 3,
                                stage2_rows: int = 512):
    """align_batch_cascaded fed by HOST-PACKED reads: pbatch holds
    packed uint32[B, W] (pack_reads_host), pnmask uint32[B, W] (N flags
    packed the same way) and lengths int32[B]. The 4x-smaller transfer
    matters on a tunnel-attached chip; codes are unpacked on device.

    N-free batches (the common case) may pass a (1, 1) pnmask stub:
    the mask is then materialized as device zeros instead of being
    transferred at all, halving host->device bytes."""
    codes = pack.unpack_reads(pbatch["packed"], L)
    if pbatch["pnmask"].shape == pbatch["packed"].shape:
        nmask = pack.unpack_reads(pbatch["pnmask"], L).astype(jnp.bool_)
    else:
        nmask = jnp.zeros(codes.shape, dtype=jnp.bool_)
    batch = {"codes": codes, "nmask": nmask, "lengths": pbatch["lengths"]}
    if "quals" in pbatch:
        batch["quals"] = pbatch["quals"]
    return align_batch_cascaded(index, batch, config, solved_nmm,
                                stage2_rows)
