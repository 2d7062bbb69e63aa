"""Paired-end alignment: concordance + mate rescue.

Capability analog of the reference's paired layer (src/stage1hr-paired.c
Stage1_paired_read, src/concordance.c, src/pathpair.c): both ends run
through the same batched cascade; concordant (diagonal, strand) pairs
within the insert window are selected jointly; an end whose mate is solved
but who has no candidate itself gets a window-scan rescue (the LOCAL_MATE
method) — a verify sweep over every diagonal in the mate window, which on
TPU is just a wider verify_diagonals call.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpumap.gsnap.engine import (AlignConfig, align_batch_cascaded,
                                 mapq_from_scores)
from tpumap.index.build import GenomeDB
from tpumap.index.device import DeviceIndex
from tpumap.io import sam
from tpumap.io.fasta import Record
from tpumap.ops import pack, verify
from tpumap.utils import dna


@partial(jax.jit, static_argnums=(3,))
def rescue_mate(index, codes: jax.Array, lengths: jax.Array, window: int,
                base_diags: jax.Array):
    """Scan every diagonal in [base, base+window) for the best mate fit.

    codes must already be oriented as the expected mate strand. Returns
    (best_diag uint32[B], best_nmm int32[B]).
    """
    B, L = codes.shape
    packed = pack.pack_reads(codes)
    nmask2 = jnp.zeros_like(packed)
    offs = jnp.arange(window, dtype=jnp.uint32)[None, :]
    diags = base_diags[:, None] + offs
    nmm = verify.verify_diagonals(index, packed, nmask2, lengths, diags)
    best = jnp.argmin(nmm, axis=1)
    return (jnp.take_along_axis(diags, best[:, None], axis=1)[:, 0],
            jnp.take_along_axis(nmm, best[:, None], axis=1)[:, 0])


def _concordant_pairs(cands1, cands2, L1, L2, pairmax,
                      orientation: str = "FR",
                      pairexpect: int | None = None):
    """Best concordant (c1, c2) candidate index pair or None.

    cands*: (diags uint32[K], strands int32[K], nmm int32[K]).
    FR/RF: ends on opposite strands (leftward end first for FR);
    FF (mate-pair same-strand protocols): both ends same strand
    (src/gsnap.c --orientation).
    """
    d1, s1, n1 = cands1
    d2, s2, n2 = cands2
    best = None
    for i in range(len(d1)):
        if d1[i] == 0xFFFFFFFF:
            continue
        for j in range(len(d2)):
            if d2[j] == 0xFFFFFFFF:
                continue
            if orientation == "FF":
                if s1[i] != s2[j]:
                    continue
            elif s1[i] == s2[j]:
                continue
            if orientation == "FF":
                insert = abs(int(d2[j]) - int(d1[i])) + max(L1, L2)
                ok = insert <= pairmax
            elif orientation == "RF":
                # read 1 reverse, read 2 forward, r2 upstream of r1
                if s1[i] == 1:
                    insert = int(d1[i]) + L1 - int(d2[j])
                    ok = 0 < insert <= pairmax and int(d2[j]) <= int(d1[i])
                else:
                    insert = int(d2[j]) + L2 - int(d1[i])
                    ok = 0 < insert <= pairmax and int(d1[i]) <= int(d2[j])
            elif s1[i] == 0:
                insert = int(d2[j]) + L2 - int(d1[i])
                ok = 0 < insert <= pairmax and int(d2[j]) >= int(d1[i])
            else:
                insert = int(d1[i]) + L1 - int(d2[j])
                ok = 0 < insert <= pairmax and int(d1[i]) >= int(d2[j])
            if not ok:
                continue
            score = int(n1[i]) + int(n2[j])
            # tie-break among equal-score pairings: insert length closest
            # to --pairexpect (src/gsnap.c expected_pairlength), else
            # smallest insert
            key = (score, abs(insert - pairexpect)
                   if pairexpect is not None else insert)
            if best is None or key < best[0]:
                best = (key, i, j, insert)
    return best


def align_paired_records(db: GenomeDB, index: DeviceIndex,
                         pairs: list[tuple[Record, Record]],
                         config: AlignConfig = AlignConfig(),
                         pairmax: int = 2000,
                         batch_size: int = 512,
                         novelsplicing: bool = False,
                         max_intron: int = 200_000,
                         known=None,
                         orientation: str = "FR",
                         pairexpect: int | None = None,
                         max_insertions: int = 6, max_deletions: int = 9,
                         indel_endlength: int = 4,
                         use_localdb: bool = True, known_indels=None
                         ) -> list[tuple[sam.SamRecord, sam.SamRecord]]:
    """Paired ends run the same refinement ladder as single ends
    (refine_unsolved: indels, splices incl. salvage, no fusions in the
    paired path) after concordance/mate-rescue, so paired RNA reads get
    junction records too (the Stage1_paired_read + Pathpair machinery,
    src/stage1hr-paired.c)."""
    from tpumap.gsnap.driver import (_pack_batch, make_batch,
                                     pad_to_bucket, refine_unsolved)

    from tpumap.gsnap.engine import align_batch_cascaded_packed

    def _dispatch(start):
        chunk = pairs[start:start + batch_size]
        flat = [r for p in chunk for r in p]
        B = pad_to_bucket(2 * len(chunk))
        L = pad_to_bucket(max(len(r.sequence) for r in flat))
        batch = make_batch(flat, B, L)
        dev = align_batch_cascaded_packed(index, _pack_batch(batch),
                                          config, L)
        return chunk, batch, L, dev

    out = []
    starts = list(range(0, len(pairs), batch_size))
    pending = _dispatch(starts[0]) if starts else None
    for si, start in enumerate(starts):
        chunk, batch, L, dev = pending
        pending = (_dispatch(starts[si + 1])
                   if si + 1 < len(starts) else None)
        n = len(chunk)
        res = {k: np.asarray(v) for k, v in dev.items()}

        # mate rescue where exactly one end has candidates
        rescue_rows = []
        for p in range(n):
            i1, i2 = 2 * p, 2 * p + 1
            ok1 = res["mapped"][i1]
            ok2 = res["mapped"][i2]
            if ok1 != ok2:
                rescue_rows.append((p, i2 if ok1 else i1, i1 if ok1 else i2))
        rescued = {}
        if rescue_rows:
            nb = pad_to_bucket(len(rescue_rows))
            codes = np.zeros((nb, L), np.uint8)
            lengths = np.ones(nb, np.int32)
            bases = np.zeros(nb, np.uint32)
            for row, (p, bad, good) in enumerate(rescue_rows):
                li = int(batch["lengths"][bad])
                c = batch["codes"][bad][:li]
                # expected mate orientation = opposite of the solved end
                want_strand = 1 - int(res["strand"][good])
                if want_strand:
                    c = dna.revcomp_codes(c)
                codes[row, :li] = c
                lengths[row] = li
                gd = int(res["diag"][good])
                if int(res["strand"][good]) == 0:
                    base = gd
                else:
                    base = max(gd + int(batch["lengths"][good]) - pairmax, 0)
                bases[row] = base
            bd, bn = rescue_mate(index, jnp.asarray(codes),
                                 jnp.asarray(lengths), pairmax,
                                 jnp.asarray(bases))
            bd, bn = np.asarray(bd), np.asarray(bn)
            for row, (p, bad, good) in enumerate(rescue_rows):
                li = int(batch["lengths"][bad])
                if bn[row] <= int(li * config.max_mismatch_frac):
                    rescued[bad] = (int(bd[row]), 1 - int(res["strand"][good]),
                                    int(bn[row]))

        mapq = mapq_from_scores(res["nmismatch"], res["second_nmismatch"],
                                res["n_best"], batch["lengths"])

        dp_result, splice_result, _fus = refine_unsolved(
            db, index, batch, res, config, novelsplicing=novelsplicing,
            max_intron=max_intron, known=known, L=L,
            max_insertions=max_insertions, max_deletions=max_deletions,
            indel_endlength=indel_endlength, use_localdb=use_localdb,
            known_indels=known_indels)

        for p in range(n):
            i1, i2 = 2 * p, 2 * p + 1
            r1, r2 = chunk[p]
            L1 = int(batch["lengths"][i1])
            L2 = int(batch["lengths"][i2])

            def end_info(i):
                if i in rescued:
                    return rescued[i]
                if res["mapped"][i]:
                    return (int(res["diag"][i]), int(res["strand"][i]),
                            int(res["nmismatch"][i]))
                return None

            # prefer a jointly-concordant candidate combination
            cand = _concordant_pairs(
                (res["cand_diags"][i1], res["cand_strands"][i1],
                 res["cand_nmm"][i1]),
                (res["cand_diags"][i2], res["cand_strands"][i2],
                 res["cand_nmm"][i2]), L1, L2, pairmax,
                orientation=orientation, pairexpect=pairexpect)
            e1, e2 = end_info(i1), end_info(i2)
            if cand is not None:
                _, ci, cj, insert = cand
                nm1 = int(res["cand_nmm"][i1][ci])
                nm2 = int(res["cand_nmm"][i2][cj])
                if (nm1 <= L1 * config.max_mismatch_frac
                        and nm2 <= L2 * config.max_mismatch_frac):
                    e1 = (int(res["cand_diags"][i1][ci]),
                          int(res["cand_strands"][i1][ci]), nm1)
                    e2 = (int(res["cand_diags"][i2][cj]),
                          int(res["cand_strands"][i2][cj]), nm2)
            out.append(_emit_pair(db, r1, r2, e1, e2, int(mapq[i1]),
                                  int(mapq[i2]), pairmax,
                                  special={
                                      k: _special_record(
                                          db, chunk[p][0 if k == i1 else 1],
                                          idx, res, dp_result,
                                          splice_result,
                                          int(batch["lengths"][idx]),
                                          config, int(mapq[idx]))
                                      for k, idx in ((i1, i1), (i2, i2))},
                                  keys=(i1, i2)))
    return out


def _special_record(db, rec, i, res, dp_result, splice_result, li, config,
                    mq):
    """A spliced or gapped record for batch row i if the refinement ladder
    produced one that beats the substitution alignment; else None."""
    max_equiv = int(li * config.max_mismatch_frac)
    if i in splice_result:
        s = splice_result[i]
        if (3 * li - s["score"]) // 6 <= max_equiv:
            return (sam.spliced_record(
                db, rec.accession, rec.sequence, rec.quality,
                s["dA"], s["dB"], s["qstar"], li, s["strand"],
                mq, s["sense"]), s["dA"], s["strand"])
    if i in dp_result:
        from tpumap.ops import dp as dp_ops
        pos0, ops, score = dp_result[i]
        if (3 * li - score) // 6 <= max_equiv:
            return (sam.gapped_record(
                db, rec.accession, rec.sequence, rec.quality, pos0,
                int(res["strand"][i]), mq, ops), pos0,
                int(res["strand"][i]))
    return None


def _emit_pair(db, r1, r2, e1, e2, mq1, mq2, pairmax, special=None,
               keys=(None, None)):
    special = special or {}
    recs = []
    for (rec, e, mq, other, first, key) in (
            (r1, e1, mq1, e2, True, keys[0]),
            (r2, e2, mq2, e1, False, keys[1])):
        sp = special.get(key)
        if sp is not None:
            # refinement ladder produced a spliced/gapped record; its
            # position supersedes the substitution placement
            s, diag, strand = sp
            e = (diag, strand, 0)
        elif e is None:
            s = sam.unmapped_record(rec.accession, rec.sequence, rec.quality)
        else:
            s = sam.ungapped_record(db, rec.accession, rec.sequence,
                                    rec.quality, e[0], e[1], mq, e[2])
        if sp is not None and first:
            e1 = e
        elif sp is not None:
            e2 = e
        s.flag |= 0x1 | (0x40 if first else 0x80)
        if e is None:
            s.flag |= 0x4
        if other is None:
            s.flag |= 0x8
        else:
            if other[1]:
                s.flag |= 0x20
            rname, chrpos = db.chrpos(other[0])
            s.rnext = "=" if (e is not None and s.rname == rname) else rname
            s.pnext = chrpos + 1
        recs.append(s)
    r1s, r2s = recs
    # proper pair + TLEN when both mapped on opposite strands within range
    if e1 is not None and e2 is not None and e1[1] != e2[1]:
        lo = min(e1[0], e2[0])
        hi = max(e1[0] + len(r1.sequence), e2[0] + len(r2.sequence))
        tlen = hi - lo
        if tlen <= pairmax:
            r1s.flag |= 0x2
            r2s.flag |= 0x2
            sign1 = 1 if e1[0] <= e2[0] else -1
            r1s.tlen = sign1 * tlen
            r2s.tlen = -sign1 * tlen
    return r1s, r2s
