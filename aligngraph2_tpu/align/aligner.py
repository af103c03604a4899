"""High-level seed-extend long-read aligner.

Drop-in replacement for every external aligner invocation in the reference
driver (/root/reference/AlignGraph2.py:232-296,306-355,478-485):

  * reads -> contigs        (mecat2ref)
  * reads -> similar genome (mecat2ref+ with alpha/beta/delta)
  * contigs -> genome       (long2ref chunking, replacing the nucmer path)
  * reads -> new backbones  (consensus prep)

One code path: build a SeedIndex over the target database, find candidate
(target, strand, diagonal) triples per query, extend each with the adaptive
banded DP kernel, and emit 3-line ".ref"-compatible alignment records.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ..config import AlignerConfig
from ..io.seqdb import SeqDatabase, revcomp_codes
from ..ops.banded_dp import banded_align, traceback, moves_to_strings
from ..ops.kmer import kmer_codes_np
from ..ops.seedextend import Candidate, SeedIndex, find_candidates
from .records import Alignment, AlignmentSet


def _bucket(n: int, lo: int = 512) -> int:
    """Length bucket for batch shapes.  Coarse on purpose: every distinct
    bucket costs a kernel compile (expensive through the remote-compile
    relay), so trade some padding waste for very few shapes."""
    for b in (512, 2048, 8192, 32768):
        if n <= b:
            return b
    b = 32768
    while b < n:
        b <<= 1
    return b


class LongReadAligner:
    def __init__(self, target_db: SeqDatabase, cfg: AlignerConfig,
                 use_pallas: bool | None = None, progress: bool = False):
        self.db = target_db
        self.cfg = cfg
        self.index = SeedIndex(target_db, cfg.seed_k,
                               stride=cfg.seed_stride)
        if use_pallas is None:
            import jax
            use_pallas = jax.default_backend() not in ("cpu",)
        self.use_pallas = use_pallas
        self.progress = progress

    # ---------------- candidate generation ----------------

    def _read_candidates(self, codes_f: np.ndarray) -> List[Candidate]:
        cfg = self.cfg
        codes_r = revcomp_codes(codes_f)
        qk_f = kmer_codes_np(codes_f, cfg.seed_k)
        qk_r = kmer_codes_np(codes_r, cfg.seed_k)
        return find_candidates(
            self.index, qk_f, qk_r, bin_w=max(cfg.band_width // 2, 32),
            max_candidates=cfg.max_candidates,
            min_hits=cfg.min_block_hits, alpha=cfg.alpha, beta=cfg.beta)

    # ---------------- extension ----------------

    def align_reads(self, read_db: SeqDatabase,
                    ids: Sequence[int] | None = None) -> AlignmentSet:
        cfg = self.cfg
        W = cfg.band_width
        if ids is None:
            ids = range(len(read_db))
        # ultra-long outliers would explode the padded DP stream; skip them
        ids = [r for r in ids if read_db.size(r) <= cfg.max_read_len]

        # phase 1: batched seeding (host, one searchsorted per chunk)
        from ..ops.seedextend import find_candidates_batch
        cand_map = find_candidates_batch(
            self.index, read_db, list(ids),
            bin_w=max(cfg.band_width // 2, 32),
            max_candidates=cfg.max_candidates,
            min_hits=cfg.min_block_hits, alpha=cfg.alpha, beta=cfg.beta)
        jobs = []  # (rid, cand, codes_aligned_strand)
        for rid, cands in cand_map.items():
            if not cands:
                continue
            codes_f = read_db.get_codes(rid)
            for cand in cands:
                codes = codes_f if cand.forward else revcomp_codes(codes_f)
                jobs.append((rid, cand, codes))

        # phase 2: banded extension, batched by length bucket
        jobs.sort(key=lambda j: len(j[2]))
        out = AlignmentSet()
        best_per_read: dict[int, int] = {}
        from ..utils.timing import Progress
        bar = Progress(len(jobs), enabled=self.progress)
        i = 0
        while i < len(jobs):
            NQ = _bucket(len(jobs[i][2]))
            pallas_ok = self.use_pallas and NQ <= 32768
            B = self._batch_size(NQ, pallas_ok)
            batch = []
            while i < len(jobs) and len(batch) < B \
                    and _bucket(len(jobs[i][2])) == NQ:
                batch.append(jobs[i])
                i += 1
            if pallas_ok:
                self._extend_batch_pallas(read_db, batch, NQ, out,
                                          best_per_read)
            else:
                self._extend_batch(read_db, batch, NQ, NQ + 2 * W, out,
                                   best_per_read)
            bar.update(len(batch))

        # delta filter: drop alignments scoring < delta * read best
        # (recovered mecat2ref+ '-y delta' semantics, see seedextend.py)
        kept = [a for a in out
                if a.score >= cfg.delta * best_per_read.get(
                    a.query_name, a.score)]
        res = AlignmentSet(kept)
        res.sort_by_score()
        return res

    def _batch_size(self, NQ: int, pallas: bool) -> int:
        if pallas:
            # bound the dirs stream to ~4 GB; big batches amortize the
            # latency-bound traceback steps across lanes (measured: B=1024
            # is ~25% faster per cell than B=512 on one chip)
            W = max(self.cfg.band_width, 256)
            b = (4 << 30) // (NQ * W)
            return int(np.clip(b // 128 * 128, 128, 1024))
        return max(1, min(64, (64 << 20) // (NQ * self.cfg.band_width)))

    def _emit(self, read_db, rid, cand, codes, score, qstr, tstr,
              qb, qe, rb, re, out: AlignmentSet, best_per_read) -> None:
        cfg = self.cfg
        if qe - qb < cfg.min_aln_len:
            return
        qa = np.frombuffer(qstr.encode(), np.uint8)
        ta = np.frombuffer(tstr.encode(), np.uint8)
        matches = int(np.count_nonzero(qa == ta))
        if matches < cfg.min_identity * len(qstr):
            return
        n = len(codes)
        if cand.forward:
            qb_f, qe_f = qb, qe
        else:
            qb_f, qe_f = n - qe, n - qb
        a = Alignment(
            query_name=read_db.names[rid],
            ref_name=self.db.names[cand.tid],
            forward=cand.forward, score=score,
            qb=qb_f, qe=qe_f, qsize=n,
            rb=rb, re=re, rsize=self.db.size(cand.tid),
            qstr=qstr, tstr=tstr)
        if self._is_duplicate(out, a):
            return
        out.append(a)
        if score > best_per_read.get(a.query_name, 0):
            best_per_read[a.query_name] = score

    def _extend_batch_pallas(self, read_db: SeqDatabase, batch, NQ,
                             out: AlignmentSet, best_per_read) -> None:
        """Pallas fast path: static band in the standard frame."""
        from ..ops.banded_pallas import (Q_SENTINEL, banded_align_pallas,
                                         standard_frame_windows,
                                         traceback_fast)
        cfg = self.cfg
        W = max(cfg.band_width, 256)
        TB = 128
        B = ((len(batch) + TB - 1) // TB) * TB
        q = np.full((B, NQ), Q_SENTINEL, np.uint8)
        t_codes = []
        diags = []
        for b, (rid, cand, codes) in enumerate(batch):
            q[b, :len(codes)] = codes
            t_codes.append(self.db.get_codes(cand.tid))
            diags.append(cand.diag)
        t_codes += [np.zeros(0, np.uint8)] * (B - len(batch))
        diags += [0] * (B - len(batch))
        t, starts = standard_frame_windows(t_codes, diags, NQ, W)
        res = banded_align_pallas(q, t, W=W, match=cfg.match_score,
                                  mismatch=cfg.mismatch_score,
                                  gap=cfg.gap_score)
        # traceback_fast ≡ traceback_t output-wise but walks packed
        # 16-row direction words: one gather per DIAG run instead of one
        # per move (measured 31s -> 1.4s per 1024x8192 batch on one chip)
        moves, nmoves, si, sj = traceback_fast(res.dirs_t, res.best_i,
                                               res.best_j,
                                               max_steps=2 * NQ + W, W=W)
        scores = np.asarray(res.score)
        for b, (rid, cand, codes) in enumerate(batch):
            score = int(scores[b])
            if score <= 0:
                continue
            qb = int(si[b])
            tb = int(si[b] + sj[b])   # standard frame: p = i + j
            win = np.minimum(t[b], 3)  # sentinel-safe decode
            qstr, tstr, qe, te = moves_to_strings(moves[b], codes, qb, tb,
                                                  win)
            rb = int(starts[b] + tb)
            re = int(starts[b] + te)
            if rb < 0 or re > self.db.size(cand.tid):
                continue  # degenerate path through sentinel padding
            self._emit(read_db, rid, cand, codes, score, qstr, tstr,
                       qb, qe, rb, re, out, best_per_read)

    def _extend_batch(self, read_db: SeqDatabase, batch, NQ, NT,
                      out: AlignmentSet, best_per_read) -> None:
        cfg = self.cfg
        W = cfg.band_width
        # fixed batch shape per bucket: pad with inert jobs so jit compiles
        # once per (B, NQ) bucket instead of once per ragged batch
        B = self._batch_size(NQ, False)
        q = np.zeros((B, NQ), np.uint8)
        t = np.zeros((B, NT), np.uint8)
        qlen = np.zeros(B, np.int32)
        tlen = np.zeros(B, np.int32)
        c0 = np.zeros(B, np.int32)
        ws_arr = np.zeros(B, np.int64)
        for b, (rid, cand, codes) in enumerate(batch):
            n = len(codes)
            q[b, :n] = codes
            qlen[b] = n
            tcodes = self.db.get_codes(cand.tid)
            ws = max(0, cand.diag - W)
            win = tcodes[ws:ws + NT]
            t[b, :len(win)] = win
            tlen[b] = len(win)
            c0[b] = cand.diag - ws
            ws_arr[b] = ws

        res = banded_align(q, qlen, t, tlen, c0, W=W,
                           match=cfg.match_score,
                           mismatch=cfg.mismatch_score, gap=cfg.gap_score)
        moves, nmoves, si, sj = traceback(res.dirs, res.centers,
                                          res.best_i, res.best_j,
                                          max_steps=NQ + NT)
        moves = np.asarray(moves)
        centers = np.asarray(res.centers)
        scores = np.asarray(res.score)
        si = np.asarray(si)
        sj = np.asarray(sj)

        for b, (rid, cand, codes) in enumerate(batch):
            score = int(scores[b])
            if score <= 0:
                continue
            qb = int(si[b])
            tb = int(si[b] + centers[b][si[b]] - W // 2 + sj[b])
            tcodes = self.db.get_codes(cand.tid)
            win = tcodes[ws_arr[b]:ws_arr[b] + NT]
            qstr, tstr, qe, te = moves_to_strings(moves[b], codes, qb, tb,
                                                  win)
            rb = int(ws_arr[b] + tb)
            re = int(ws_arr[b] + te)
            self._emit(read_db, rid, cand, codes, score, qstr, tstr,
                       qb, qe, rb, re, out, best_per_read)

    @staticmethod
    def _is_duplicate(out: AlignmentSet, a: Alignment) -> bool:
        """Adjacent seeding candidates can converge to the same alignment
        after band drift; keep the first (higher-ranked) one."""
        for other in out.alignments[-8:]:
            if (other.query_name == a.query_name
                    and other.ref_name == a.ref_name
                    and other.forward == a.forward
                    and min(other.re, a.re) - max(other.rb, a.rb)
                    > 0.5 * (a.re - a.rb)):
                return True
        return False


def align_chunked(target_db: SeqDatabase, query_db: SeqDatabase,
                  cfg: AlignerConfig, progress: bool = False
                  ) -> AlignmentSet:
    """Contig->reference alignment via fixed-size pseudo-reads.

    Mirrors script/long2ref.py: chunk each contig into ``chunk_len`` pieces,
    align the pieces, then rewrite coordinates back to whole-contig space.
    The emitted records use the 10-field header the reference's
    MummerAlignDatabaseV2 consumes.
    """
    chunk = cfg.chunk_len
    pieces = []
    origin = []  # (ctg_id, chunk_idx)
    for cid in range(len(query_db)):
        codes = query_db.get_codes(cid)
        n_parts = (len(codes) + chunk - 1) // chunk
        for p in range(n_parts):
            s = p * chunk
            e = min(len(codes), (p + 1) * chunk)
            pieces.append((f"{cid}_{p}",
                           codes[s:e]))
            origin.append((cid, p))

    from ..io.seqdb import decode_seq
    piece_db = SeqDatabase((nm, decode_seq(c)) for nm, c in pieces)
    aligner = LongReadAligner(target_db, cfg, progress=progress)
    raw = aligner.align_reads(piece_db)

    out = AlignmentSet()
    for a in raw:
        cid_s, p_s = a.query_name.split("_")
        cid, p = int(cid_s), int(p_s)
        offset = p * chunk
        out.append(Alignment(
            query_name=query_db.names[cid], ref_name=a.ref_name,
            forward=a.forward, score=a.score,
            qb=a.qb + offset, qe=a.qe + offset,
            qsize=query_db.size(cid),
            rb=a.rb, re=a.re, rsize=a.rsize,
            qstr=a.qstr, tstr=a.tstr))
    return out
