"""Native consensus core (native/poacns.cpp) must be bit-identical to
the pure-Python POA path (consensus/poa.py + window.py), which is the
specification and is itself golden-tested against the reference pa_cns
binary (tests/test_golden_reference.py)."""

import numpy as np
import pytest

from aligngraph2_tpu.align.aligner import LongReadAligner
from aligngraph2_tpu.config import AlignerConfig, ConsensusConfig
from aligngraph2_tpu.consensus.native import (consensus_backbone_native,
                                              get_lib)
from aligngraph2_tpu.consensus.window import consensus_backbone
from aligngraph2_tpu.io.seqdb import SeqDatabase
from tests.synth import mutate, random_genome, sample_reads

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native toolchain unavailable")


def acfg():
    return AlignerConfig(seed_k=11, band_width=128, min_aln_len=150,
                         min_block_hits=3, chunk_len=1500, delta=0.5)


@pytest.mark.parametrize("seed,blen,window", [(0, 2500, 1000),
                                              (1, 4000, 700),
                                              (2, 1200, 1200)])
def test_native_matches_python(seed, blen, window):
    rng = np.random.default_rng(seed)
    true_seq = random_genome(rng, blen)
    backbone = mutate(rng, true_seq, sub=0.02, ins=0.01, dele=0.01)
    reads = sample_reads(rng, true_seq, coverage=12, mean_len=600, err=0.03)
    alns = LongReadAligner(SeqDatabase([("bb", backbone)]),
                           acfg()).align_reads(SeqDatabase(reads))
    cfg = ConsensusConfig(window=window, top_k=50, alpha=250)
    py = consensus_backbone(backbone, alns, cfg, threads=1,
                            use_native=False)
    nat = consensus_backbone_native(backbone, list(alns), cfg.window,
                                    cfg.top_k, cfg.alpha, cfg.min_weight,
                                    threads=1)
    assert nat == py
    # threaded native must agree with single-threaded
    nat4 = consensus_backbone_native(backbone, list(alns), cfg.window,
                                     cfg.top_k, cfg.alpha, cfg.min_weight,
                                     threads=4)
    assert nat4 == py


def test_native_empty_and_edge_cases():
    cfg = ConsensusConfig(window=100, top_k=10, alpha=250)
    # no alignments: consensus of the bare backbone
    bb = "ACGT" * 50
    py = consensus_backbone(bb, [], cfg, threads=1, use_native=False)
    nat = consensus_backbone_native(bb, [], cfg.window, cfg.top_k,
                                    cfg.alpha, cfg.min_weight, 1)
    assert nat == py
    # empty backbone
    assert consensus_backbone_native("", [], cfg.window, cfg.top_k,
                                     cfg.alpha, cfg.min_weight, 1) == ""
