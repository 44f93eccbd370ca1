"""Clustering kernels: union-find replacement + panel expansion."""
import jax
import jax.numpy as jnp
import numpy as np

import oracle
from helpers import random_sim_case, tile_of

from impop_tpu.io.panels import canonicalize_identifier, expand_population
from impop_tpu.stats.grouping import label_components

CAP = 128

label_components_jit = jax.jit(
    lambda adj, member: label_components(adj, member)
)


def test_label_components_matches_union_find(rng):
    for trial in range(4):
        n = int(rng.integers(5, 100))
        sim_dict, sm = random_sim_case(rng, n, missing_frac=0.5, round_digits=3,
                                       low=0.990, high=1.0)
        threshold = 0.995
        rows = [(a, b, v) for (a, b), v in sim_dict.items()]
        want_clusters = oracle.union_find_clusters(rows, sm.names, threshold)
        want_label = {}
        for c in want_clusters:
            seed = min(c)
            for m in c:
                want_label[m] = seed

        tile = tile_of(sm, capacity=CAP)
        # af.py links pairs with value >= threshold (af.py:38)
        adj = (tile.sim >= threshold) & tile.present
        got = np.asarray(label_components_jit(adj, tile.member))
        for i, name in enumerate(sm.names):
            assert sm.names[got[i]] == want_label[name], (trial, name)


def test_canonicalize_identifier():
    # semantics of h-fst.py:18-61
    assert canonicalize_identifier("HG00097_hap1_hprc_r2_v1.0.1") == "HG00097#1#"
    assert canonicalize_identifier("HG00097_hap2_hprc_r2_v1.0.1") == "HG00097#2#"
    assert canonicalize_identifier("HG01891_mat_hprc_r2_v1.0.1") == "HG01891#1#"
    assert canonicalize_identifier("HG01891_pat_hprc_r2_v1.0.1") == "HG01891#2#"
    assert canonicalize_identifier("HG00097") == "HG00097#"
    assert canonicalize_identifier("HG00097#1#") == "HG00097#1#"
    assert canonicalize_identifier("HG00097#1") == "HG00097#1#"
    assert canonicalize_identifier("") == ""
    assert canonicalize_identifier("# comment") == ""


def test_expand_population():
    seqs = [
        "HG00097#1#CM094061.1:100-200",
        "HG00097#2#CM094062.1:100-200",
        "HG00171#1#CM094063.1:100-200",
        "CHM13#0#chr1:100-200",
    ]
    matched, missing = expand_population(
        ["HG00097_hap1_hprc_r2_v1.0.1", "HG00171", "NA12878_hap1_hprc_r2_v1.0.1"],
        seqs,
    )
    assert matched == {"HG00097#1#CM094061.1:100-200",
                       "HG00171#1#CM094063.1:100-200"}
    assert missing == ["NA12878_hap1_hprc_r2_v1.0.1"]
