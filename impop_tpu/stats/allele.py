"""Statistics straight from haplotype-by-site allele matrices.

This is the TPU-native data path that subsumes the reference's external
native tools (SURVEY.md §2.2): where the reference shells out per window to

- ``impg similarity``  for an identity matrix (run_pica2_impg.sh:162-168),
- ``impg query | odgi | povu gfa2vcf | wc -l`` for the segregating-site
  count S (run_tajd.sh:126-148),

here a window is a dense [N, S] int matrix of allele codes (rows =
haplotypes, columns = variant sites; -1 = missing/pad) and everything
derives from it on-device:

- pairwise difference counts D[i,j] (→ identity matrix: 1 - D/L), as
  one-hot matmuls on the MXU rather than pairwise sequence alignment;
- S as a fused column reduction (count of polymorphic sites);
- the allele-frequency spectrum as a bincount over per-site minor/derived
  allele counts (the capability of wip/op-afs.py, without its
  first-allele-only quirk — op-afs.py:40-44).

Biallelic (0/1) windows take a fast path: D = r_i + r_j - 2·X Xᵀ, a single
f32 matmul.  Multiallelic codes use Σ_a X_a X_aᵀ over one-hot slices.
"""
from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "pairwise_diff",
    "pairwise_diff_biallelic",
    "identity_from_alleles",
    "segregating_sites",
    "allele_frequency_spectrum",
    "panel_afs",
    "AlleleWindowStats",
    "allele_window_stats",
]


def _site_valid(geno: jnp.ndarray, member: jnp.ndarray, site_mask: jnp.ndarray):
    """Validity of each (haplotype, site) cell: member row, active site,
    non-missing call (>= 0)."""
    return (geno >= 0) & member[:, None] & site_mask[None, :]


def pairwise_diff_biallelic(
    geno: jnp.ndarray,
    member: jnp.ndarray,
    site_mask: jnp.ndarray,
    site_weights: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pairwise difference counts for 0/1 allele codes.

    Returns (diff [N, N] f32, compared [N, N] f32) where ``compared`` counts
    sites at which both haplotypes have valid calls — the denominator for
    identity.  d_ij over valid sites = Σ_s (x_is - x_js)² = r_i + r_j - 2XXᵀ
    restricted to mutually-valid sites, i.e.
    d = (X·VᵀX?)  computed as  XVᵀ·(V - X) + (V - X)·(XV)ᵀ with
    X = geno·valid (zeros at invalid), V = valid:
    diff = X(V-X)ᵀ + (V-X)Xᵀ  — two f32 matmuls on the MXU.

    ``site_weights`` ([S] f32, optional) scales each site's contribution to
    ``diff`` — the column-mode identity contract (doc/how_stats.md): an
    indel of k bases carries weight k so differences count alignment
    COLUMNS rather than variant EVENTS.  ``compared`` stays unweighted (it
    is only a has-data mask denominator).  Counts stay exact in f32 as long
    as Σ weights < 2²⁴ per pair.
    """
    valid = _site_valid(geno, member, site_mask)
    v = valid.astype(jnp.float32)
    x = jnp.where(valid, geno, 0).astype(jnp.float32)
    xc = v - x  # complement within valid sites
    xw, xcw = x, xc
    prec = None
    if site_weights is not None:
        w = site_weights.astype(jnp.float32)[None, :]
        xw = x * w
        xcw = xc * w
        # weighted operands carry indel base lengths (values > 256 are
        # not bf16-exact); the unit-weight 0/1 operands stay DEFAULT
        prec = jax.lax.Precision.HIGHEST
    diff = (
        jnp.dot(xw, xc.T, preferred_element_type=jnp.float32,
                precision=prec)
        + jnp.dot(xcw, x.T, preferred_element_type=jnp.float32,
                  precision=prec)
    )
    compared = jnp.dot(v, v.T, preferred_element_type=jnp.float32)
    return diff, compared


def pairwise_diff(
    geno: jnp.ndarray,
    member: jnp.ndarray,
    site_mask: jnp.ndarray,
    num_alleles: int = 2,
    site_weights: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pairwise difference counts for general allele codes 0..num_alleles-1.

    match_ij = Σ_a (X==a)(X==a)ᵀ over valid sites; diff = compared - match.
    num_alleles is static (one matmul per allele value).  ``site_weights``
    as in :func:`pairwise_diff_biallelic`.
    """
    if num_alleles == 2:
        return pairwise_diff_biallelic(geno, member, site_mask, site_weights)
    valid = _site_valid(geno, member, site_mask)
    v = valid.astype(jnp.float32)
    compared = jnp.dot(v, v.T, preferred_element_type=jnp.float32)
    w = (site_weights.astype(jnp.float32)[None, :]
         if site_weights is not None else None)
    # weighted operands need HIGHEST (indel lengths are not bf16-exact)
    prec = None if w is None else jax.lax.Precision.HIGHEST
    vw = v if w is None else v * w
    compared_w = (compared if w is None
                  else jnp.dot(vw, v.T, preferred_element_type=jnp.float32,
                               precision=prec))
    match = jnp.zeros_like(compared)
    for a in range(num_alleles):
        xa = (jnp.where(valid, geno, -1) == a).astype(jnp.float32)
        xaw = xa if w is None else xa * w
        match = match + jnp.dot(xaw, xa.T,
                                preferred_element_type=jnp.float32,
                                precision=prec)
    return compared_w - match, compared


def identity_from_alleles(
    geno: jnp.ndarray,
    member: jnp.ndarray,
    site_mask: jnp.ndarray,
    length: jnp.ndarray,
    num_alleles: int = 2,
    site_weights: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Estimated identity matrix 1 - diff/length + presence mask.

    ``length`` is the window length in bp (monomorphic sites carry no
    difference, so dividing the variant-site difference count by the full
    window length reproduces the identity scale of ``impg similarity``).
    Pairs with zero mutually-valid sites are marked absent.
    ``site_weights`` selects column-mode identity (doc/how_stats.md:
    "Identity definition and impg parity").
    """
    n_cap, s_cap = geno.shape
    # int8-MXU formulations (z in {-1,0,1} / v in {0,1} Grams, exact
    # integer math): the PALLAS int8 kernel still wedges this backend's
    # remote Mosaic compile (r3/r4, >10-min hangs) and stays opt-in via
    # the gate inside ops/pairdiff; XLA's OWN int8 dot path compiles and
    # runs fine (r4 CLAUDE note, re-verified r5) and A/B-WINS the
    # long-window regime: 23.5-24.0 vs 21.3-22.4 Tcells/s against the
    # triangular resident Pallas kernel at [512, 8192] x 64, 4/4
    # interleaved reps (a block-triangular i8 XLA variant measured
    # 15.7-18.8 — the [N, N] block assembly swamps the skipped work).
    # IMPOP_TPU_I8_IDENTITY=0 opts out (backends whose compiler chokes
    # on int8 dots); =1 additionally forces it for short windows.
    i8_env = os.environ.get("IMPOP_TPU_I8_IDENTITY")
    if num_alleles == 2 and site_weights is None \
            and jax.default_backend() not in ("cpu",) \
            and (i8_env == "1"
                 or (i8_env != "0" and s_cap >= 2048)):
        from impop_tpu.ops.pairdiff import pairwise_identity_xla_i8

        return pairwise_identity_xla_i8(geno, member, site_mask, length)
    # Long biallelic windows use the fused Pallas kernel: the XLA path
    # materialises three [N, S] f32 operands in HBM before its matmuls,
    # which dominates once S reaches the thousands (the site-streaming
    # regime that removes the reference's 10 kb window cap).  Short
    # windows keep the XLA path: lowering this gate to the scan's S=128
    # caps was A/B'd on v5e and LOST (9.3 -> 13.6 us/window at
    # [512, 128] x 320 — the resident kernel's per-window VMEM setup and
    # tile-pair unroll are fixed costs that only pay off at large S;
    # tools/bench_panelstep.py round-4 log).
    if (
        num_alleles == 2
        and s_cap >= 2048
        and n_cap % 128 == 0
        and s_cap % 128 == 0
        and jax.default_backend() not in ("cpu",)
    ):
        from impop_tpu.ops.pairdiff import pairwise_identity_pallas

        tile_s = next(t for t in (512, 256, 128) if s_cap % t == 0)
        tile_n = next(t for t in (256, 128) if n_cap % t == 0)
        return pairwise_identity_pallas(
            geno, member, site_mask, length, tile_n=tile_n, tile_s=tile_s,
            site_weights=site_weights,
        )
    if (num_alleles == 2 and site_weights is None
            and jax.default_backend() not in ("cpu",)):
        # short-window TPU path: the z-Gram bf16 formulation (z = +1 alt /
        # -1 ref / 0 invalid, v = |z|; diff = (v·vᵀ − z·zᵀ)/2) — EXACT
        # (±1/0 exact in bf16, integer counts < 2²⁴ in f32 accumulation)
        # and two bf16 Grams instead of pairwise_diff's three f32 ones:
        # measured 10.2 → 8.8 us/window at the scan's [512, 128] x 320
        # shape (tools/bench_panelstep.py r4 log).  CPU keeps the f32
        # path (no fast bf16 dots there; tests compare the two).
        g2 = jnp.where(site_mask[None, :] & member[:, None], geno,
                       jnp.int8(-1))
        v = (g2 >= 0).astype(jnp.bfloat16)
        a = jnp.maximum(g2, 0).astype(jnp.bfloat16)
        z = a + a - v
        dims = (((1,), (1,)), ((), ()))
        zz = jax.lax.dot_general(z, z, dims,
                                 preferred_element_type=jnp.float32)
        vv = jax.lax.dot_general(v, v, dims,
                                 preferred_element_type=jnp.float32)
        diff = (vv - zz) * 0.5
        present = (vv > 0) & member[:, None] & member[None, :]
        sim = jnp.where(present, 1.0 - diff / jnp.maximum(length, 1.0),
                        0.0)
        eye = jnp.eye(member.shape[0], dtype=bool)
        diag = eye & member[:, None]
        return jnp.where(diag, 1.0, sim), present | diag
    diff, compared = pairwise_diff(geno, member, site_mask, num_alleles,
                                   site_weights)
    present = (compared > 0) & member[:, None] & member[None, :]
    sim = jnp.where(present, 1.0 - diff / jnp.maximum(length, 1.0), 0.0)
    n_cap = member.shape[0]
    eye = jnp.eye(n_cap, dtype=bool)
    diag = eye & member[:, None]
    sim = jnp.where(diag, 1.0, sim)
    # present includes the member diagonal on every backend (a member row
    # with ZERO valid calls still presents its self-pair) so the CPU
    # fallback agrees bit-for-bit with the TPU z-Gram / Pallas paths above
    # on the degenerate zero-coverage-member case (r4 advisor finding).
    return sim, present | diag


def segregating_sites(
    geno: jnp.ndarray, member: jnp.ndarray, site_mask: jnp.ndarray
) -> jnp.ndarray:
    """S = number of polymorphic columns (>= 2 distinct valid alleles).

    The fused-reduction replacement for the reference's
    ``povu gfa2vcf | grep -v '^#' | wc -l`` pipeline (run_tajd.sh:148): a
    site segregates iff max valid allele != min valid allele.
    """
    valid = _site_valid(geno, member, site_mask)
    # int32 widening looks wasteful (16 MB temps at [512, 8192]) but an
    # int8-sentinel variant was A/B'd on v5e and REVERTED: identical in
    # isolation (~43 us/window either way) yet 12x slower when fused in
    # the same program as the Pallas identity kernel (535 us — Mosaic/XLA
    # layout interaction); r4 A/B log
    big = jnp.iinfo(jnp.int32).max
    g = geno.astype(jnp.int32)
    col_min = jnp.min(jnp.where(valid, g, big), axis=0)
    col_max = jnp.max(jnp.where(valid, g, -1), axis=0)
    any_valid = jnp.any(valid, axis=0)
    poly = any_valid & (col_max > col_min)
    return jnp.sum(poly.astype(jnp.int32))


def allele_frequency_spectrum(
    geno: jnp.ndarray,
    member: jnp.ndarray,
    site_mask: jnp.ndarray,
    max_n: int,
    folded: bool = True,
) -> jnp.ndarray:
    """Site-frequency spectrum over polymorphic sites.

    Returns counts[k] = number of polymorphic sites whose non-reference
    (or minor, if folded) allele count equals k, for k in [0, max_n].
    Biallelic semantics: allele 1 is the derived/alternate state.
    """
    valid = _site_valid(geno, member, site_mask)
    ones = jnp.sum(jnp.where(valid, geno, 0).astype(jnp.int32), axis=0)
    total = jnp.sum(valid.astype(jnp.int32), axis=0)
    poly = (ones > 0) & (ones < total)
    count = ones
    if folded:
        count = jnp.minimum(ones, total - ones)
    count = jnp.where(poly, count, 0)
    hist = (
        jnp.zeros(max_n + 1, dtype=jnp.int32)
        .at[jnp.clip(count, 0, max_n)]
        .add(poly.astype(jnp.int32))
    )
    return hist


def panel_afs(
    geno: jnp.ndarray,
    member: jnp.ndarray,
    site_mask: jnp.ndarray,
    panels: jnp.ndarray,
    max_n: int,
    folded: bool = True,
) -> jnp.ndarray:
    """Per-panel SFS for one window: [P, max_n + 1] histograms.

    The tile-native genome-wide spectrum the reference cannot produce
    (wip/op-afs.py:26-45 reads text tables per window); panel masks are
    ANDed with ``member``.  Merge across windows/shards with a plain sum
    (counts are additive) or ``psum`` over a mesh axis.
    """
    return jax.vmap(
        lambda p: allele_frequency_spectrum(
            geno, member & p, site_mask, max_n, folded
        )
    )(panels)


class AlleleWindowStats(NamedTuple):
    """The fused per-window bundle the scan runtime emits."""

    pi_direct: jnp.ndarray  # mean pairwise difference count (π, absolute)
    s: jnp.ndarray          # segregating sites
    n: jnp.ndarray          # valid haplotypes
    afs: jnp.ndarray        # folded SFS histogram


def allele_window_stats(
    geno: jnp.ndarray,
    member: jnp.ndarray,
    site_mask: jnp.ndarray,
    max_n: int,
    num_alleles: int = 2,
) -> AlleleWindowStats:
    """π (direct mean pairwise difference), S and the SFS in one fused pass."""
    diff, compared = pairwise_diff(geno, member, site_mask, num_alleles)
    n_cap = member.shape[0]
    offdiag = ~jnp.eye(n_cap, dtype=bool)
    pair_ok = (compared > 0) & offdiag
    total = jnp.sum(jnp.where(pair_ok, diff, 0.0)) * 0.5
    pairs = jnp.sum(pair_ok.astype(jnp.float32)) * 0.5
    pi = jnp.where(pairs > 0, total / jnp.maximum(pairs, 1.0), 0.0)
    s = segregating_sites(geno, member, site_mask)
    n = jnp.sum(member.astype(jnp.int32))
    afs = allele_frequency_spectrum(geno, member, site_mask, max_n)
    return AlleleWindowStats(pi, s, n, afs)
