"""Window variation graph export (GFA v1).

The reference's graph path obtains a window GFA from ``impg query -o gfa``
and normalises it with odgi (run_tajd.sh:126-144, run_pica2_odgi.sh:74-83)
purely as an intermediate for variant counting and path similarity.  Here the
graph is *derived from* the extracted variant matrix: the reference backbone
is split at variant boundaries into segments, each variant contributes an
alternate segment (insertions/substitutions) or a skipping edge (deletions),
and every haplotype's walk through the graph is emitted as a GFA path — so
downstream graph tooling (odgi, vg) can consume our windows directly.

Construction: walks are generated per haplotype by scanning the selected
(non-overlapping, position-sorted) variants; segments and links are exactly
the nodes/adjacencies those walks use.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from impop_tpu.extract import WindowMatrix

__all__ = ["window_to_gfa"]


def _parse_site(key: str) -> Tuple[int, str, str]:
    pos_s, rest = key.split(":", 1)
    ref, alt = rest.split(">", 1)
    return int(pos_s), ref, alt


def window_to_gfa(
    wm: WindowMatrix,
    ref_seq: str,
    window_start: int,
    ref_name: str,
) -> str:
    """Build a GFA v1 string for one extracted window."""
    window_end = window_start + len(ref_seq)

    # non-overlapping variant columns in position order
    sites = sorted(
        ((*_parse_site(k), c) for c, k in enumerate(wm.site_keys)),
        key=lambda t: (t[0], t[1], t[2]),
    )
    chosen: List[Tuple[int, str, str, int]] = []
    cursor = window_start
    for pos, ref, alt, col in sites:
        span = len(ref)
        if pos < cursor or pos < window_start or pos + span > window_end:
            continue
        chosen.append((pos, ref, alt, col))
        cursor = pos + span

    segments: List[str] = []
    seg_seq: List[str] = []

    def new_segment(seq: str) -> int:
        seg_seq.append(seq)
        segments.append(f"S\t{len(seg_seq)}\t{seq if seq else '*'}")
        return len(seg_seq)

    interval_seg: Dict[Tuple[int, int], int] = {}

    def interval(a: int, b: int) -> Optional[int]:
        if b <= a:
            return None
        key = (a, b)
        if key not in interval_seg:
            interval_seg[key] = new_segment(
                ref_seq[a - window_start:b - window_start]
            )
        return interval_seg[key]

    ref_allele_seg: Dict[int, int] = {}
    alt_allele_seg: Dict[int, int] = {}
    for pos, ref, alt, col in chosen:
        if ref:
            ref_allele_seg[col] = new_segment(ref)
        if alt:
            alt_allele_seg[col] = new_segment(alt)

    def walk(hap_row: Optional[int]) -> List[int]:
        out: List[int] = []
        pos = window_start
        for site_pos, ref, alt, col in chosen:
            seg = interval(pos, site_pos)
            if seg is not None:
                out.append(seg)
            pos = max(pos, site_pos)
            carrier = (
                hap_row is not None
                and col < wm.geno.shape[1]
                and wm.geno[hap_row, col] == 1
            )
            if carrier:
                if alt:
                    out.append(alt_allele_seg[col])
                # deletion (no alt): skip the ref span entirely
            else:
                if ref:
                    out.append(ref_allele_seg[col])
                # non-carrier of an insertion: nothing inserted
            pos = site_pos + len(ref)
        seg = interval(pos, window_end)
        if seg is not None:
            out.append(seg)
        return out

    walks: List[Tuple[str, List[int]]] = [
        (f"{ref_name}:{window_start}-{window_end}", walk(None))
    ]
    for row, name in enumerate(wm.names):
        walks.append((name, walk(row)))

    edges = set()
    for _, w in walks:
        for a, b in zip(w, w[1:]):
            edges.add((a, b))
    links = [f"L\t{a}\t+\t{b}\t+\t0M" for a, b in sorted(edges)]
    paths = [
        f"P\t{name}\t" + ",".join(f"{sid}+" for sid in w) + "\t*"
        for name, w in walks
        if w
    ]
    return "\n".join(["H\tVN:Z:1.0"] + segments + links + paths) + "\n"
