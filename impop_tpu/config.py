"""Typed configuration for scans.

The reference spreads its knobs over argparse flags and getopts defaults
(threshold/round-digits/prefix defaults at reference scripts/run_tajd.sh:7-10,
run_pica2_impg.sh:6-8, pica2.py:173-183).  Here they live in one dataclass,
extended with the mesh/sharding settings the reference does not have.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence


@dataclasses.dataclass(frozen=True)
class ScanConfig:
    """Configuration for a window scan.

    Attributes mirror the reference's knobs:
      threshold     : similarity threshold for allele-class grouping
                      (reference pica2.py -t, default 0.999 in the drivers)
      round_digits  : decimal rounding applied to similarities before use
                      (reference pica2.py -r / h-fst.py -r; None = no rounding)
      region_prefix : prefix prepended to BED coordinates to build region
                      strings (reference run_pica2_impg.sh:8, "CHM13#0#")
      reference_name: name of the reference path used for variant calling
                      (reference run_tajd.sh:8, "CHM13")
      window_size   : width used when generating windows from an interval
                      (the reference shells out to `bedtools makewindows`)
      length_override: optional length forwarded to per-site normalisation
                      (reference run_pica2_impg.sh -l)

    TPU-side additions (no reference analogue; reference is sequential):
      batch_windows : number of windows processed per device step
      max_haplotypes: static row budget N for padded [W, N, N] tiles
      mesh_shape    : (data, site) device mesh; data shards windows,
                      site shards the site/streaming axis
      dtype         : accumulation dtype on device
    """

    threshold: float = 0.999
    round_digits: Optional[int] = None
    region_prefix: str = "CHM13#0#"
    reference_name: str = "CHM13"
    window_size: int = 5000
    length_override: Optional[int] = None

    batch_windows: int = 8
    max_haplotypes: int = 512
    mesh_shape: Sequence[int] = (1, 1)
    dtype: str = "float32"

    def replace(self, **kw) -> "ScanConfig":
        return dataclasses.replace(self, **kw)
