"""Extraction-layer microbenchmark (host-side, no JAX).

Times the native range extraction on the same simulated pangenome shape the
e2e bench uses (466 haplotypes, 5 kb windows, HPRC-density shared site pool)
so extraction optimisations can be measured in isolation from the device
pipeline.  Usage:

    python tools/bench_extract.py [ref_len] [n_windows_per_call]
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from impop_tpu.extract import NativeExtractor  # noqa: E402
from impop_tpu.extract.simulate import simulate  # noqa: E402


def main() -> None:
    ref_len = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    per_call = int(sys.argv[2]) if len(sys.argv) > 2 else 320
    win_bp = 5000
    tmp = tempfile.mkdtemp(prefix="impop_xbench_")
    t0 = time.perf_counter()
    sim = simulate(tmp, ref_len=ref_len, n_haps=465,
                   site_pool=ref_len // 60, seed=11, span=(0, ref_len))
    t_sim = time.perf_counter() - t0

    t0 = time.perf_counter()
    ex = NativeExtractor(sim.paf_path, sim.fasta_path)
    t_open = time.perf_counter() - t0

    wins = [(lo, lo + win_bp) for lo in range(0, ref_len, win_bp)]
    n_sites = 0
    t0 = time.perf_counter()
    for lo in range(0, len(wins), per_call):
        chunk = wins[lo:lo + per_call]
        if hasattr(ex, "extract_batch"):
            mats = ex.extract_batch(sim.ref_name, chunk)
        else:
            mats = [ex.extract(sim.ref_name, s, e) for s, e in chunk]
        n_sites += sum(len(m.site_keys) for m in mats if m is not None)
    dt = time.perf_counter() - t0
    print(f"simulate: {t_sim:.2f}s  open(index): {t_open:.2f}s")
    print(f"extract: {len(wins)} windows in {dt:.3f}s = "
          f"{len(wins)/dt:.1f} win/s ({len(wins)/dt/40:.2f} 200kb-units/s); "
          f"{n_sites} sites total")


if __name__ == "__main__":
    main()
