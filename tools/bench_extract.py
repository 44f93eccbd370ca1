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

    # thread-scaling table: extract + wire-pack at IMPOP_EXTRACT_THREADS
    # ∈ {1, 2, 4}, interleaved repetitions (this shared 2-core host has
    # CPU-steal epochs — take the best of 3 per side, CLAUDE.md protocol)
    from impop_tpu.cli import _scan_buf_layout

    def one_pass(threads: int) -> float:
        t0 = time.perf_counter()
        for lo in range(0, len(wins), per_call):
            chunk = wins[lo:lo + per_call]
            nb = ex.extract_batch_open(sim.ref_name, chunk, threads=threads)
            cap_n = max(n for n, _ in nb.dims)
            cap_s = ((max(s for _, s in nb.dims) + 127) // 128) * 128
            cap_n = ((cap_n + 127) // 128) * 128
            lay = _scan_buf_layout(cap_n, cap_s, 5, False)
            flat = np.zeros((len(chunk), lay["total"]), np.uint8)
            nb.pack_into(flat, list(range(len(chunk))), cap_n, cap_s,
                         lay["m"], lay["sm"], -1, threads)
            nb.close()
        return len(wins) / (time.perf_counter() - t0)

    print("\nextract+wire-pack thread scaling (win/s, best of 3):")
    rates = {t: [] for t in (1, 2, 4)}
    for _rep in range(3):
        for t in (1, 2, 4):
            rates[t].append(one_pass(t))
    for t in (1, 2, 4):
        print(f"  threads={t}: {max(rates[t]):8.1f} win/s "
              f"(runs: {', '.join(f'{r:.0f}' for r in rates[t])})")


if __name__ == "__main__":
    main()
