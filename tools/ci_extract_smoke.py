"""Sanitizer smoke for the native extraction library — NO JAX.

Run under LD_PRELOAD=libasan.so / libtsan.so by ci.sh: simulates a small
pangenome, extracts windows through every native entry point (per-window,
range batch, threaded padded batch fill) and checks the matrices against
the pure-Python oracle extractor.  jaxlib's own nanobind bindings throw
C++ exceptions that ASan's interceptors cannot handle when preloaded
(CHECK failed: asan_interceptors.cpp "real___cxa_throw != 0"), so the
sanitizer pass must exercise cpp/ without importing jax — this driver is
that pass; the functional differential coverage lives in
tests/test_extract.py.
"""
import os
import sys
import tempfile

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

from impop_tpu.extract import NativeExtractor, split_window_matrix  # noqa: E402
from impop_tpu.extract.pyfallback import PyExtractor  # noqa: E402
from impop_tpu.extract.simulate import simulate  # noqa: E402


def main() -> int:
    tmp = tempfile.mkdtemp(prefix="impop_smoke_")
    sim = simulate(tmp, ref_len=60_000, n_haps=24, site_pool=900, seed=5,
                   span=(0, 60_000))
    wins = [(lo, lo + 2000) for lo in range(0, 60_000, 2000)]
    threads = int(os.environ.get("IMPOP_EXTRACT_THREADS", "4"))

    py = PyExtractor(sim.paf_path, sim.fasta_path)
    with NativeExtractor(sim.paf_path, sim.fasta_path) as nat:
        # 1) per-window extraction vs the Python oracle
        for start, end in wins[:6]:
            a = nat.extract("chr1", start, end)
            b = py.extract("chr1", start, end)
            assert a.names == b.names, (start, end)
            assert a.site_keys == b.site_keys, (start, end)
            assert np.array_equal(a.geno, b.geno), (start, end)

        # 2) range batch == per-window
        mats = nat.extract_batch("chr1", wins, threads=threads)
        for (start, end), wm in zip(wins, mats):
            one = nat.extract("chr1", start, end)
            assert wm is not None
            assert np.array_equal(wm.geno, one.geno), (start, end)

        # 3) threaded padded fill (the ix_batch_fill_all worker pool)
        geno, member, smask, wts, names, errors = nat.extract_batch_padded(
            "chr1", wins, threads=threads, want_weights=True)
        assert not any(errors), errors
        for i, wm in enumerate(mats):
            n, s = wm.geno.shape
            assert np.array_equal(geno[i, :n, :s], wm.geno)
            assert member[i, :n].all() and not member[i, n:].any()
            assert smask[i, :s].all() and not smask[i, s:].any()

    # split_window_matrix consistency keeps the host-side range splitter in
    # the smoke too (pure numpy)
    whole = py.extract("chr1", 0, 8000)
    parts = split_window_matrix(whole, [(0, 4000), (4000, 8000)])
    assert len(parts) == 2
    print(f"ci_extract_smoke OK: {len(wins)} windows, threads={threads}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
