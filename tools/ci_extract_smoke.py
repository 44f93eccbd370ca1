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

        # 4) threaded wire pack (ix_batch_pack_all — the scan's hot-path
        # C entry point) vs a numpy reference pack, with skipped rows
        batch = nat.extract_batch_open("chr1", wins, threads=threads)
        try:
            cap_n = (max(n for n, _ in batch.dims) + 7) // 8 * 8
            cap_s = (max(s for _, s in batch.dims) + 127) // 128 * 128
            o_m = cap_n * (cap_s // 4)
            o_sm = o_m + cap_n // 8
            o_w = o_sm + cap_s // 8
            stride = o_w + 4 * cap_s
            skip = {3, 11}
            out_rows, r = [], 0
            for i in range(batch.count):
                if i in skip:
                    out_rows.append(-1)
                else:
                    out_rows.append(r)
                    r += 1
            flat = np.zeros((r, stride), np.uint8)
            batch.pack_into(flat, out_rows, cap_n, cap_s, o_m, o_sm, o_w,
                            threads=threads)
            for i, wm in enumerate(mats):
                if out_rows[i] < 0:
                    continue
                row = flat[out_rows[i]]
                n, s = wm.geno.shape
                codes = np.zeros((n, cap_s), np.uint8)
                codes[:, :s] = (wm.geno.astype(np.int16) + 1).astype(np.uint8)
                c4 = codes.reshape(n, -1, 4)
                exp = (c4[..., 0] | (c4[..., 1] << 2)
                       | (c4[..., 2] << 4) | (c4[..., 3] << 6))
                got = row[:o_m].reshape(cap_n, cap_s // 4)
                assert np.array_equal(got[:n], exp), i
                assert not got[n:].any(), i
                mb = np.unpackbits(row[o_m:o_sm], bitorder="little")[:cap_n]
                assert mb[:n].all() and not mb[n:].any(), i
                sb = np.unpackbits(row[o_sm:o_w], bitorder="little")[:cap_s]
                assert sb[:s].all() and not sb[s:].any(), i
                w = row[o_w:].view(np.float32)
                assert np.array_equal(w[:s], wts[i, :s]), i
                assert (w[s:] == 1.0).all(), i
        finally:
            batch.close()

    # 5) reopen: the persistent PAF index sidecar's LOAD path (binary
    # parse + parallel checkpoint rebuild) under the sanitizer too
    with NativeExtractor(sim.paf_path, sim.fasta_path) as nat2:
        for start, end in wins[:3]:
            a = nat2.extract("chr1", start, end)
            b = py.extract("chr1", start, end)
            assert np.array_equal(a.geno, b.geno), (start, end)

    # split_window_matrix consistency keeps the host-side range splitter in
    # the smoke too (pure numpy)
    whole = py.extract("chr1", 0, 8000)
    parts = split_window_matrix(whole, [(0, 4000), (4000, 8000)])
    assert len(parts) == 2
    print(f"ci_extract_smoke OK: {len(wins)} windows, threads={threads}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
