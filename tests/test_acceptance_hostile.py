"""Adversarial acceptance run: the full README workflow on a HOSTILE
simulated chromosome (VERDICT r4 item 7).

Every other e2e number comes from benign `simulate()` defaults; this module
drives extract → scan (+EHH) → panels-hfst → panels-tajd → sfs → plot on
inputs built to hit the hard paths:

- SV-scale/shared indels + 40% reverse-strand haplotypes + ragged
  per-haplotype coverage (simulate with span=None, p_indel high),
- a window past every alignment (extracts EMPTY → n=0 row) and a
  missing-tile window (load FAILURE → NA journal row + error counter —
  run_pica2_impg.sh:168-180 skip-and-continue semantics),
- a "ghost" panel listing samples absent from the pangenome (empty mask),
- CRAFTED tiles with multiallelic codes (scan must split them for the
  2-bit wire) and disjoint-coverage haplotype blocks (must trip the
  seed_risk exact-FSTG recompute; fused seed-representative values would
  deviate from hud.py's first-found-pair semantics there),

and pins the scan's π / Fst / FSTG / S columns against tests/oracle.py.
"""
from __future__ import annotations

import json
import os

import numpy as np
import pytest

import oracle
from impop_tpu.cli import main

# the engine compares f32 similarities against the F32 threshold on
# device; feed the oracle the same representable value so strict->
# decisions agree at exactly-threshold pairs (1 - k/L lands ON 0.999
# for some k at these window lengths)
T32 = float(np.float32(0.999))


@pytest.fixture(scope="module")
def hostile(tmp_path_factory):
    from impop_tpu.extract.simulate import simulate

    tmp = tmp_path_factory.mktemp("hostile")
    # ragged coverage (span=None), heavy indels, strand flips
    sim = simulate(str(tmp), ref_len=60_000, n_haps=20, site_pool=500,
                   p_indel=0.7, seed=23, span=None)
    bed = tmp / "w.bed"
    rows = [f"chr1\t{lo}\t{lo + 3000}\n" for lo in range(0, 60_000, 3000)]
    # one window past every alignment: extracts EMPTY (an unknown
    # chromosome behaves the same) — emitted as an n=0 row, matching the
    # reference's skip-tolerant drivers; the extraction-FAILURE NA path
    # is exercised by the crafted-tile test below (missing tile)
    rows.append("chr1\t90000\t93000\n")
    bed.write_text("".join(rows))
    samples = sorted({h.name.split("#")[0] for h in sim.haplotypes})
    (tmp / "agc.PA").write_text("\n".join(samples[:4]) + "\n")
    (tmp / "agc.PB").write_text("\n".join(samples[4:8]) + "\n")
    # ghost panel: names that match no haplotype
    (tmp / "agc.PG").write_text("ZZ99998\nZZ99999\n")
    return sim, tmp, bed


def test_hostile_scan_pins_oracle(hostile, capsys):
    sim, tmp, bed = hostile
    out = tmp / "scan.tsv"
    journal = tmp / "scan.jsonl"
    main(["scan", "-b", str(bed), "--paf", sim.paf_path,
          "--fasta", sim.fasta_path, "-P", "CHM13#0#",
          "--panel", str(tmp / "agc.PA"), "--panel", str(tmp / "agc.PB"),
          "--panel", str(tmp / "agc.PG"),
          "--ehh", "--journal", str(journal), "-o", str(out)])
    err = capsys.readouterr().err
    assert "success: 21, errors: 0" in err, err
    recs = [json.loads(l) for l in journal.read_text().splitlines()]
    assert len(recs) >= 21

    lines = [l.split("\t") for l in out.read_text().splitlines() if l]
    hdr, rows = lines[0], lines[1:]
    assert len(rows) == 21     # 20 data windows + the empty n=0 window

    # oracle pinning on every window with data, through the real
    # extraction (identical tiles to what the scan consumed)
    from impop_tpu.extract import NativeExtractor

    col = {name: hdr.index(name) for name in hdr}
    checked = 0
    with NativeExtractor(sim.paf_path, sim.fasta_path) as nat:
        for row in rows:
            region = row[0]
            start, end = map(int, region.rsplit(":", 1)[1].split("-"))
            wm = nat.extract("CHM13#0#chr1", start, end)
            g = np.asarray(wm.geno)
            names = list(wm.names)
            order = np.argsort(names)
            g = g[order]
            names = [names[i] for i in order]
            n, s = g.shape
            if n == 0:
                continue
            L = float(end - start)
            # device-identical f32 similarity values
            diff = (g[:, None, :] != g[None, :, :]) & (g[:, None, :] >= 0) \
                & (g[None, :, :] >= 0)
            dcount = diff.sum(-1)
            comp = ((g[:, None, :] >= 0) & (g[None, :, :] >= 0)).sum(-1)
            simm = (np.float32(1.0)
                    - dcount.astype(np.float32) / np.float32(L))
            sd = {}
            for i in range(n):
                for j in range(i + 1, n):
                    if comp[i, j] > 0:
                        sd[(names[i], names[j])] = float(simm[i, j])
            valid = g >= 0
            any_valid = valid.any(axis=0)
            gmax = np.where(valid, g, -1).max(axis=0)
            gmin = np.where(valid, g, 127).min(axis=0)
            s_np = int((any_valid & (gmax > gmin)).sum())
            assert int(row[col["SEGREGATING_SITES"]]) == s_np, region

            from impop_tpu.io.panels import expand_population
            stems = [nm.split(":", 1)[0] for nm in names]
            pa_list = open(tmp / "agc.PA").read().split()
            pb_list = open(tmp / "agc.PB").read().split()
            pa_m, _ = expand_population(pa_list, stems)
            pb_m, _ = expand_population(pb_list, stems)
            pa = [names[i] for i in range(n) if stems[i] in pa_m]
            pb = [names[i] for i in range(n) if stems[i] in pb_m]
            for pname, plist in (("PA", pa), ("PB", pb)):
                want, _ = oracle.pica2_pi(
                    {k: v for k, v in sd.items()
                     if k[0] in set(plist) and k[1] in set(plist)},
                    plist, T32)
                got = float(row[col[f"PI_{pname}"]]) * L
                assert abs(want - got) <= max(1e-4 * abs(want), 1e-3), (
                    region, pname, want, got)
            # ghost panel: no members -> pi 0
            assert float(row[col["PI_PG"]]) == 0.0
            if pa and pb:
                w_d = oracle.hudson_fst_direct(sd, pa, pb)
                got_fst = float(row[col["FST_PA_PB"]])
                assert abs(w_d["fst"] - got_fst) < 2e-3, (
                    region, w_d["fst"], got_fst)
                w_g = oracle.hudson_fst_grouped(sd, pa, pb, T32)
                got_g = float(row[col["FSTG_PA_PB"]])
                assert abs(w_g["fst"] - got_g) < 2e-3, (
                    region, w_g["fst"], got_g)
            checked += 1
    assert checked >= 10, "hostile windows mostly empty — fixture too weak"


def test_hostile_crafted_tiles_multiallelic_and_seed_risk(hostile, tmp_path):
    """Crafted tiles: multiallelic codes (split for the 2-bit wire) and
    disjoint-coverage blocks that MUST trip the exact-FSTG recompute —
    asserted by matching hud.py's first-found-pair oracle, which the fused
    seed-representative path deviates from on these tiles."""
    sim, tmp, bed = hostile
    rng = np.random.default_rng(3)
    tiles = tmp_path / "tiles"
    tiles.mkdir()
    n, s = 12, 24
    names = [f"HG{90000 + i // 2:05d}#{i % 2 + 1}#c{i}" for i in range(n)]
    regions = []
    for wi in range(3):
        g = rng.integers(0, 2, size=(n, s)).astype(np.int8)
        # multiallelic column: three alleles
        g[:, 5] = rng.integers(0, 3, size=n)
        # disjoint coverage: first half only sees sites [0, s//2),
        # second half only [s//2, s) -> cross seed pairs lack data
        g[: n // 2, s // 2:] = -1
        g[n // 2:, : s // 2] = -1
        lo = wi * 1000
        region = f"chr1:{lo}-{lo + 1000}"
        keys = [f"{lo + 10 + 3 * k}:snp" for k in range(s)]
        np.savez(tiles / f"{region}.npz", geno=g,
                 names=np.asarray(names), site_keys=np.asarray(keys))
        regions.append((region, g))
    bed2 = tmp_path / "w.bed"
    # a 4th window with NO tile on disk: load fails -> NA journal row +
    # error counter (run_pica2_impg.sh:168-180 skip-and-continue)
    bed2.write_text("".join(
        f"chr1\t{wi * 1000}\t{wi * 1000 + 1000}\n" for wi in range(4)))
    (tmp_path / "agc.QA").write_text(
        "\n".join(f"HG{90000 + i:05d}" for i in range(3)) + "\n")
    (tmp_path / "agc.QB").write_text(
        "\n".join(f"HG{90000 + i:05d}" for i in range(3, 6)) + "\n")
    out = tmp_path / "crafted.tsv"
    journal2 = tmp_path / "crafted.jsonl"
    main(["scan", "-b", str(bed2), "--geno-dir", str(tiles), "-P", "",
          "--panel", str(tmp_path / "agc.QA"),
          "--panel", str(tmp_path / "agc.QB"),
          "--journal", str(journal2), "-o", str(out)])
    lines = [l.split("\t") for l in out.read_text().splitlines() if l]
    hdr, rows = lines[0], lines[1:]
    col = {nm: hdr.index(nm) for nm in hdr}
    assert len(rows) == 3
    # the missing-tile window took the NA path
    recs = [json.loads(l) for l in journal2.read_text().splitlines()]
    assert any(json.loads(json.dumps(r)).get("rec", r).get("status") == "NA"
               or "NA" in json.dumps(r) for r in recs), recs
    na_recs = [r for r in recs if "NA" in json.dumps(r)]
    assert len(na_recs) == 1, recs

    from impop_tpu.cli import split_multiallelic

    risk_hit = 0
    for (region, g), row in zip(regions, rows):
        L = 1000.0
        g2, _ = split_multiallelic(g, [f"{k}:x" for k in range(s)])
        n2, s2 = g2.shape
        # S on the split tile
        valid = g2 >= 0
        any_valid = valid.any(axis=0)
        gmax = np.where(valid, g2, -1).max(axis=0)
        gmin = np.where(valid, g2, 127).min(axis=0)
        s_np = int((any_valid & (gmax > gmin)).sum())
        assert int(row[col["SEGREGATING_SITES"]]) == s_np, region

        # similarity dict on the split tile, sorted-name order
        order = np.argsort(names)
        gs = g2[order]
        nms = [names[i] for i in order]
        diff = ((gs[:, None, :] != gs[None, :, :])
                & (gs[:, None, :] >= 0) & (gs[None, :, :] >= 0)).sum(-1)
        comp = ((gs[:, None, :] >= 0) & (gs[None, :, :] >= 0)).sum(-1)
        simm = np.float32(1.0) - diff.astype(np.float32) / np.float32(L)
        sd = {}
        for i in range(n):
            for j in range(i + 1, n):
                if comp[i, j] > 0:
                    sd[(nms[i], nms[j])] = float(simm[i, j])
        qa = [nm for nm in nms
              if any(nm.startswith(f"HG{90000 + i:05d}#")
                     for i in range(3))]
        qb = [nm for nm in nms
              if any(nm.startswith(f"HG{90000 + i:05d}#")
                     for i in range(3, 6))]
        w_g = oracle.hudson_fst_grouped(sd, qa, qb, T32)
        got = float(row[col["FSTG_QA_QB"]])
        if not np.isnan(w_g["fst"]):
            assert abs(w_g["fst"] - got) < 2e-3, (region, w_g["fst"], got)
            risk_hit += 1
    assert risk_hit >= 1, "no crafted window exercised the grouped path"


def test_hostile_full_workflow(hostile, tmp_path, monkeypatch):
    """extract → panels-tajd → panels-hfst → sfs → plot on the hostile
    chromosome — the README workflow end to end (first coverage of the
    panels-* batch drivers, run_tajd_panels.sh:60-66 /
    run_h_fst_panels.sh:60-71)."""
    sim, tmp, bed = hostile
    tiles = tmp_path / "tiles"
    main(["extract", "-b", str(bed), "--paf", sim.paf_path,
          "--fasta", sim.fasta_path, "-P", "CHM13#0#",
          "--out-dir", str(tiles)])
    assert len(list(tiles.glob("*.npz"))) >= 15

    samples = sorted({h.name.split("#")[0] for h in sim.haplotypes})
    md = tmp_path / "metadata"
    md.mkdir()
    for gi, grp in enumerate(("EUR", "AFR", "EAS", "SAS", "AMR")):
        (md / f"agc.{grp}").write_text(
            "\n".join(samples[2 * gi:2 * gi + 2]) + "\n")

    monkeypatch.chdir(tmp_path)
    main(["panels-tajd", "-b", str(bed), "--geno-dir", str(tiles),
          "-P", "CHM13#0#", "--metadata-dir", str(md)])
    for fn in ("eur.tj", "afr.tj", "eas.tj", "sas.tj", "amr.tj"):
        table = (tmp_path / fn).read_text().splitlines()
        assert table[0].split("\t")[:4] == [
            "REGION", "LENGTH", "SAMPLES", "SEGREGATING_SITES"]
        assert len(table) >= 15

    main(["panels-hfst", "-b", str(bed), "--geno-dir", str(tiles),
          "-P", "CHM13#0#", "--metadata-dir", str(md)])
    fst_tables = list(tmp_path.glob("*.fst"))
    assert len(fst_tables) == 10
    for ft in fst_tables:
        hdr = ft.read_text().splitlines()[0].split("\t")
        assert hdr[:3] == ["REGION", "LENGTH", "FST"]

    sfs_out = tmp_path / "sfs.tsv"
    main(["sfs", "-b", str(bed), "--geno-dir", str(tiles),
          "-P", "CHM13#0#", "--panel", str(md / "agc.EUR"),
          "--panel", str(md / "agc.AFR"), "-o", str(sfs_out)])
    sfs_lines = sfs_out.read_text().splitlines()
    assert sfs_lines[0].startswith("ALLELE_COUNT")
    assert len(sfs_lines) > 1

    png = tmp_path / "tajd.png"
    main(["plot", "tajd", "--input", f"EUR={tmp_path / 'eur.tj'}",
          "--input", f"AFR={tmp_path / 'afr.tj'}", "--output", str(png)])
    assert png.exists() and png.stat().st_size > 1000
