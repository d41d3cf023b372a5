"""bwa on-disk index interop (index/bwa_io.py): round-trip through the
reference's .bwt/.sa/.pac/.ann/.amb/.cache formats, and — when the
reference-built bench files exist — bit-equality of a reference-built
index against our own builder's output on the same genome."""

from pathlib import Path

import numpy as np
import pytest

from lordfast_tpu.config import LordfastConfig
from lordfast_tpu.index.builder import build_index, load_index
from lordfast_tpu.index.bwa_io import (bwa_files_present, load_bwa_index,
                                       save_bwa_index)

DATA = Path(__file__).parent / "data"
BENCH = Path(__file__).parent.parent / ".bench_cache_big"


@pytest.fixture(scope="module")
def small_idx(ref12_idx):
    return ref12_idx  # session-cached k=12 index (conftest.ref12_idx)


def _assert_same(a, b, full_sa=False):
    assert a.l_pac == b.l_pac
    assert a.seq_len == b.seq_len
    assert a.primary == b.primary
    np.testing.assert_array_equal(a.L2, b.L2)
    n_data = (a.seq_len + 15) // 16
    np.testing.assert_array_equal(a.bwt_words[:n_data],
                                  b.bwt_words[:n_data])
    np.testing.assert_array_equal(a.occ_cp, b.occ_cp)
    np.testing.assert_array_equal(a.pac, b.pac)
    assert a.kcache_k == b.kcache_k
    np.testing.assert_array_equal(a.kcache_beg, b.kcache_beg)
    np.testing.assert_array_equal(a.kcache_end, b.kcache_end)
    assert a.contig_names == b.contig_names
    np.testing.assert_array_equal(a.contig_offsets, b.contig_offsets)
    np.testing.assert_array_equal(a.contig_lengths, b.contig_lengths)
    np.testing.assert_array_equal(a.amb_offsets, b.amb_offsets)
    np.testing.assert_array_equal(a.amb_lengths, b.amb_lengths)
    # sampled SA: compare on the coarser common interval
    step_a = 32 // a.sa_intv if 32 % a.sa_intv == 0 else None
    step_b = 32 // b.sa_intv if 32 % b.sa_intv == 0 else None
    assert step_a and step_b
    np.testing.assert_array_equal(a.sa_samp[::step_a], b.sa_samp[::step_b])


def test_roundtrip_export_import(tmp_path, small_idx):
    prefix = tmp_path / "ref.fa"
    save_bwa_index(small_idx, prefix)
    for ext in (".bwt", ".sa", ".pac", ".ann", ".amb", ".cache"):
        assert (tmp_path / ("ref.fa" + ext)).exists()
    assert bwa_files_present(prefix)
    got = load_bwa_index(prefix)
    _assert_same(small_idx, got)


def test_exported_pac_file_size(tmp_path, small_idx):
    # bwa requires .pac to be exactly l_pac/4+2 or (l_pac>>2)+1+1 bytes
    # (bns_restore_core checks this, lib/bwa/bntseq.c:141-147)
    save_bwa_index(small_idx, tmp_path / "r.fa")
    sz = (tmp_path / "r.fa.pac").stat().st_size
    l_pac = small_idx.l_pac
    want = (l_pac >> 2) + 2 if l_pac % 4 == 0 else (l_pac >> 2) + 1 + 1
    assert sz == want


REF_BIN = Path(__file__).parent.parent / ".refbuild" / "lordfast"


@pytest.mark.skipif(not REF_BIN.exists(),
                    reason="reference binary not built")
def test_reference_binary_maps_from_exported_index(tmp_path, ref12_idx):
    """Export our index in bwa format and have the REFERENCE binary map
    the fixture reads from it — output must equal the committed golden
    SAM the reference produced from its own index."""
    import shutil
    import subprocess

    ref_fa = tmp_path / "ref.fa"
    shutil.copy(DATA / "ref.fa", ref_fa)
    save_bwa_index(ref12_idx, ref_fa)
    out_sam = tmp_path / "out.sam"
    r = subprocess.run(
        [str(REF_BIN), "--search", str(ref_fa), "--seq",
         str(DATA / "reads.fq"), "-t", "1", "-o", str(out_sam)],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    # the binary must NOT have rebuilt the index (it rebuilds only when
    # .bwt is missing, src/BWT.cpp:203-208) — i.e. it used our files
    assert "indexing" not in r.stderr.lower()
    ours = [l for l in open(out_sam) if not l.startswith("@")]
    golden = [l for l in open(DATA / "golden.sam") if not l.startswith("@")]
    assert ours == golden


@pytest.mark.skipif(
    not bwa_files_present(BENCH / "bench_ref.fa")
    or not (BENCH / "bench_index_k12.npz").exists(),
    reason="reference-built bench index not present",
)
def test_reference_built_index_bit_equal():
    """The reference binary's own index files on the bench genome load
    into arrays bit-identical to our SA-IS builder's output — the two
    independent constructions agree on every byte of BWT, Occ, SA
    samples, k-mer cache and pac."""
    ref = load_bwa_index(BENCH / "bench_ref.fa")
    ours = load_index(BENCH / "bench_index_k12.npz")
    _assert_same(ours, ref)
