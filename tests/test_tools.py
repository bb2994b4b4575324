"""Tests for dataset tooling (apps/hdf5_tools) and profiling hooks."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from gpd_tpu.apps import hdf5_tools


@pytest.fixture
def dataset(tmp_path):
    path = str(tmp_path / "in.h5")
    rng = np.random.default_rng(1)
    with h5py.File(path, "w") as f:
        f.create_dataset("images",
                         data=rng.integers(0, 255, (137, 8, 8, 3), dtype=np.uint8),
                         chunks=(10, 8, 8, 3))
        f.create_dataset("labels",
                         data=rng.integers(0, 2, (137, 1), dtype=np.uint8),
                         chunks=(10, 1))
    return path


def test_shuffle_streaming_matches_mem(dataset, tmp_path):
    out_s = str(tmp_path / "s.h5")
    out_m = str(tmp_path / "m.h5")
    assert hdf5_tools.main(["shuffle", dataset, out_s, "--block", "13"]) == 0
    assert hdf5_tools.main(["shuffle", dataset, out_m, "--mem"]) == 0
    with h5py.File(dataset) as a, h5py.File(out_s) as b, h5py.File(out_m) as c:
        ia, ib = a["images"][:], b["images"][:]
        # Streaming and in-memory shuffles are identical permutations.
        assert np.array_equal(ib, c["images"][:])
        assert np.array_equal(b["labels"][:], c["labels"][:])
        # Same multiset of rows, and (image, label) pairing preserved.
        assert np.array_equal(np.sort(ia.reshape(len(ia), -1), axis=0),
                              np.sort(ib.reshape(len(ib), -1), axis=0))
        pairing = {ia[i].tobytes(): int(a["labels"][i, 0]) for i in range(len(ia))}
        assert all(pairing[ib[i].tobytes()] == int(b["labels"][i, 0])
                   for i in range(len(ib)))
        assert not np.array_equal(ia, ib)  # it actually shuffled


def test_reshape_rechunks_preserving_data(dataset, tmp_path):
    out = str(tmp_path / "r.h5")
    assert hdf5_tools.main(["reshape", dataset, out, "--chunk", "64",
                            "--block", "50"]) == 0
    with h5py.File(dataset) as a, h5py.File(out) as b:
        assert np.array_equal(a["images"][:], b["images"][:])
        assert np.array_equal(a["labels"][:], b["labels"][:])
        assert b["images"].chunks[0] == 64


def test_converters_gate_cleanly_without_deps(dataset, tmp_path):
    # zarr/lmdb are not in the base image: the converters must exit 2 with a
    # message, not raise.
    for sub, dst in (("to-zarr", "z.zarr"), ("to-lmdb", "l.lmdb")):
        try:
            __import__(sub.split("-")[1])
        except ImportError:
            assert hdf5_tools.main([sub, dataset, str(tmp_path / dst)]) == 2


def test_info(dataset, capsys):
    assert hdf5_tools.main(["info", dataset]) == 0
    out = capsys.readouterr().out
    assert "images" in out and "positives" in out


def test_profiling_noop_and_trace(tmp_path, monkeypatch):
    from gpd_tpu import profiling
    monkeypatch.delenv("GPD_TPU_PROFILE", raising=False)
    with profiling.maybe_trace():
        with profiling.span("x"):
            pass
    t = profiling.StageTimer()
    with t.stage("a"):
        pass
    assert "a" in t.stages and "RUNTIMES" in t.report()
    # With the env var set, a real trace directory is produced.
    d = str(tmp_path / "trace")
    monkeypatch.setenv("GPD_TPU_PROFILE", d)
    import jax.numpy as jnp
    with profiling.maybe_trace():
        with profiling.span("y"):
            jnp.ones(8).block_until_ready()
    import os
    assert os.path.isdir(d)


def test_render_readme_updates_marked_table(tmp_path):
    """tools/render_readme.py replaces exactly the marked table with rows
    rendered from the bench JSON (the README<->BENCH consistency
    mechanism)."""
    import json
    import subprocess
    import sys

    bench = {"value": 123456.7, "p50_latency_s": 0.0536,
             "table_mug": {"candidates_per_sec": 160000.1,
                           "p50_latency_s": 0.267},
             "cem": {"total_s_p50": 0.23,
                     "max_of_gaussians": {"total_s_p50": 0.246},
                     "table_mug": {"total_s_p50": 0.203}},
             "sharded": {"candidates_per_sec": 127000.0,
                         "p50_latency_s": 0.054,
                         "overhead_vs_direct_pct": 0.8}}
    bpath = tmp_path / "bench.json"
    bpath.write_text(json.dumps(bench))
    rpath = tmp_path / "README.md"
    rpath.write_text("head\n<!-- bench:begin -->\nOLD\n<!-- bench:end -->\n"
                     "tail\n")
    out = subprocess.run(
        [sys.executable, "/root/repo/tools/render_readme.py", str(bpath),
         str(rpath)], capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    text = rpath.read_text()
    assert "OLD" not in text
    assert "123,457 cand/s" in text
    assert "160,000 cand/s" in text
    assert "+0.8% vs direct" in text
    assert text.startswith("head\n") and text.endswith("tail\n")
