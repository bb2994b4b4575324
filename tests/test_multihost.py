"""Real 2-process multi-host test (SURVEY.md §4): subprocess-launch two
jax.distributed CPU processes against a localhost coordinator and assert
the merged results — this exercises multihost.initialize / shard_work and
cross-process collectives for real, not import-only."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    # The workers set their own JAX_PLATFORMS/XLA_FLAGS; scrub the pytest
    # conftest's 8-device forcing so each worker gets exactly 2 devices.
    env.pop("XLA_FLAGS", None)

    outs = [str(tmp_path / f"out{i}.json") for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(i), outs[i]],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    logs = [p.communicate(timeout=1500)[0].decode(errors="replace")
            for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i][-4000:]}"

    res = [json.load(open(o)) for o in outs]
    for r in res:
        assert r["process_count"] == 2
        assert r["global_devices"] == 4
        assert r["local_devices"] == 2
        # psum over the global mesh saw both hosts: 2*1 + 2*2 = 6.
        assert r["psum"] == pytest.approx(6.0)

    # shard_work split the 16-sample list disjointly and completely.
    items0, items1 = set(res[0]["my_items"]), set(res[1]["my_items"])
    assert items0.isdisjoint(items1)
    assert items0 | items1 == set(range(16))

    # Both processes observed the same merged survivor counts, and the
    # merged total equals the sum of locals.
    assert res[0]["merged_counts"] == res[1]["merged_counts"]
    assert sum(res[0]["merged_counts"]) == \
        res[0]["local_valid"] + res[1]["local_valid"]
    assert sum(res[0]["merged_counts"]) > 0

    # CEM over the global mesh: both hosts agree on the (replicated) final
    # grasp count and the round actually found grasps on the cylinder.
    assert res[0]["cem_valid"] == res[1]["cem_valid"]
    assert res[0]["cem_valid"] > 0

    # 2-shard data generation: work split disjointly/completely across the
    # two writers and the merged dataset covers both shards' rows.
    dg0 = {tuple(t) for t in res[0]["dgen_items"]}
    dg1 = {tuple(t) for t in res[1]["dgen_items"]}
    assert dg0.isdisjoint(dg1)
    assert len(dg0 | dg1) == 2
    assert res[0]["dgen_merged_rows"] == res[1]["dgen_merged_rows"]
    assert res[0]["dgen_merged_rows"] == [res[0]["dgen_rows"],
                                          res[1]["dgen_rows"]]
    assert sum(res[0]["dgen_merged_rows"]) > 0
