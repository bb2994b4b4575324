"""Microbench: strategies for 'compact the first v_cap valid entries of a
row-sorted (S, W) key array' — the shadow-dedup compaction step.

  topk:     lax.top_k(v_cap) over where(valid, key, BIG)  (r4 shipped)
  search:   cumsum + vmapped searchsorted + gather        (r5 attempt)
  scatter:  cumsum ranks + unique-index scatter
  argsortm: argsort over a premasked key copy (1 extra full sort)

Run on the TPU: PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_compact.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

S, W, V = 512, 8184, 2048
BIG = jnp.int32(2 ** 30)


def _sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


@jax.jit
def topk(keys, valid):
    skey = jnp.where(valid, keys, BIG)
    neg, _ = jax.lax.top_k(-skey, V)
    return -neg


@jax.jit
def search(keys, valid):
    cum = jnp.cumsum(valid.astype(jnp.int32), axis=1)
    n_valid = cum[:, -1]
    targets = jnp.arange(1, V + 1, dtype=jnp.int32)
    pos = jax.vmap(jnp.searchsorted, (0, None))(cum, targets)
    pos = jnp.clip(pos, 0, W - 1)
    out = jnp.take_along_axis(keys, pos, axis=1)
    return jnp.where(targets[None, :] <= n_valid[:, None], out, BIG)


@jax.jit
def scatter(keys, valid):
    r = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1
    keep = valid & (r < V)
    rinv = jnp.cumsum((~keep).astype(jnp.int32), axis=1) - 1
    dst = jnp.where(keep, r, V + rinv)
    out = jnp.full((S, V + W), BIG, jnp.int32)
    out = out.at[jnp.arange(S)[:, None], dst].set(
        keys, unique_indices=True, mode="drop")
    return out[:, :V]


@jax.jit
def argsortm(keys, valid):
    skey = jnp.where(valid, keys, BIG)
    order = jnp.argsort(skey, axis=1)
    return jnp.take_along_axis(skey, order[:, :V], axis=1)


def main():
    rng = np.random.default_rng(0)
    keys = np.sort(rng.integers(0, 2 ** 29, size=(S, W)).astype(np.int32), 1)
    valid = rng.random((S, W)) < 0.45
    kj, vj = jnp.asarray(keys), jnp.asarray(valid)
    _sync((kj, vj))

    ref = None
    for name, fn in (("topk", topk), ("search", search),
                     ("scatter", scatter), ("argsortm", argsortm)):
        try:
            out = fn(kj, vj)
            _sync(out)
            if ref is None:
                ref = np.asarray(out)
            else:
                same = np.array_equal(np.asarray(out), ref)
                print(f"  {name} matches topk: {same}")
            ts = []
            for _ in range(10):
                t0 = time.perf_counter()
                out = fn(kj, vj)
                _sync(out)
                ts.append(time.perf_counter() - t0)
            print(f"{name:10s} p50 {np.median(ts)*1e3:8.2f} ms")
        except Exception as e:
            print(f"{name:10s} FAILED: {e}")


if __name__ == "__main__":
    main()
