"""Micro-bench: candidate-major gather cost on TPU.

take_along_axis of (B, k) from (B, Dp) — the building block of the
candidate-major hybrid tail (stats gathered at top-k doc ids instead of
dense (B, Dp) fused math).  Also times the (B, k) fusion math and a 1-D
jnp.take, to size the full replacement before committing to it.

Each scan body must GENUINELY depend on the loop counter (index rolled by
``i``) — a ``+ i * 0`` dependence is folded away and XLA hoists the whole
body out of the scan (measured: every section reads 0.001 ms).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

B, Dp, K = 64, 100096, 1000
n_scan = 32


def timed(name, fn, *args):
    # per-rep salt arg + np.asarray sync: identical repeat dispatches are
    # result-cached by the remote backend and block_until_ready does not
    # force execution there (measured: every section reads 0.001 ms)
    f = jax.jit(fn)
    _ = float(np.asarray(f(*args, jnp.float32(0.0))))
    best = 1e9
    for r in range(5):
        t0 = time.time()
        _ = float(np.asarray(f(*args, jnp.float32(r + 1))))
        best = min(best, (time.time() - t0) * 1e3 / n_scan)
    print(f"{name:50s} {best:8.3f} ms")
    return best


rng = np.random.default_rng(0)
stats = [jnp.asarray(rng.standard_normal((B, Dp)), jnp.float32) for _ in range(5)]
idx = jnp.asarray(rng.integers(0, Dp, (B, K)), jnp.int32)
base = jnp.asarray(rng.integers(0, 3 * Dp, (Dp,)), jnp.int32)
narr = jnp.asarray(rng.integers(1, 11, (Dp,)), jnp.int32)
vals = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)


def scan_wrap(body):
    def fn(*args):
        *args, salt = args

        def one(c, i):
            return c + body(*args, i + salt.astype(jnp.int32)), None

        out, _ = lax.scan(one, jnp.zeros((), jnp.float32), jnp.arange(n_scan))
        return out

    return fn


def roll(ix, i):
    # cheap genuine dependence on the scan counter: shift every index by i
    return (ix + i) % Dp


def g5(s0, s1, s2, s3, s4, ix, i):
    ix = roll(ix, i)
    acc = jnp.zeros((B, K), jnp.float32)
    for s in (s0, s1, s2, s3, s4):
        acc = acc + jnp.take_along_axis(s, ix, axis=1)
    return jnp.sum(acc[:, 0])


timed("5x take_along_axis (B,1000) from (B,100k)", scan_wrap(g5), *stats, idx)


def g1d(b, n, ix, i):
    ix = roll(ix, i)
    return jnp.sum(b[ix][:, 0].astype(jnp.float32)) + jnp.sum(
        n[ix][:, 0].astype(jnp.float32)
    )


timed("2x 1-D take (B,1000) from (Dp,)", scan_wrap(g1d), base, narr, idx)


def math_k(v1, v2, old, i):
    v1 = v1 + i.astype(jnp.float32) * 1e-9
    lo = jnp.min(v1, axis=1, keepdims=True)
    hi = jnp.max(v1, axis=1, keepdims=True)
    den = hi - lo
    n1 = (v1 - lo) / jnp.where(den > 0, den, 1.0)
    n2 = (v2 - lo) / jnp.where(den > 0, den, 1.0)
    f1 = n1 * 0.85 + old * 0.15
    f2 = n2 * 0.85 + old * 0.15
    adj = jnp.clip(f1 + 0.1, 0.0, 1.0)
    sc = jnp.maximum(adj, f2)
    tv, ti = lax.top_k(sc, K)
    return jnp.sum(tv[:, 0]) + jnp.sum(ti[:, 0].astype(jnp.float32))


timed(
    "(B,1000) fusion math + top_k(1000 of 1000)",
    scan_wrap(math_k),
    stats[0][:, :K],
    stats[1][:, :K],
    stats[2][:, :K],
)


def sortkv(ix, v, i):
    s_ix, s_v = lax.sort_key_val(roll(ix, i), v, dimension=1)
    return jnp.sum(s_v[:, 0]) + jnp.sum(s_ix[:, 0].astype(jnp.float32))


timed("sort_key_val (B,1000)", scan_wrap(sortkv), idx, vals)

# concat cost for stats assembly; perturb only the smallest part
parts = [
    jnp.asarray(rng.standard_normal((B, c)), jnp.float32)
    for c in (13568, 27000, 26888, 18232, 9128, 3632, 1200, 352, 72, 24)
]


def cc(*ps):
    i = ps[-1]
    ps = list(ps[:-1])
    ps[-1] = ps[-1] + i.astype(jnp.float32)
    cat = jnp.concatenate(ps, axis=1)
    return jnp.sum(cat[:, 0]) + jnp.sum(cat[:, -1])


timed("concat 10 buckets -> (B, 100k)  x1", scan_wrap(cc), *parts)


def cc5_gather(ix, *ps):
    i = ps[-1]
    ps = ps[:-1]
    ix = roll(ix, i)
    acc = jnp.zeros((B, K), jnp.float32)
    for r in range(5):
        cat = jnp.concatenate([p + jnp.float32(r) for p in ps], axis=1)
        acc = acc + jnp.take_along_axis(cat, ix, axis=1)
    return jnp.sum(acc[:, 0])


timed(
    "5x [concat 10 + take_along_axis]", scan_wrap(cc5_gather), idx, *parts
)

# top_k variants over (B, Dp)
bm = stats[0]


def tk(b, i):
    b = b + i.astype(jnp.float32) * 1e-9
    tv, ti = lax.top_k(b, K)
    return jnp.sum(tv[:, 0]) + jnp.sum(ti[:, 0].astype(jnp.float32))


timed("lax.top_k(1000) over (B,100k)", scan_wrap(tk), bm)


def tka(b, i):
    b = b + i.astype(jnp.float32) * 1e-9
    tv, ti = lax.approx_max_k(b, K)
    return jnp.sum(tv[:, 0]) + jnp.sum(ti[:, 0].astype(jnp.float32))


timed("approx_max_k(1000) over (B,100k)", scan_wrap(tka), bm)


def tk2(b, i):
    x = (b + i.astype(jnp.float32) * 1e-9).reshape(B, 8, Dp // 8)
    tv, ti = lax.top_k(x, K)  # per-chunk top-k
    tv = tv.reshape(B, 8 * K)
    ti = ti.reshape(B, 8 * K)
    tv2, o = lax.top_k(tv, K)
    return jnp.sum(tv2[:, 0]) + jnp.sum(
        jnp.take_along_axis(ti, o, axis=1)[:, 0].astype(jnp.float32)
    )


timed("two-stage exact top_k (8 chunks)", scan_wrap(tk2), bm)
