"""Micro-bench: dense doc-stats + final-gather formulations at the 100k
bench shape (bucket sizes from docs/profile_pipeline_100000.json).

Every variant consumes ALL outputs (the earlier isolated measurement let
XLA dead-code-eliminate v2/w1/w2 and under-read 1.3 ms for a ~3.3 ms
stage).  Timing uses the salted-sync pattern (see micro_gather.py).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

B, DIM = 64, 768
K = 1000
BUCKETS = [
    (1, 13568), (2, 27000), (3, 26888), (4, 18232), (5, 9128),
    (6, 3632), (7, 1200), (8, 352), (9, 72), (10, 24),
]
Dp = sum(c for _, c in BUCKETS)
n_scan = 32

rng = np.random.default_rng(0)
emb = [
    jnp.asarray(
        rng.standard_normal((c * n, DIM)).astype(np.float32), jnp.bfloat16
    )
    for n, c in BUCKETS
]
qv = jnp.asarray(rng.standard_normal((B, DIM)), jnp.float32)


def timed(name, fn, *args):
    f = jax.jit(fn)
    _ = float(np.asarray(f(*args, jnp.float32(0.0))))
    best = 1e9
    for r in range(5):
        t0 = time.time()
        _ = float(np.asarray(f(*args, jnp.float32(r + 1))))
        best = min(best, (time.time() - t0) * 1e3 / n_scan)
    print(f"{name:52s} {best:8.3f} ms")
    return best


def scan_wrap(body):
    def fn(*args):
        *args, salt = args

        def one(c, i):
            return c + body(*args, i + salt), None

        out, _ = lax.scan(
            one, jnp.zeros((), jnp.float32),
            jnp.arange(n_scan, dtype=jnp.float32),
        )
        return out

    return fn


def consume(stats):
    acc = jnp.zeros((), jnp.float32)
    for v1, v2, w1, w2, vm in stats:
        acc = (
            acc + jnp.sum(v1[:, 0]) + jnp.sum(v2[:, 0]) + jnp.sum(vm[:, 0])
            + jnp.sum(w1[:, 0].astype(jnp.float32))
            + jnp.sum(w2[:, 0].astype(jnp.float32))
        )
    return acc


def stats_argmax(qv, *args):
    """Current formulation: max/argmax + masked re-max."""
    embs, i = args[:-1], args[-1]
    q = qv + i * 1e-9
    out = []
    for (n, cnt), e in zip(BUCKETS, embs):
        sims = jnp.dot(
            q.astype(e.dtype), e.T, preferred_element_type=jnp.float32
        ).reshape(B, cnt, n)
        if n == 1:
            v1 = sims[..., 0]
            zi = jnp.zeros_like(v1, dtype=jnp.int32)
            out.append((v1, v1, zi, zi, v1))
            continue
        v1 = jnp.max(sims, axis=2)
        w1 = jnp.argmax(sims, axis=2).astype(jnp.int32)
        slot = lax.broadcasted_iota(jnp.int32, sims.shape, 2)
        sims2 = jnp.where(slot == w1[..., None], -jnp.inf, sims)
        v2 = jnp.max(sims2, axis=2)
        w2 = jnp.argmax(sims2, axis=2).astype(jnp.int32)
        out.append((v1, v2, w1, w2, jnp.min(sims, axis=2)))
    return consume(out)


timed("A: dot + max/argmax/re-max (current)", scan_wrap(stats_argmax), qv, *emb)


def stats_stream(qv, *args):
    """Streaming top-2 over the n axis (strict > keeps lowest index)."""
    embs, i = args[:-1], args[-1]
    q = qv + i * 1e-9
    out = []
    for (n, cnt), e in zip(BUCKETS, embs):
        sims = jnp.dot(
            q.astype(e.dtype), e.T, preferred_element_type=jnp.float32
        ).reshape(B, cnt, n)
        if n == 1:
            v1 = sims[..., 0]
            zi = jnp.zeros_like(v1, dtype=jnp.int32)
            out.append((v1, v1, zi, zi, v1))
            continue
        v1 = sims[..., 0]
        w1 = jnp.zeros_like(v1, dtype=jnp.int32)
        v2 = jnp.full_like(v1, -jnp.inf)
        w2 = jnp.zeros_like(v1, dtype=jnp.int32)
        vm = v1
        for s in range(1, n):
            x = sims[..., s]
            is1 = x > v1
            is2 = (~is1) & (x > v2)
            v2 = jnp.where(is1, v1, jnp.where(is2, x, v2))
            w2 = jnp.where(is1, w1, jnp.where(is2, s, w2))
            v1 = jnp.where(is1, x, v1)
            w1 = jnp.where(is1, s, w1)
            vm = jnp.minimum(vm, x)
        out.append((v1, v2, w1, w2, vm))
    return consume(out)


timed("B: dot + streaming top-2 over n", scan_wrap(stats_stream), qv, *emb)


def stats_argmax_nomin(qv, *args):
    """No-vmin variant: pool lo could come from a running min instead."""
    embs, i = args[:-1], args[-1]
    q = qv + i * 1e-9
    out = []
    for (n, cnt), e in zip(BUCKETS, embs):
        sims = jnp.dot(
            q.astype(e.dtype), e.T, preferred_element_type=jnp.float32
        ).reshape(B, cnt, n)
        if n == 1:
            v1 = sims[..., 0]
            zi = jnp.zeros_like(v1, dtype=jnp.int32)
            out.append((v1, v1, zi, zi, v1))
            continue
        v1 = jnp.max(sims, axis=2)
        w1 = jnp.argmax(sims, axis=2).astype(jnp.int32)
        slot = lax.broadcasted_iota(jnp.int32, sims.shape, 2)
        sims2 = jnp.where(slot == w1[..., None], -jnp.inf, sims)
        v2 = jnp.max(sims2, axis=2)
        w2 = jnp.argmax(sims2, axis=2).astype(jnp.int32)
        out.append((v1, v2, w1, w2, v1))
    return consume(out)


timed(
    "C: dot + max/argmax/re-max, no vmin", scan_wrap(stats_argmax_nomin),
    qv, *emb,
)


def matmul_only(qv, *args):
    embs, i = args[:-1], args[-1]
    q = qv + i * 1e-9
    acc = jnp.zeros((), jnp.float32)
    for (n, cnt), e in zip(BUCKETS, embs):
        sims = jnp.dot(
            q.astype(e.dtype), e.T, preferred_element_type=jnp.float32
        )
        acc = acc + jnp.sum(sims[:, 0])
    return acc


timed("D: matmuls only (sum col 0)", scan_wrap(matmul_only), qv, *emb)

# ---- final-gather variants --------------------------------------------------
score = jnp.asarray(rng.standard_normal((B, Dp)), jnp.float32)
win = jnp.asarray(rng.integers(0, 3 * Dp, (B, Dp)), jnp.int32)
idx = jnp.asarray(
    np.stack([rng.permutation(Dp)[:K] for _ in range(B)]), jnp.int32
)


def g2(score, win, ix, i):
    ix = (ix + i.astype(jnp.int32)) % Dp
    cs = jnp.take_along_axis(score, ix, axis=1)
    cw = jnp.take_along_axis(win, ix, axis=1)
    fv, order = lax.top_k(cs, K)
    fw = jnp.take_along_axis(cw, order, axis=1)
    return jnp.sum(fv[:, 0]) + jnp.sum(fw[:, 0].astype(jnp.float32))


timed("G1: 2x take_along_axis + rerank top_k", scan_wrap(g2), score, win, idx)


def g_packed(score, win, ix, i):
    ix = (ix + i.astype(jnp.int32)) % Dp
    packed = jnp.stack(
        [score, win.astype(jnp.float32)], axis=2
    ).reshape(B, 2 * Dp)
    ix2 = jnp.stack([2 * ix, 2 * ix + 1], axis=2).reshape(B, 2 * K)
    both = jnp.take_along_axis(packed, ix2, axis=1).reshape(B, K, 2)
    cs, cw = both[..., 0], both[..., 1]
    fv, order = lax.top_k(cs, K)
    fw = jnp.take_along_axis(cw, order, axis=1)
    return jnp.sum(fv[:, 0]) + jnp.sum(fw[:, 0])


timed("G2: packed interleave + 1 gather", scan_wrap(g_packed), score, win, idx)


def g_sorted(score, win, ix, i):
    ix = (ix + i.astype(jnp.int32)) % Dp
    pos = lax.broadcasted_iota(jnp.int32, ix.shape, 1)
    six, spos = lax.sort_key_val(ix, pos, dimension=1)
    cs = jnp.take_along_axis(score, six, axis=1)
    cw = jnp.take_along_axis(win, six, axis=1)
    # unsort back to candidate order
    _, cs = lax.sort_key_val(spos, cs, dimension=1)
    _, cw = lax.sort_key_val(spos, cw, dimension=1)
    fv, order = lax.top_k(cs, K)
    fw = jnp.take_along_axis(cw, order, axis=1)
    return jnp.sum(fv[:, 0]) + jnp.sum(fw[:, 0].astype(jnp.float32))


timed("G3: sorted-index gather + unsort", scan_wrap(g_sorted), score, win, idx)


def g_flat(score, win, ix, i):
    ix = (ix + i.astype(jnp.int32)) % Dp
    gidx = ix + jnp.arange(B, dtype=jnp.int32)[:, None] * Dp
    cs = jnp.take(score.reshape(-1), gidx)
    cw = jnp.take(win.reshape(-1), gidx)
    fv, order = lax.top_k(cs, K)
    fw = jnp.take_along_axis(cw, order, axis=1)
    return jnp.sum(fv[:, 0]) + jnp.sum(fw[:, 0].astype(jnp.float32))


timed("G4: flat 1-D take x2 + rerank top_k", scan_wrap(g_flat), score, win, idx)


def g_dense_topk(score, win, ix, i):
    # dense rerank: top_k straight over (B, Dp), then ONE win gather
    sc = score + i * 1e-9
    fv, fd = lax.top_k(sc, K)
    fw = jnp.take_along_axis(win, fd, axis=1)
    return jnp.sum(fv[:, 0]) + jnp.sum(fw[:, 0].astype(jnp.float32))


timed(
    "G5: dense top_k + 1x win gather", scan_wrap(g_dense_topk),
    score, win, idx,
)
