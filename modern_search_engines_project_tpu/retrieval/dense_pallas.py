"""Pallas TPU kernel: fused per-document dense statistics over the bank.

The XLA formulation of ``ops.bucket_doc_stats`` (einsum -> streaming
top-2) materializes the [B, n, cnt] similarity tensor in HBM between the
matmul and the reductions — at the 100k bench shape that is ~76 MB of
f32 written and re-read per batch, measured ~2.5 ms true with every
output consumed (tools/micro_stats.py).  This kernel fuses the matmul
and the per-doc streaming top-2/min so the similarities never leave
VMEM: per grid step it loads one (n, TC, dim) slot-major bank tile,
runs n MXU matmuls against the resident query block, and writes only the
five (B, TC) statistic tiles.

HBM traffic collapses to: bank read (once) + 5 stat outputs — the
speed-of-light for this stage (~0.75 ms at 100k/bf16 on v5e).

Math parity: identical streaming-top-2 recurrence as the XLA path
(strict > keeps the lowest slot on ties = argmax/top_k tie order); the
only difference is MXU accumulation order inside the f32 matmul, which
the engine's tolerance-based ranking comparisons absorb (the bf16 bank
itself already dominates that error term).

int8 (quantized-pair) banks fall back to the XLA path — the pair's
per-row rescale is cheap there and int8 banks are opt-in.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 64 * 1024 * 1024
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _pick_tc(cnt: int, n: int, dim: int, itemsize: int) -> int:
    """Largest divisor of ``cnt`` that is a multiple of 128 lanes (Mosaic
    output-block rule), <= 1024 doc columns, and keeps the (n, TC, dim)
    tile + double-buffering well inside VMEM.  Bucket capacities are
    128-padded at build time so a divisor always exists."""
    budget = (_VMEM_LIMIT // 4) // max(n * dim * itemsize, 1)
    best = 0
    cap = min(1024, max(budget, 128))
    for tc in range(128, cap + 1, 128):
        if cnt % tc == 0:
            best = tc
    # no 128-multiple divisor (bucket smaller than 128 or legacy 8-pad):
    # a block equal to the full array dim is always legal
    return best or cnt


def _stats_kernel(q_ref, emb_ref, v1_ref, v2_ref, w1_ref, w2_ref, vm_ref):
    """One (TC-doc-column) grid step of one bucket.

    refs: q [B, dim] bank-dtype; emb [n, TC, dim] bank-dtype (slot-major);
    outputs [B, TC] — v1/v2/vm f32, w1/w2 int32.
    """
    n = emb_ref.shape[0]
    q = q_ref[:]

    def slot_sims(s):
        e = emb_ref[s]  # (TC, dim)
        return jax.lax.dot_general(
            q, e, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (B, TC)

    x = slot_sims(0)
    v1 = x
    w1 = jnp.zeros_like(x, dtype=jnp.int32)
    v2 = jnp.full_like(x, -jnp.inf)
    w2 = jnp.zeros_like(x, dtype=jnp.int32)
    vm = x
    for s in range(1, n):
        x = slot_sims(s)
        is1 = x > v1
        is2 = (~is1) & (x > v2)
        v2 = jnp.where(is1, v1, jnp.where(is2, x, v2))
        w2 = jnp.where(is1, w1, jnp.where(is2, s, w2))
        v1 = jnp.where(is1, x, v1)
        w1 = jnp.where(is1, s, w1)
        vm = jnp.minimum(vm, x)
    if n == 1:
        # XLA-path contract for single-chunk docs: (v1, v1, 0, 0, v1)
        v2 = v1
        vm = v1
    v1_ref[:] = v1
    v2_ref[:] = v2
    w1_ref[:] = w1
    w2_ref[:] = w2
    vm_ref[:] = vm


def bucket_stats_pallas(emb, qvec, *, interpret: bool = False):
    """Fused per-doc stats for ONE slot-major bucket bank [n, cnt, dim].

    Returns (v1, v2, w1, w2, vmin), each [B, cnt] — the same contract as
    one entry of ops.bucket_doc_stats."""
    n, cnt, dim = emb.shape
    B = qvec.shape[0]
    q = qvec.astype(emb.dtype)
    tc = _pick_tc(cnt, n, dim, emb.dtype.itemsize)
    f32 = jnp.float32
    i32 = jnp.int32
    outs = pl.pallas_call(
        _stats_kernel,
        grid=(cnt // tc,),
        in_specs=[
            pl.BlockSpec((B, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (n, tc, dim), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((B, tc), lambda i: (0, i), memory_space=pltpu.VMEM)
            for _ in range(5)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, cnt), f32),
            jax.ShapeDtypeStruct((B, cnt), f32),
            jax.ShapeDtypeStruct((B, cnt), i32),
            jax.ShapeDtypeStruct((B, cnt), i32),
            jax.ShapeDtypeStruct((B, cnt), f32),
        ],
        compiler_params=None if interpret else _COMPILER_PARAMS,
        interpret=interpret,
    )(q, emb)
    return tuple(outs)
