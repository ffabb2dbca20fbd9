"""Microbenchmarks for a gathered term-major BM25 path (design probe).

The doc-major Pallas kernels stream ALL nnz postings per batch and pay
O(nnz * U) VPU compares (bm25_pallas.py header).  A term-major path would
gather only the batch's query-term posting lists (P_sel << nnz, typically
6-16x less) and reduce them scatter-free.  Whether that can win depends on
three primitive costs on the real chip, measured here with the
scan-in-one-dispatch methodology (arrays as jit args, one end sync):

  1. elementwise gather   y = x[idx]            (random idx)
  2. run gather           y = x[starts[:,None] + iota[None,C]]
                          (contiguous C-runs — term posting ranges)
  3. segment-matmul       scan over doc tiles of a one-hot MXU matmul
                          [B, Cmax] @ [Cmax, D]  (the scatter replacement)
  4. device sort          jnp.sort of P keys    (fallback grouping path)

Usage:  python bench_gather.py [nnz] [P]
Prints one JSON line with ms per op at the given shapes.
"""

import functools
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    nnz = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    B = 64
    N_SCAN = 16
    rng = np.random.default_rng(0)

    x = jnp.asarray(rng.standard_normal(nnz).astype(np.float32))
    xi = jnp.asarray(rng.integers(0, 100_000, nnz).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, nnz, P).astype(np.int32))

    def timed(fn, *args, label=""):
        """N_SCAN iterations under one lax.scan; returns ms/iter.

        fn must return a SCALAR that depends on its full working set and on
        the per-iteration seed ``s`` — partial reductions let XLA dead-code
        the very work being measured (observed on CPU: a [64,8192]@[8192,512]
        scan "ran" in 4 us because only tile 0 was consumed).
        """

        @jax.jit
        def loop(*a):
            def one(carry, s):
                return carry + fn(*a, s).astype(jnp.float32), None

            out, _ = jax.lax.scan(
                one, jnp.float32(0), jnp.arange(N_SCAN, dtype=jnp.int32)
            )
            return out

        r = loop(*args)
        r.block_until_ready()
        t0 = time.perf_counter()
        r = loop(*args)
        r.block_until_ready()
        ms = (time.perf_counter() - t0) * 1000 / N_SCAN
        print(f"{label}: {ms:.3f} ms", file=sys.stderr)
        return round(ms, 3)

    res = {"nnz": nnz, "P": P, "B": B}

    # 1. elementwise gather (f32 + the int32 doc-id plane)
    res["gather_elem_f32"] = timed(
        lambda x_, i_, s: x_[(i_ + s) % nnz].sum(),
        x, idx, label="gather_elem_f32",
    )
    res["gather_elem_2plane"] = timed(
        lambda x_, xi_, i_, s: (
            x_[(i_ + s) % nnz] + xi_[(i_ + s) % nnz].astype(jnp.float32)
        ).sum(),
        x, xi, idx, label="gather_elem_2plane",
    )

    # 2. run gather: M starts, C contiguous elements each (M*C = P)
    for C in (128, 512, 2048):
        M = P // C
        starts = jnp.asarray(
            rng.integers(0, nnz - C, M).astype(np.int32)
        )
        res[f"gather_run_C{C}"] = timed(
            lambda x_, s_, s, C=C: x_[
                ((s_ + s)[:, None] + jnp.arange(C, dtype=jnp.int32)[None, :])
            ].sum(),
            x, starts, label=f"gather_run_C{C} (M={M})",
        )

    # 3. segment-matmul: docs tiled D wide, per-tile Cmax postings,
    #    contrib [B, Cmax] @ onehot [Cmax, D] under a scan over tiles.
    #    Total postings = n_tiles * Cmax ~= P.
    for D, Cmax in ((512, 8192), (1024, 16384), (2048, 32768)):
        n_tiles = max(1, P // Cmax)
        # local doc of each posting within its tile (host-built here; in
        # production the gather above produces it)
        loc = jnp.asarray(
            rng.integers(0, D, (n_tiles, Cmax)).astype(np.int32)
        )
        contrib = jnp.asarray(
            rng.standard_normal((n_tiles, B, Cmax)).astype(np.float32)
        )

        def seg_matmul(loc_, contrib_, s):
            iota = jnp.arange(D, dtype=jnp.int32)[None, :]

            # per-iteration dependence on s: shift local docs (cheap, VPU)
            def one_tile2(carry, args):
                l_, c_ = args
                onehot = (((l_ + s) % D)[:, None] == iota).astype(jnp.bfloat16)
                t = jnp.dot(
                    c_.astype(jnp.bfloat16), onehot,
                    preferred_element_type=jnp.float32,
                )
                return carry + jnp.sum(t), None

            out, _ = jax.lax.scan(
                one_tile2, jnp.float32(0), (loc_, contrib_)
            )
            return out

        res[f"segmm_D{D}_C{Cmax}"] = timed(
            seg_matmul, loc, contrib,
            label=f"segmm_D{D}_C{Cmax} (tiles={n_tiles})",
        )

    # 4. device sort (fallback: group gathered postings by doc on device)
    keys = jnp.asarray(rng.integers(0, 1_000_000, P).astype(np.int32))
    res["sort_P_int32"] = timed(
        lambda k_, s: jnp.sort(k_ + s).sum().astype(jnp.float32),
        keys, label="sort_P_int32",
    )
    # sort with payload (the production shape: key=doc, payload=contrib idx)
    payload = jnp.arange(P, dtype=jnp.int32)
    res["sort_P_kv"] = timed(
        lambda k_, p_, s: sum(
            o.sum().astype(jnp.float32)
            for o in jax.lax.sort((k_ + s, p_), num_keys=1)
        ),
        keys, payload, label="sort_P_kv",
    )

    print(json.dumps(res))


if __name__ == "__main__":
    main()
