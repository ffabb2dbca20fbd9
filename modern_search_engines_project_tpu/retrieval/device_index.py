"""Device-resident hybrid index: padded jnp arrays ready for the jitted path.

The reference's shared DuckDB file (SURVEY.md §1 L0) becomes this structure:
CSR impact postings + the chunk-embedding bank live in HBM; every axis is
padded to hardware-friendly multiples so all query-time shapes are static.

Padding scheme:
  * docs   -> multiple of 128; one extra sentinel slot (index ``n_docs_pad``)
    receives scatter writes from masked-out postings and padded chunks.
  * chunks -> multiple of 128 (MXU tile edge for the q x bank matmul);
    padded chunks point at the sentinel doc.
  * postings are used via gathers only, no padding needed.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from modern_search_engines_project_tpu.config import Config
from modern_search_engines_project_tpu.index.builder import IndexArtifacts


def quantize_bank_int8(emb: np.ndarray):
    """Symmetric per-row int8 quantization of an embedding bank:
    returns (q [n, dim] int8, inv_scale [n] f32) with
    ``emb ~= q * inv_scale[:, None]``.  Rows are L2-normalized, but max
    components vary ~20x across rows — the per-row scale keeps relative
    quantization error ~0.4% where a per-tensor scale would lose ~4 bits.
    Opt-in via bank_dtype="int8": halves HBM vs bf16 and runs the dense
    matmul on the MXU's s8 path (2x bf16 rate)."""
    m = np.abs(emb).max(axis=1)
    m = np.where(m > 0, m, 1.0).astype(np.float32)
    q = np.clip(
        np.round(emb / m[:, None] * 127.0), -127, 127
    ).astype(np.int8)
    return q, (m / 127.0).astype(np.float32)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def balance_by_load(idxs: np.ndarray, load: np.ndarray, block: int = 128) -> np.ndarray:
    """Reorder ``idxs`` so consecutive ``block``-sized windows carry roughly
    equal total ``load`` (posting count).

    The blocked BM25 kernel pads every 128-doc block to the HEAVIEST
    block's posting count, so clustering heavy docs (which the chunk-count
    bucketing naturally does — long docs have both more chunks and more
    postings) multiplies padding.  Sort by load descending and deal
    round-robin into ceil(n/block) piles: each pile sums to ~total/piles.
    """
    n = len(idxs)
    if n <= block:
        return idxs
    order = np.argsort(-load[idxs], kind="stable")
    n_piles = -(-n // block)
    pile = np.arange(n) % n_piles
    slot = np.arange(n) // n_piles
    # concatenate piles in order: position = pile * (pile size) + slot,
    # with ragged pile sizes handled by lexsort
    final = np.lexsort((slot, pile))
    return idxs[order][final]


def _sort_by_load(idxs: np.ndarray, load: np.ndarray) -> np.ndarray:
    """Order ``idxs`` by descending ``load`` (posting count)."""
    return idxs[np.argsort(-load[idxs], kind="stable")]


def _ragged_arange(counts: np.ndarray) -> np.ndarray:
    """concat([arange(c) for c in counts]) without the python loop."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, np.int64)
    ends = np.cumsum(counts)
    return np.arange(total) - np.repeat(ends - counts, counts)


DOC_BLOCK = 128  # docs per kernel block (MXU lane width)
POSTING_CHUNK = 2048  # postings processed per kernel grid step
SLOT_COLS = 512  # doc columns per slot-layout group


def build_slot_postings(
    indptr: np.ndarray,
    post_docs: np.ndarray,
    post_impact: np.ndarray,
    n_docs_pad: int,
    cols: int = SLOT_COLS,
    S_g: Optional[np.ndarray] = None,
):
    """Term-major CSR -> doc-slot layout for the slot Pallas kernel.

    Column ``d % cols`` of group ``d // cols`` holds doc d's postings stacked
    vertically, so the per-doc reduction is a straight sum over rows — no
    per-posting local ids and no one-hot "scatter as matmul" (which costs
    ~2*2B*128*2 MXU flops per posting in the blocked kernel and dominated
    its runtime).  Groups are classed by quantized row stride so each
    class is one rectangular ``[n_groups, stride, cols]`` pallas stream;
    docs arrive pre-sorted by posting count (device_index doc permutation),
    keeping within-group stride spread — and therefore padding — small.

    Returns ``(slot_terms, slot_impact, col_unperm)``:
      * slot_terms / slot_impact — tuples of ``[n_g, S, cols]`` arrays
        (terms int32 pad -1, impact f32 pad 0), one per stride class.
      * col_unperm — int32 [n_docs_pad]: dense doc idx -> column in the
        class-concatenated kernel output.
    """
    V = indptr.shape[0] - 1
    nnz = post_docs.shape[0]
    n_slots = _round_up(max(n_docs_pad, cols), cols)
    n_groups = n_slots // cols

    term_of_post = np.repeat(np.arange(V, dtype=np.int32), np.diff(indptr))
    order = np.argsort(post_docs, kind="stable")
    d = post_docs[order].astype(np.int64)
    t = term_of_post[order]
    im = post_impact[order]
    counts = np.bincount(d, minlength=n_slots)
    starts = np.concatenate([[0], np.cumsum(counts)])
    row = np.arange(nnz, dtype=np.int64) - starts[d]

    # per-group stride: max posting count rounded to 8, then snapped to at
    # most 16 quantile levels — adaptive: narrow count distributions get
    # near-exact strides (pow2 rounding measured 1.86x padding on a
    # Poisson-shaped corpus; quantile levels 1.07x at the 100k bench shape).
    # The sharded builder passes shared ``S_g`` (cross-shard max strides) so
    # every shard gets the identical SPMD class structure.
    if S_g is None:
        gmax = np.maximum.reduceat(counts, np.arange(0, n_slots, cols))
        S_g = _stride_classes(gmax)

    classes = np.unique(S_g)
    class_of_group = np.searchsorted(classes, S_g)
    rank_in_class = np.zeros(n_groups, np.int64)
    group_pos = np.zeros(n_groups, np.int64)  # position in concat output
    slot_terms, slot_impact = [], []
    offset = 0
    for ci, S in enumerate(classes):
        gsel = np.nonzero(class_of_group == ci)[0]
        rank_in_class[gsel] = np.arange(len(gsel))
        group_pos[gsel] = offset + np.arange(len(gsel))
        offset += len(gsel)
        terms = np.full((len(gsel), int(S), cols), -1, np.int32)
        impact = np.zeros((len(gsel), int(S), cols), np.float32)
        slot_terms.append(terms)
        slot_impact.append(impact)

    # vectorized scatter of every posting into its class array
    g = d // cols
    col = d % cols
    ci_p = class_of_group[g]
    flat_idx = (rank_in_class[g] * classes[ci_p] + row) * cols + col
    for ci in range(len(classes)):
        sel = ci_p == ci
        if sel.any():
            slot_terms[ci].reshape(-1)[flat_idx[sel]] = t[sel]
            slot_impact[ci].reshape(-1)[flat_idx[sel]] = im[sel]

    dd = np.arange(n_docs_pad, dtype=np.int64)
    col_unperm = (group_pos[dd // cols] * cols + dd % cols).astype(np.int32)
    return tuple(slot_terms), tuple(slot_impact), col_unperm


def _round_up_arr(x: np.ndarray, m: int) -> np.ndarray:
    return ((x + m - 1) // m) * m


def _stride_classes(gmax: np.ndarray, max_classes: int = 16) -> np.ndarray:
    """Snap per-group max posting counts to <= max_classes stride levels.

    Levels are right-edge quantiles of the observed strides (always
    including the max), each a valid row-chunk size: any multiple of 8 up
    to 512, multiples of 512 beyond (bm25_pallas.SLOT_ROW_CHUNK)."""
    stride = np.maximum(_round_up_arr(gmax.astype(np.int64), 8), 8)

    def _snap(s: int) -> int:
        return int(s) if s <= 512 else int(_round_up_arr(np.int64(s), 512))

    snapped = np.array([_snap(s) for s in stride], np.int64)
    uniq = np.unique(snapped)
    if len(uniq) > max_classes:
        qi = np.ceil((np.arange(max_classes) + 1) * len(uniq) / max_classes)
        uniq = uniq[qi.astype(np.int64) - 1]
    return uniq[np.searchsorted(uniq, snapped)]


def build_blocked_postings(
    indptr: np.ndarray,
    post_docs: np.ndarray,
    post_impact: np.ndarray,
    n_docs_pad: int,
    posting_chunk: int = POSTING_CHUNK,
):
    """Term-major CSR -> doc-major blocked layout for the Pallas kernel.

    Returns (blk_terms, blk_impact, blk_local) of shape
    ``[n_blocks, p_blk]`` where block i holds the postings of docs
    ``[i*128, (i+1)*128)`` padded to a common multiple of posting_chunk.
    Pad terms are -1 (query term ids are >= 0, so they never match).
    """
    V = indptr.shape[0] - 1
    nnz = post_docs.shape[0]
    term_of_post = np.repeat(np.arange(V, dtype=np.int32), np.diff(indptr))
    order = np.argsort(post_docs, kind="stable")
    d_sorted = post_docs[order]
    t_sorted = term_of_post[order]
    i_sorted = post_impact[order]

    n_blocks = n_docs_pad // DOC_BLOCK
    bounds = np.searchsorted(
        d_sorted, np.arange(0, n_docs_pad + 1, DOC_BLOCK)
    )
    sizes = np.diff(bounds)
    p_blk = int(max(sizes.max() if len(sizes) else 0, 1))
    p_blk = ((p_blk + posting_chunk - 1) // posting_chunk) * posting_chunk

    blk_terms = np.full((n_blocks, p_blk), -1, np.int32)
    blk_impact = np.zeros((n_blocks, p_blk), np.float32)
    blk_local = np.zeros((n_blocks, p_blk), np.int32)
    for i in range(n_blocks):
        s, e = bounds[i], bounds[i + 1]
        n = e - s
        if n:
            blk_terms[i, :n] = t_sorted[s:e]
            blk_impact[i, :n] = i_sorted[s:e]
            blk_local[i, :n] = d_sorted[s:e] - i * DOC_BLOCK
    return blk_terms, blk_impact, blk_local


@dataclasses.dataclass
class DeviceIndex:
    # BM25
    indptr: jnp.ndarray  # int32 [V+1]
    post_docs: jnp.ndarray  # int32 [nnz]
    post_impact: jnp.ndarray  # float32 [nnz]
    # BM25, doc-major blocked (Pallas kernel layout); None when built with
    # build_unused_layout=False and bm25_layout="slots"
    blk_terms: Optional[jnp.ndarray]  # int32 [n_blocks, p_blk]
    blk_impact: Optional[jnp.ndarray]  # float32 [n_blocks, p_blk]
    blk_local: Optional[jnp.ndarray]  # int32 [n_blocks, p_blk]
    # BM25, doc-slot layout (stride classes; see build_slot_postings);
    # None when built with build_unused_layout=False and bm25_layout="blocked"
    slot_terms: Optional[tuple]  # per class: int32 [n_g, S, SLOT_COLS]
    slot_impact: Optional[tuple]  # per class: float32 [n_g, S, SLOT_COLS]
    col_unperm: Optional[jnp.ndarray]  # int32 [n_docs_pad]
    # dense (packed layout: contiguous per-doc segments); chunk_emb is
    # None when built with build_packed_bank=False (bucketed path serves)
    chunk_emb: Optional[jnp.ndarray]  # bank_dtype [n_chunks_pad, dim]
    chunk_doc: jnp.ndarray  # int32 [n_chunks_pad] (pad -> n_docs_pad sentinel)
    doc_chunk_start: jnp.ndarray  # int32 [n_docs_pad + 1]
    doc_n_chunks: jnp.ndarray  # int32 [n_docs_pad + 1]
    # dense (bucketed exact-stride layout): documents are permuted so docs
    # with the same chunk count are contiguous; each bucket stores its
    # chunks at stride exactly n — ZERO padding waste in either the bank or
    # the per-doc reduction temporaries.  Per-doc top-2 becomes a last-axis
    # lax.top_k — the segment/scatter formulation costs minutes of (remote)
    # TPU compile time and serialized runtime.
    buckets: tuple  # ((n, cnt_pad), ...) static structure
    bucket_emb: tuple  # per bucket: bank_dtype [n, cnt_pad, dim] slot-major
    bucket_valid: tuple  # per bucket: bool [cnt_pad] (real doc?)
    bucket_start: tuple  # per bucket: int32 [cnt_pad] packed chunk start
    doc_perm: Optional[np.ndarray]  # host: new doc idx -> artifact doc idx
    # sizes (static)
    n_docs: int
    n_docs_pad: int
    n_chunks_pad: int
    n_terms: int
    nnz: int
    posting_cap: int  # static gather budget per query (Q_CAP)

    @classmethod
    def from_artifacts(
        cls,
        art: IndexArtifacts,
        config: Optional[Config] = None,
        bank_dtype=jnp.float32,
        posting_cap: Optional[int] = None,
        slot_layout: bool = True,
        packed_device: bool = True,
        bm25_layout: str = "slots",
        build_unused_layout: bool = True,
        build_packed_bank: Optional[bool] = None,
    ) -> "DeviceIndex":
        """``packed_device=False`` keeps the packed chunk bank and the CSR
        posting copies as HOST numpy arrays: when the bucketed Pallas path
        serves queries they are dead weight, and at 1M docs the duplicate
        bf16 bank alone is ~4.6 GB of HBM (measured OOM at 1M with both
        layouts resident).

        ``bm25_layout`` picks which BM25 posting layout is device-resident
        ("slots" or "blocked"); the other stays host-side numpy so the two
        never double HBM.  ``build_unused_layout=False`` skips building the
        non-resident layout entirely (its fields are None) — the layouts
        are host-construction-heavy (sorting + scattering every posting)
        and the serving engine only ever drives the configured one; at 1M+
        docs on the single-core dev host this halves index-load time.

        ``build_packed_bank=False`` skips the packed duplicate of the full
        chunk bank (``chunk_emb`` stays None) — it only feeds the
        non-bucketed fallback paths, and materializing a second multi-GB
        bank costs ~35 s/GB of fresh-page writes on the single-core dev
        host.  Default: build it unless the bucketed slots layout will
        serve with the packed arrays host-side anyway."""
        cfg = config or art.config
        n_docs = art.n_docs
        n_docs_pad = max(_round_up(n_docs, 128), 128)
        n_chunks = art.n_chunks
        n_chunks_pad = max(_round_up(n_chunks, 128), 128)
        nnz = int(art.post_docs.shape[0])

        if posting_cap is None:
            # budget: enough for every query term to be "tuebingen"-common.
            # max term df bounds one term's postings; take the top
            # max_query_terms dfs as the worst-case query, then round up.
            lens = np.diff(art.indptr)
            top_lens = np.sort(lens)[::-1][: cfg.max_query_terms]
            posting_cap = max(1024, _round_up(int(top_lens.sum()) + 1, 1024))

        # --- bucketed dense layout + doc permutation (may grow n_docs_pad) --
        buckets = []
        bucket_emb_l, bucket_valid_l, bucket_start_l = [], [], []
        doc_perm = None
        inv = None
        if slot_layout and n_chunks:
            dnc = np.minimum(
                np.asarray(art.doc_n_chunks)[:n_docs], cfg.max_chunks_per_doc
            ).astype(np.int64)
            starts_all = np.asarray(art.doc_chunk_start)[:n_docs]
            dim = art.chunk_emb.shape[1]
            order = np.argsort(dnc, kind="stable")  # docs grouped by n
            perm_parts = []
            distinct = sorted(set(int(x) for x in dnc)) or [1]
            post_load = np.bincount(
                np.asarray(art.post_docs), minlength=n_docs
            ).astype(np.int64)
            # within a chunk-count bucket, order docs to suit the serving
            # BM25 layout: slots wants posting counts sorted (its padding
            # is the within-group stride spread); blocked wants per-block
            # SUMS balanced (its padding is the max block sum)
            if bm25_layout == "slots":
                idxs_per = [
                    _sort_by_load(order[dnc[order] == n], post_load)
                    for n in distinct
                ]
            else:
                idxs_per = [
                    balance_by_load(order[dnc[order] == n], post_load,
                                    DOC_BLOCK)
                    for n in distinct
                ]
            # 128-aligned bucket capacities: the fused stats kernel tiles
            # doc columns in 128-lane multiples (Mosaic block rule); waste
            # is <= 127 pad docs x n rows per bucket (~2% of the bank at
            # the 100k shape)
            pads = [_round_up(max(len(ix), 8), 128) for ix in idxs_per]
            # make the concatenated doc axis a DOC_BLOCK multiple; absorb
            # the rounding in the SMALLEST-stride bucket so pad slots cost
            # `delta * min(n)` bank rows, not `delta * max(n)`
            total = sum(pads)
            pads[0] += max(_round_up(total, DOC_BLOCK), DOC_BLOCK) - total
            for n, idxs, cnt_pad in zip(distinct, idxs_per, pads):
                cnt = len(idxs)
                # SLOT-MAJOR bank [n, cnt_pad, dim]: slot s of every doc is
                # a contiguous (cnt_pad, dim) plane, so the per-doc top-2
                # streams one MXU matmul per slot with no strided reads —
                # both the XLA einsum path and the Pallas stats kernel
                # consume this layout directly
                emb = np.zeros((n, cnt_pad, dim), np.float32)
                valid = np.zeros(cnt_pad, bool)
                bstart = np.zeros(cnt_pad, np.int32)
                if cnt:
                    src = (
                        starts_all[idxs][None, :]
                        + np.arange(n)[:, None]
                    )  # (n, cnt)
                    emb[:, :cnt] = art.chunk_emb[src]
                    valid[:cnt] = True
                    bstart[:cnt] = starts_all[idxs]
                buckets.append((int(n), int(cnt_pad)))
                if bank_dtype == "int8":
                    q8, inv = quantize_bank_int8(
                        emb.reshape(n * cnt_pad, dim)
                    )
                    bucket_emb_l.append(
                        (
                            jnp.asarray(q8.reshape(n, cnt_pad, dim)),
                            jnp.asarray(inv.reshape(n, cnt_pad)),
                        )
                    )
                else:
                    bucket_emb_l.append(jnp.asarray(emb, bank_dtype))
                bucket_valid_l.append(jnp.asarray(valid))
                bucket_start_l.append(jnp.asarray(bstart))
                pp = np.full(cnt_pad, -1, np.int64)
                pp[:cnt] = idxs
                perm_parts.append(pp)
            doc_perm = np.concatenate(perm_parts)
            n_docs_pad = max(int(doc_perm.shape[0]), n_docs_pad)
            assert n_docs_pad % DOC_BLOCK == 0
            # remap postings into the new doc order
            inv = np.zeros(n_docs, np.int32)
            real = doc_perm >= 0
            inv[doc_perm[real]] = np.nonzero(real)[0].astype(np.int32)

        # --- packed arrays (ORIGINAL doc order; scatter/dense_rank paths) ---
        if build_packed_bank is None:
            build_packed_bank = packed_device or not buckets
        if build_packed_bank:
            chunk_emb = np.zeros(
                (n_chunks_pad, art.chunk_emb.shape[1]), np.float32
            )
            chunk_emb[:n_chunks] = art.chunk_emb
        else:
            chunk_emb = None
        chunk_doc = np.full(n_chunks_pad, n_docs_pad, np.int32)
        chunk_doc[:n_chunks] = art.chunk_doc

        doc_chunk_start = np.zeros(n_docs_pad + 1, np.int32)
        doc_chunk_start[:n_docs] = art.doc_chunk_start
        doc_n_chunks = np.ones(n_docs_pad + 1, np.int32)
        doc_n_chunks[:n_docs] = art.doc_n_chunks

        # --- doc-major blocked postings (NEW doc order when permuted) -------
        post_docs_for_blocks = np.asarray(art.post_docs)
        if inv is not None:
            post_docs_for_blocks = inv[post_docs_for_blocks]
        blk_terms = blk_impact = blk_local = None
        slot_terms = slot_impact = col_unperm = None
        # which layout will the engine actually drive?  The non-bucketed
        # Pallas fallback (ops.hybrid_rank_blocked — empty corpus or
        # slot_layout=False) only understands the blocked layout, so an
        # index without dense buckets must always carry it.
        resident_layout = bm25_layout if buckets else "blocked"
        if resident_layout != "slots" or build_unused_layout:
            blk_terms, blk_impact, blk_local = build_blocked_postings(
                np.asarray(art.indptr),
                post_docs_for_blocks,
                np.asarray(art.post_impact),
                n_docs_pad,
            )
        if resident_layout == "slots" or build_unused_layout:
            slot_terms, slot_impact, col_unperm = build_slot_postings(
                np.asarray(art.indptr),
                post_docs_for_blocks,
                np.asarray(art.post_impact),
                n_docs_pad,
            )
        # exactly one BM25 layout is device-resident (HBM); see docstring
        if resident_layout == "slots":
            slot_terms = tuple(jnp.asarray(x) for x in slot_terms)
            slot_impact = tuple(jnp.asarray(x) for x in slot_impact)
            col_unperm = jnp.asarray(col_unperm)
        else:
            blk_terms = jnp.asarray(blk_terms)
            blk_impact = jnp.asarray(blk_impact)
            blk_local = jnp.asarray(blk_local)

        # empty-corpus guard: gathers need at least one posting row
        pd = np.asarray(art.post_docs, np.int32)
        pi = np.asarray(art.post_impact, np.float32)
        if pd.shape[0] == 0:
            pd = np.zeros(1, np.int32)
            pi = np.zeros(1, np.float32)

        # scatter-path arrays: device only when that path will serve
        dev = jnp.asarray if packed_device else (lambda x, *a: np.asarray(x, *a))

        return cls(
            indptr=jnp.asarray(art.indptr, jnp.int32),
            post_docs=dev(pd),
            post_impact=dev(pi),
            blk_terms=blk_terms,
            blk_impact=blk_impact,
            blk_local=blk_local,
            slot_terms=slot_terms,
            slot_impact=slot_impact,
            col_unperm=col_unperm,
            chunk_emb=(
                None
                if chunk_emb is None
                else jnp.asarray(
                    chunk_emb,
                    jnp.float32 if bank_dtype == "int8" else bank_dtype,
                )
                if packed_device
                # already float32 by construction: asarray is a no-copy
                # view (astype here copied the full multi-GB bank)
                else np.asarray(chunk_emb, np.float32)
            ),
            chunk_doc=dev(chunk_doc),
            doc_chunk_start=jnp.asarray(doc_chunk_start),
            doc_n_chunks=jnp.asarray(doc_n_chunks),
            buckets=tuple(buckets),
            bucket_emb=tuple(bucket_emb_l),
            bucket_valid=tuple(bucket_valid_l),
            bucket_start=tuple(bucket_start_l),
            doc_perm=doc_perm,
            n_docs=n_docs,
            n_docs_pad=n_docs_pad,
            n_chunks_pad=n_chunks_pad,
            n_terms=art.n_terms,
            nnz=nnz,
            posting_cap=int(posting_cap),
        )
