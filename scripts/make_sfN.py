"""Synthesize a larger scale point by key-remapped duplication of an
existing one (round-4 directive #4): ``mult`` copies of every fact table
with disjoint key ranges, so joins stay FK-consistent, group cardinalities
scale with the data, and no cross-copy row collapses into a duplicate.

Per-copy transforms (copy k = 0 is the identity):
  * every key column shifts by k × a per-domain offset (customer/user,
    supplier, part, order, event, doc, vec) — the SAME offset wherever the
    domain appears, so lineitem still joins orders/part/supplier and
    events still joins customer;
  * region/nation are NOT duplicated — dimensions don't grow 10× when the
    fact data does, and the FK range [0,25) must stay intact;
  * documents.text gets a per-copy suffix on EVERY token ("-c3"), shifting
    all shingles so copies are not near-duplicates of each other — the
    dup/near-dup RATE stays that of the source corpus instead of
    exploding quadratically in mult;
  * embeddings.embedding is rotated by k positions — cosine between a
    vector and its rotated copy is ≈0 on this corpus, so ANN/dedup
    neighborhoods keep their source-scale structure.

``--skew`` (round-7, VERDICT r6 #3) switches synthesis from uniform to a
deliberately HOSTILE distribution so AQE skew handling and the dedup
family's linear-growth claim are stressed, not assumed:

  * power-law duplicate clusters: copy k of a document keeps the ORIGINAL
    text (exact duplicate of copy 0) instead of the per-copy suffix when
    doc_id % 128 == 0 (all copies → cluster size = mult), % 32 == 0
    (copies < 5), % 8 == 0 (copies < 2) — few huge clusters, some medium,
    many small, the web-crawl shape. All selectors are invariant under the
    key offsets (offsets are multiples of 128).
  * one hot source: 75% of documents (doc_id % 4 != 3) report
    source='src-hot' — the overlap matrix and per-source aggregations see
    one dominant feed.
  * one hot join key: 20% of orders (o_orderkey % 5 == 0) belong to ONE
    customer, and 20% of events (event_id % 5 == 0) to that same user —
    the customer⋈orders / user-keyed shuffles get a partition ~n/5 deep
    unless AQE splits it.

Usage: python scripts/make_sfN.py [--mult 10] [--src /root/testdata/sf0.1]
       [--dst /tmp/spark_graft_sf1] [--skew]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

#: per-domain key offsets (all ≫ any source key range, all multiples of
#: 100 so modulo-based fixture selectors keep their per-copy density)
CUST = 10_000_000  # c_custkey, o_custkey, events.user_id
SUPP = 10_000_000
PART = 10_000_000
ORDER = 100_000_000
EVENT = 100_000_000
DOC = 10_000_000
VEC = 10_000_000

KEY_OFFSETS: dict[str, dict[str, int]] = {
    "customer": {"c_custkey": CUST},
    "supplier": {"s_suppkey": SUPP},
    "part": {"p_partkey": PART},
    "orders": {"o_orderkey": ORDER, "o_custkey": CUST},
    "lineitem": {"l_orderkey": ORDER, "l_partkey": PART, "l_suppkey": SUPP},
    "events": {"event_id": EVENT, "user_id": CUST},
    "documents": {"doc_id": DOC},
    "embeddings": {"vec_id": VEC},
}

COPY_AS_IS = ["region", "nation"]


def _shift_keys(
    tbl: pa.Table, offsets: dict[str, int], k: int, offset_mult: int = 1
) -> pa.Table:
    for col, off in offsets.items():
        idx = tbl.schema.get_field_index(col)
        shifted = pc.add(
            tbl.column(col),
            pa.scalar(k * off * offset_mult, tbl.schema.field(col).type),
        )
        tbl = tbl.set_column(idx, tbl.schema.field(col), shifted)
    return tbl


def _dup_cluster_keep(doc_id: int, k: int) -> bool:
    """Skew mode: does copy ``k`` of ``doc_id`` stay an exact duplicate of
    copy 0? Power-law cluster sizes (see module docstring)."""
    if doc_id % 128 == 0:
        return True
    if doc_id % 32 == 0:
        return k < 5
    if doc_id % 8 == 0:
        return k < 2
    return False


def _copy_documents(tbl: pa.Table, k: int, skew: bool = False) -> pa.Table:
    doc_ids = tbl.column("doc_id").to_pylist() if skew else None
    if k > 0:
        suffix = f"-c{k}"
        texts = []
        for i, t in enumerate(tbl.column("text").to_pylist()):
            if skew and _dup_cluster_keep(doc_ids[i], k):
                texts.append(t or "")
            else:
                texts.append(" ".join(tok + suffix for tok in (t or "").split()))
        tbl = tbl.set_column(
            tbl.schema.get_field_index("text"),
            tbl.schema.field("text"),
            pa.array(texts, tbl.schema.field("text").type),
        )
        n_chars = pa.array(
            [len(t) for t in texts], tbl.schema.field("n_chars").type
        )
        tbl = tbl.set_column(
            tbl.schema.get_field_index("n_chars"), tbl.schema.field("n_chars"), n_chars
        )
    if skew:
        # one hot feed: 75% of every copy's documents come from 'src-hot'
        src = tbl.column("source").to_pylist()
        hot = [
            "src-hot" if d % 4 != 3 else s for d, s in zip(doc_ids, src)
        ]
        tbl = tbl.set_column(
            tbl.schema.get_field_index("source"),
            tbl.schema.field("source"),
            pa.array(hot, tbl.schema.field("source").type),
        )
    return tbl


def _skew_hot_key(tbl: pa.Table, sel_col: str, key_col: str, hot_key: int) -> pa.Table:
    """Route every row with ``sel_col % 5 == 0`` to ``hot_key`` — one key
    owning ~20% of the table in every copy."""
    sel = pa.array(
        tbl.column(sel_col).to_numpy(zero_copy_only=False) % 5 == 0
    )
    idx = tbl.schema.get_field_index(key_col)
    field = tbl.schema.field(key_col)
    hot = pc.if_else(sel, pa.scalar(hot_key, field.type), tbl.column(key_col))
    return tbl.set_column(idx, field, hot)


def _copy_embeddings(tbl: pa.Table, k: int) -> pa.Table:
    """Rotation + bounded wrap duplicates. np.roll wraps at DIM=64, so
    plain rotation made EVERY copy with the same k%64 an exact duplicate
    — clusters of size mult/64 and C(mult/64, 2)·64·n_src true-dup
    pairs, QUADRATIC in the multiplier (r10: the mult=5000 point hit
    ~385M pairs and ENOSPC'd the keep-list's verify shuffle; the old
    docstring's "size-2 clusters, linear in n" claim was simply wrong
    past mult=128). Now only the FIRST wrap (j = k//64 == 1) stays an
    exact duplicate of the j=0 copy — genuine size-2 clusters — and
    every later wrap is decorrelated by flipping the sign of a
    j-dependent ~20% element subset (deterministic; cos vs the unflipped
    rotation ≈ 1 − 2·(13/64) ≈ 0.6, well under the dup threshold), so
    duplicate RATES stay at source-corpus levels as the multiplier
    grows, matching the documents synthesis design. Copies with k < 128
    are byte-identical to the old logic, so composed scale points
    (sf1, sf10: effective mult ≤ 100) are unaffected."""
    if k == 0:
        return tbl
    j = k // 64
    if j < 2:
        # rotation (j=0) and the single exact wrap duplicate (j=1) —
        # byte-identical to the original logic for k < 128, so composed
        # scale points (sf1, sf10: effective mult ≤ 100) are unaffected
        vecs = [
            np.roll(np.asarray(v, dtype=np.float32), k).tolist()
            for v in tbl.column("embedding").to_pylist()
        ]
    else:
        # Later wraps get FRESH deterministic vectors seeded by the copy
        # index, norm-matched to the source. Diagonal ±1 decorrelation
        # (two attempts in r10) cannot keep 78 variants of the SAME
        # vector pairwise under the 0.3 dup threshold — sign-mask
        # cosines are heavy-tailed (Σ±x²/Σx², std ≈ 0.22), and the
        # first mask construction ((i·C + j) % 5) collapsed to five
        # distinct masks outright, measured as 75.8M true-dup pairs at
        # n=10M instead of the intended 128k. Independent vectors have
        # pairwise cos ~ N(0, 1/64); only band-bucket cohabitants are
        # ever verified, so above-threshold random pairs stay a few
        # percent of the Θ(1)/vector collision waste — true-dup RATES
        # no longer grow with the multiplier at all.
        src = [np.asarray(v, dtype=np.float32) for v in tbl.column("embedding").to_pylist()]
        rng = np.random.default_rng(k)
        fresh = rng.standard_normal((len(src), 64)).astype(np.float32)
        vecs = []
        for v, f in zip(src, fresh):
            nf = float(np.linalg.norm(f))
            nv = float(np.linalg.norm(v))
            # norm-match only when BOTH norms are positive: a zero-norm
            # SOURCE vector would scale every j>=2 copy to all-zeros —
            # exact duplicates of each other, quietly re-introducing the
            # quadratic true-dup blowup this path exists to avoid (ADVICE
            # r10). Zero-norm sources keep the fresh unit-scale vector.
            scale = nv / nf if (nf and nv) else 1.0
            vecs.append((f * scale).tolist())
    return tbl.set_column(
        tbl.schema.get_field_index("embedding"),
        tbl.schema.field("embedding"),
        pa.array(vecs, tbl.schema.field("embedding").type),
    )


def make_scale_point(
    src: str, dst: str, mult: int, skew: bool = False,
    tables: list[str] | None = None, offset_mult: int = 1,
) -> None:
    """``tables`` (r8, VERDICT r7 #1): restrict the ×mult duplication to
    the named fact tables; every other table is copied as-is. Used to
    build per-family scale points (e.g. embeddings ×100 → n=200k vectors
    to stress the adaptive band-width clamp) without paying the full
    ×mult on every fact table — and without re-scaling an already-scaled
    point, whose key offsets would collide (k1+k2 sums repeat)."""
    os.makedirs(dst, exist_ok=True)
    as_is = list(COPY_AS_IS)
    if tables is not None:
        unknown = set(tables) - set(KEY_OFFSETS)
        if unknown:
            raise SystemExit(f"unknown tables: {sorted(unknown)}")
        as_is += [t for t in KEY_OFFSETS if t not in tables]
    for name in as_is:
        pq.write_table(pq.read_table(os.path.join(src, f"{name}.parquet")),
                       os.path.join(dst, f"{name}.parquet"))
        print(f"{name}: copied as-is")
    hot_cust = None
    if skew:
        cust = pq.read_table(os.path.join(src, "customer.parquet"))
        hot_cust = pc.min(cust.column("c_custkey")).as_py()
        print(f"skew mode: hot customer/user key = {hot_cust}")
    # Copies stream to the writer in bounded flushes instead of one
    # giant concat (r10): the concat form held mult × table in RAM —
    # ~70 GB for lineitem at the sf100 point — and wrote row groups
    # sized by whatever pyarrow chose. Streaming bounds memory at one
    # flush buffer and pins the row-group size so the output stays
    # splittable (a single-row-group file is ONE scan partition no
    # matter its size — the r9 scan-floor lesson, this time fixed at
    # the producer). Row groups are sized by BYTES (~128 MB in-memory,
    # Spark's maxPartitionBytes default), not rows: a 4M-row flush on
    # the 260 B/row embeddings table made ~1 GB row groups — three scan
    # partitions for 10M vectors, and three GC-thrashing straggler
    # tasks in every downstream stage at the n=10M point.
    flush_bytes = 128 * 1024 * 1024
    for name, offsets in KEY_OFFSETS.items():
        if tables is not None and name not in tables:
            continue
        base = pq.read_table(os.path.join(src, f"{name}.parquet"))
        writer = None
        buf, buf_bytes, total = [], 0, 0

        def _flush():
            nonlocal writer, buf, buf_bytes, total
            if not buf:
                return
            chunk = pa.concat_tables(buf)
            if writer is None:
                writer = pq.ParquetWriter(
                    os.path.join(dst, f"{name}.parquet"), chunk.schema
                )
            # one row group per flush: in-memory flush budget ~= Spark's
            # default maxPartitionBytes, so every table scans >= 32-way
            # once it is bigger than ~4 GB regardless of row width
            writer.write_table(chunk, row_group_size=chunk.num_rows)
            total += chunk.num_rows
            buf, buf_bytes = [], 0

        for k in range(mult):
            t = _shift_keys(base, offsets, k, offset_mult)
            if name == "documents":
                t = _copy_documents(t, k, skew=skew)
            elif name == "embeddings":
                t = _copy_embeddings(t, k)
            elif skew and name == "orders":
                t = _skew_hot_key(t, "o_orderkey", "o_custkey", hot_cust)
            elif skew and name == "events":
                t = _skew_hot_key(t, "event_id", "user_id", hot_cust)
            buf.append(t)
            buf_bytes += t.nbytes
            if buf_bytes >= flush_bytes:
                _flush()
        _flush()
        if writer is not None:
            writer.close()
        print(f"{name}: {base.num_rows} -> {total} rows")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/spark_graft_sf1")
    ap.add_argument("--skew", action="store_true",
                    help="hostile distribution: power-law dup clusters, "
                         "hot source, hot join key (see module docstring)")
    ap.add_argument("--tables", default=None,
                    help="comma-separated fact tables to scale; the rest "
                         "are copied as-is (per-family scale points)")
    ap.add_argument("--offset-mult", type=int, default=1,
                    help="multiply every per-domain key offset (r8: REQUIRED "
                         "when re-scaling an already-scaled point — e.g. "
                         "sf1 -> sf10 needs --offset-mult 10, because sf1's "
                         "key ranges already span mult x offset and plain "
                         "offsets would collide: k1+k2 sums repeat)")
    args = ap.parse_args()
    tables = [t for t in args.tables.split(",") if t] if args.tables else None
    make_scale_point(args.src, args.dst, args.mult, skew=args.skew, tables=tables,
                     offset_mult=args.offset_mult)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
