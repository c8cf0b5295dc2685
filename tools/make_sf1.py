#!/usr/bin/env python
"""Deterministic sf1 stress tier: 10x sf0.1, built by structured replication.

The driver ships sf0.001/0.01/0.1; every "designed for 100 TB" claim is
measured over that range, so the strongest remaining validation is one
more decade (r6 verdict #1). This generator extends the fixture family
to sf1 WITHOUT guessing at the driver's generator internals, by
replicating sf0.1 ten times with structure-preserving transforms:

* TPC-H-ish tables: replica r offsets every primary AND foreign key by
  r * (base key range), so referential integrity, join fan-outs, and
  per-key group sizes are preserved exactly — each replica is a disjoint
  copy of the same relational structure, and global aggregates grow 10x.
  Fixed dims (region, nation) stay fixed, as they would at any SF.
* events: ids/users offset, timestamps UNCHANGED — the same 30-day span
  now carries 10x the event density, which is precisely the stress that
  matters for window/sessionize/funnel state sizes.
* documents: replica r applies a vocabulary ROTATION (the corpus is
  word-salad over a 31-word vocab; word -> vocab[(idx + 7r) mod 31], 7
  coprime to 31). Within a replica the duplicate/near-dup structure is
  byte-for-byte the base corpus's; across replicas no n-gram of any
  order is shared (every word differs), so MinHash/SimHash/ngram pair
  counts scale exactly 10x instead of exploding quadratically through
  cross-replica accidental near-dups. n_chars is recomputed (rotation
  changes word lengths).
* embeddings: replicas get FRESH unit vectors (seeded per replica) with
  uniform labels — the driver fixture is measured isotropic (cosine std
  = 1/sqrt(64), zero label lift; docs/SCALE.md), and fresh isotropic
  vectors preserve that exactly while 10x-ing candidate-bucket load.
  Replicating vectors verbatim would instead create 10-copy exact-dup
  clusters and rewrite every top-k result's character.

Deterministic end to end (fixed seeds, no wall clock); DuckDB oracles
run unchanged against the output directory, so check_oracle --sf works
at sf1 where runtime permits.

``--scale 100`` builds the sf10 tier (the FIFTH decade) from the same
sf0.1 base. Replicas 0..9 are bit-identical to sf1's (the r9 scaling
curve can difference the two tiers); document replicas past the 31
available vocabulary ROTATIONS switch to affine maps over the word
index (w -> vocab[(a*idx + b) mod 31], a = 1 + r//31, b = 7r mod 31 —
reduces to the rotation for r <= 30): two distinct affine maps agree on
at most ONE vocab word, so cross-replica shared n-grams are limited to
same-word runs (J << any dedup threshold) and pair counts still scale
linearly in replicas instead of quadratically.

Usage: python tools/make_sf1.py [--out /root/repo/.scratch/testdata/sf1]
       [--scale 10]
"""

from __future__ import annotations

import argparse
import os
import shutil

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.1"
SCALE = 10

# base key ranges (exclusive upper bounds) at sf0.1 — replica r adds r*range
RANGES = {
    "c_custkey": 15_000,
    "s_suppkey": 1_000,
    "p_partkey": 20_000,
    "o_orderkey": 150_000,
    "event_id": 100_000,
    "user_id": 1_500,
    "doc_id": 5_000,
    "vec_id": 2_000,
}

# table -> key columns to offset (all offset by that key's own base range)
OFFSET_TABLES = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", ("o_custkey", "c_custkey")],
    "lineitem": [
        ("l_orderkey", "o_orderkey"),
        ("l_partkey", "p_partkey"),
        ("l_suppkey", "s_suppkey"),
    ],
    "events": ["event_id", "user_id"],
}


def replicate_sql(con: duckdb.DuckDBPyConnection, table: str, out_dir: str,
                  scale: int = SCALE) -> int:
    cols = [
        r[0]
        for r in con.sql(f"describe select * from '{BASE}/{table}.parquet'").fetchall()
    ]
    offsets = {}
    for spec in OFFSET_TABLES[table]:
        col, rng_key = (spec, spec) if isinstance(spec, str) else spec
        offsets[col] = RANGES[rng_key]
    sel = ", ".join(
        f"{c} + r.r * {offsets[c]} AS {c}" if c in offsets else c for c in cols
    )
    out = f"{out_dir}/{table}.parquet"
    con.sql(
        f"COPY (SELECT {sel} FROM '{BASE}/{table}.parquet', range({scale}) r(r) "
        f"ORDER BY r.r) TO '{out}' (FORMAT PARQUET)"
    )
    return con.sql(f"select count(*) from '{out}'").fetchone()[0]


def replicate_documents(out_dir: str, scale: int = SCALE) -> int:
    t = pq.read_table(f"{BASE}/documents.parquet")
    doc_ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    sources = t.column("source").to_pylist()
    vocab = sorted({w for s in texts for w in s.split(" ") if w})
    idx = {w: i for i, w in enumerate(vocab)}
    v = len(vocab)
    # enforced HERE, not only in main() (r10 advice): at r >= v*(v-1) the
    # multiplier a = 1 + r//v hits a % v == 0, the affine map degenerates
    # to a constant, and replicas become whole-corpus exact duplicates —
    # the precise hazard the cap documents (v=31 -> 930 for the fixture)
    if scale > v * (v - 1):
        raise ValueError(
            f"documents cannot replicate past {v * (v - 1)} (distinct "
            f"affine maps over the {v}-word vocab run out); use "
            "tools/near_dup_realism.py's generator for large doc corpora"
        )

    out_ids, out_texts, out_langs, out_srcs, out_n = [], [], [], [], []
    for r in range(scale):
        # affine word map over the vocab index: a=1 for r < v reduces to
        # the sf1 rotation exactly; distinct (a, b) pairs agree on at most
        # one word, so replicas never share a multi-word n-gram beyond
        # same-word runs (see module docstring)
        a, b = 1 + r // v, (7 * r) % v
        for d, s, lang, src in zip(doc_ids, texts, langs, sources):
            if a != 1 or b:
                s = " ".join(
                    vocab[(a * idx[w] + b) % v] if w else w for w in s.split(" ")
                )
            out_ids.append(d + r * RANGES["doc_id"])
            out_texts.append(s)
            out_langs.append(lang)
            out_srcs.append(src)
            out_n.append(len(s))
    out = pa.table(
        {
            "doc_id": pa.array(out_ids, pa.int64()),
            "text": pa.array(out_texts, pa.string()),
            "lang": pa.array(out_langs, pa.string()),
            "source": pa.array(out_srcs, pa.string()),
            "n_chars": pa.array(out_n, pa.int64()),
        }
    )
    pq.write_table(out, f"{out_dir}/documents.parquet")
    return out.num_rows


def _emb_chunk_table(ids: np.ndarray, vecs: np.ndarray, labels: np.ndarray) -> pa.Table:
    """Arrow table from flat numpy — ListArray.from_arrays instead of
    tolist(), so the scale-1000 (2M-vector) tier never materializes 128M
    Python float objects. Values identical to the tolist() path."""
    n, d = vecs.shape
    emb = pa.ListArray.from_arrays(
        pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32)),
        pa.array(vecs.reshape(-1), pa.float32()),
    ).cast(pa.list_(pa.float32()))
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": emb,
            "label": pa.array(labels, pa.int32()),
        }
    )


def replicate_embeddings(out_dir: str, scale: int = SCALE,
                         chunk_replicas: int = 100) -> int:
    if scale < 1:
        # the r1..scale chunk loop below never runs at scale 0, which
        # would silently write NO embeddings.parquet (the pre-chunking
        # path always wrote at least the base fixture) — refuse instead
        raise ValueError(f"replicate_embeddings needs scale >= 1, got {scale}")
    t = pq.read_table(f"{BASE}/embeddings.parquet")
    base_ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    base_vecs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    base_labels = np.asarray(t.column("label").to_pylist(), dtype=np.int32)
    n, d = base_vecs.shape

    writer = None
    total = 0
    ids, vecs, labels = [base_ids], [base_vecs], [base_labels]
    try:
        for r in range(1, scale + 1):
            if r < scale:
                rng = np.random.default_rng(420_000 + r)
                g = rng.standard_normal((n, d)).astype(np.float32)
                g /= np.linalg.norm(g, axis=1, keepdims=True)
                ids.append(base_ids + r * RANGES["vec_id"])
                vecs.append(g)
                labels.append(rng.integers(0, 10, size=n).astype(np.int32))
            if ids and (r == scale or len(ids) >= chunk_replicas):
                chunk = _emb_chunk_table(
                    np.concatenate(ids), np.concatenate(vecs), np.concatenate(labels)
                )
                if writer is None:
                    writer = pq.ParquetWriter(
                        f"{out_dir}/embeddings.parquet", chunk.schema
                    )
                writer.write_table(chunk)
                total += chunk.num_rows
                ids, vecs, labels = [], [], []
    finally:
        if writer is not None:
            writer.close()
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/.scratch/testdata/sf1")
    ap.add_argument("--scale", type=int, default=SCALE,
                    help="replication factor over sf0.1 (100 = the sf10 tier)")
    ap.add_argument("--tables", default=None,
                    help="comma list to build a partial tier (e.g. "
                    "'embeddings' for the sixth-decade ANN corpus — the "
                    "document affine-map family caps at 30*31 = 930 "
                    "distinct maps, so a full-fixture scale-1000 tier is "
                    "not constructible; embeddings replicate at any scale)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    wanted = set(args.tables.split(",")) if args.tables else None

    def want(t: str) -> bool:
        return wanted is None or t in wanted

    if args.scale > 930 and want("documents"):
        raise SystemExit(
            "documents cannot replicate past 930 (distinct affine maps over "
            "the 31-word vocab run out); pass --tables without documents, or "
            "use tools/near_dup_realism.py's generator for large doc corpora"
        )

    for t in ("region", "nation"):
        if want(t):
            shutil.copyfile(f"{BASE}/{t}.parquet", f"{args.out}/{t}.parquet")
            print(f"{t}: copied (fixed dim)")

    con = duckdb.connect()
    for t in OFFSET_TABLES:
        if want(t):
            print(f"{t}: {replicate_sql(con, t, args.out, args.scale)} rows")
    if want("documents"):
        print(f"documents: {replicate_documents(args.out, args.scale)} rows")
    if want("embeddings"):
        print(f"embeddings: {replicate_embeddings(args.out, args.scale)} rows")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
