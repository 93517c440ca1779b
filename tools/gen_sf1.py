"""Generate an sf1-scale dataset by structure-preserving replication of
the driver's sf0.1 testdata (VERDICT r14 ask #7: measure the sf0.1 → sf1
decade empirically instead of extrapolating SCALE.md §9's exponents).

The driver's own decade rule (verified sf0.01 → sf0.1) is: ×10 for
orders/lineitem/events/customer/part/supplier (and the user-id space),
×10 documents, ×4 embeddings, region/nation fixed. This generator applies
the same rule one more decade, deterministically (seed fixed), WITHOUT
touching the read-only /root/testdata:

- Relational tables replicate ×10 with per-replica key strides (stride =
  the original key-space size), so every join's per-key fan-in/out, group
  sizes, and value distributions are EXACTLY the originals — the data is
  10 disjoint congruent shards. Graph queries therefore see 10 disjoint
  copies of the sf0.1 graph (documented: a real sf1 graph would be one
  connected component, but shuffle width and per-round volume — the
  things the probe measures — scale identically).
- events keeps its time window (10× density, 10× users) — minute buckets
  grow 10×, sessions-per-user stay constant, matching the driver's rule.
- documents: replica 0 is the original corpus (its near-dup structure
  intact); replicas 1-9 are per-doc seeded WORD SHUFFLES — same length,
  same unigram stats, but shingle/minhash overlap across replicas ~0, so
  the corpus-wide near-dup pair count stays sf0.1-sized while the
  LSH/banding volume scales ×10 (exactly the "bands×docs fixed-width"
  claim the probe is meant to test; replicated-verbatim text would
  instead explode candidate pairs quadratically and measure a different
  workload).
- embeddings: replica 0 original; replicas 1-3 are the original vectors
  under a per-replica random ORTHOGONAL rotation — within-replica
  geometry (labels, neighbor structure, norms) preserved, cross-replica
  cosines ~0, so ANN work scales with corpus size without manufacturing
  fake near-duplicates.

Parquet schemas are copied from the source files (timestamp[us] etc.), so
load_table treats sf1 exactly like sf0.1.

Usage: python tools/gen_sf1.py [dst_dir]   (default /root/repo/testdata_sf1)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
SEED = 42

# table -> (n_replicas, {column: stride})
REPLICATION: dict[str, tuple[int, dict[str, int]]] = {
    "customer": (10, {"c_custkey": 15_000}),
    "supplier": (10, {"s_suppkey": 1_000}),
    "part": (10, {"p_partkey": 20_000}),
    "orders": (10, {"o_orderkey": 150_000, "o_custkey": 15_000}),
    "lineitem": (
        10,
        {"l_orderkey": 150_000, "l_partkey": 20_000, "l_suppkey": 1_000},
    ),
    "events": (10, {"event_id": 100_000, "user_id": 1_500}),
}


def replicate_keyshift(
    src: str, dst: str, n: int, strides: dict[str, int]
) -> int:
    t = pq.read_table(src)
    parts = [t]
    for r in range(1, n):
        cols = []
        for name in t.column_names:
            col = t.column(name)
            if name in strides:
                col = pc.add(col, pa.scalar(r * strides[name], col.type))
            cols.append(col)
        parts.append(pa.table(cols, schema=t.schema))
    out = pa.concat_tables(parts)
    pq.write_table(out, dst, compression="snappy", version="2.6")
    return out.num_rows


def replicate_documents(src: str, dst: str, n: int = 10) -> int:
    t = pq.read_table(src)
    doc_ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    stride = 5_000
    parts = [t]
    for r in range(1, n):
        new_texts = []
        for did, txt in zip(doc_ids, texts):
            if txt is None:
                new_texts.append(None)
                continue
            words = txt.split()
            rng = np.random.default_rng(SEED * 1_000_003 + r * 100_003 + did)
            rng.shuffle(words)
            new_texts.append(" ".join(words))
        cols = {
            "doc_id": pc.add(t.column("doc_id"), pa.scalar(r * stride, pa.int64())),
            "text": pa.array(new_texts, pa.string()),
            "lang": t.column("lang"),
            "source": t.column("source"),
            "n_chars": pa.array(
                [len(x) if x is not None else None for x in new_texts],
                pa.int64(),
            ),
        }
        parts.append(pa.table([cols[c] for c in t.column_names], schema=t.schema))
    out = pa.concat_tables(parts)
    pq.write_table(out, dst, compression="snappy", version="2.6")
    return out.num_rows


def replicate_embeddings(src: str, dst: str, n: int = 4) -> int:
    t = pq.read_table(src)
    embs = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    dim = embs.shape[1]
    stride = embs.shape[0]
    parts = [t]
    for r in range(1, n):
        rng = np.random.default_rng(SEED * 7_919 + r)
        q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
        rotated = (embs @ q.T.astype(np.float32)).astype(np.float32)
        cols = {
            "vec_id": pc.add(t.column("vec_id"), pa.scalar(r * stride, pa.int64())),
            "embedding": pa.array(
                [row.tolist() for row in rotated], pa.list_(pa.float32())
            ),
            "label": t.column("label"),
        }
        parts.append(pa.table([cols[c] for c in t.column_names], schema=t.schema))
    out = pa.concat_tables(parts)
    pq.write_table(out, dst, compression="snappy", version="2.6")
    return out.num_rows


def generate_relational(
    dst_dir: str, src: str = SRC, with_documents: bool = True
) -> dict[str, int]:
    """Generate the sf1 replica into ``dst_dir`` from ``src`` (default:
    the driver's sf0.1 testdata). ``with_documents=False`` skips the
    word-shuffled document replicas (a driver-side python loop — the one
    expensive generation step) and COPIES the source corpus instead; the
    bench's sf1 heavy tier uses that mode because none of its tier
    queries read documents. Returns {table: rows} for the generated
    tables. Deterministic (fixed SEED) — every run regenerates the same
    bytes from the same source; nothing is cached across runs."""
    os.makedirs(dst_dir, exist_ok=True)
    out: dict[str, int] = {}
    for name in ("region", "nation"):
        shutil.copyfile(f"{src}/{name}.parquet", f"{dst_dir}/{name}.parquet")
    for name, (n, strides) in REPLICATION.items():
        out[name] = replicate_keyshift(
            f"{src}/{name}.parquet", f"{dst_dir}/{name}.parquet", n, strides
        )
    if with_documents:
        out["documents"] = replicate_documents(
            f"{src}/documents.parquet", f"{dst_dir}/documents.parquet"
        )
    else:
        shutil.copyfile(
            f"{src}/documents.parquet", f"{dst_dir}/documents.parquet"
        )
    out["embeddings"] = replicate_embeddings(
        f"{src}/embeddings.parquet", f"{dst_dir}/embeddings.parquet"
    )
    return out


def main() -> int:
    dst_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    t0 = time.time()
    rows = generate_relational(dst_dir, SRC, with_documents=True)
    for name, n in rows.items():
        print(f"{name}: {n} rows")
    print(f"done in {time.time() - t0:.1f}s -> {dst_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
