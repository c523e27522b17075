"""Build a x-K measurement replica of a testdata scale-factor dir.

Measurement sidecar ONLY (optimization guide 1.1: measure at a scale
where leaves run for seconds). The driver's own sf1.0 tables are not
available in the sandbox, so we scale sf0.1 by K with transforms chosen
so per-replica structure is preserved and replicas do not cross-match:

- integer keys shifted by replica*span (FK relationships preserved
  within a replica: orders.o_custkey shifts with customer.c_custkey,
  lineitem's three FKs shift with their parents);
- high-cardinality doubles jittered by replica*1e-4 so distinct-value
  counts scale ~linearly like a real bigger generation would;
- documents.text: every word gets a per-replica suffix letter, which
  keeps ALL intra-replica structure exactly (dup spans, near-dup pairs,
  ngram repetition, per-doc lengths) while making cross-replica
  Jaccard 0 and scaling the corpus vocabulary by K;
- embeddings: vector components permuted by a per-replica seeded
  permutation — norms and intra-replica pairwise geometry are exactly
  preserved, cross-replica cosine decorrelates;
- region/nation copied once (dimensions; nationkey FKs stay valid).

Usage: python tools/make_bigsf.py [SRC_DIR] [DST_DIR] [K]
Defaults: /root/testdata/sf0.1 /root/sfbig 10
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/sfbig"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# key-shift spans, comfortably above each table's max key at sf0.1
SPAN = {
    "c_custkey": 10**6,
    "s_suppkey": 10**5,
    "p_partkey": 10**6,
    "o_orderkey": 10**7,
    "o_custkey": 10**6,
    "l_orderkey": 10**7,
    "l_partkey": 10**6,
    "l_suppkey": 10**5,
    "event_id": 10**7,
    "user_id": 10**6,
    "doc_id": 10**6,
    "vec_id": 10**6,
}
JITTER = {"c_acctbal", "s_acctbal", "o_totalprice", "l_extendedprice",
          "p_retailprice", "value"}

_WORD = re.compile(r"\w+", re.UNICODE)


def doc_suffix(texts: list, i: int) -> list:
    sfx = chr(ord("a") + i)
    return [None if t is None else _WORD.sub(lambda m: m.group(0) + sfx, t)
            for t in texts]


def replicate(name: str, tbl: pa.Table) -> pa.Table:
    parts = []
    ncols = tbl.column_names
    emb_dim = None
    if name == "embeddings":
        emb_dim = len(tbl.column("embedding")[0].as_py())
    for i in range(K):
        cols = []
        for cn in ncols:
            col = tbl.column(cn).combine_chunks()
            if cn in SPAN and i > 0:
                col = pc.add(col, i * SPAN[cn])
            elif cn in JITTER and i > 0:
                col = pc.add(col, float(i) * 1e-4)
            elif name == "documents" and cn == "text" and i > 0:
                col = pa.array(doc_suffix(col.to_pylist(), i),
                               type=col.type)
            elif name == "embeddings" and cn == "embedding" and i > 0:
                rng = np.random.default_rng(1234 + i)
                perm = rng.permutation(emb_dim)
                flat = np.asarray(col.flatten())
                mat = flat.reshape(-1, emb_dim)[:, perm]
                col = pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.ravel(), type=pa.float32()), emb_dim
                ).cast(col.type)
            cols.append(col)
        parts.append(pa.table(cols, names=ncols))
    return pa.concat_tables(parts)


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    for fn in sorted(os.listdir(SRC)):
        if not fn.endswith(".parquet"):
            continue
        name = fn[: -len(".parquet")]
        tbl = pq.read_table(os.path.join(SRC, fn))
        if name not in ("region", "nation"):
            tbl = replicate(name, tbl)
        pq.write_table(tbl, os.path.join(DST, fn), compression="snappy",
                       row_group_size=1 << 20)
        print(f"{name}: {tbl.num_rows} rows")


if __name__ == "__main__":
    main()
