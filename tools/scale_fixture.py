#!/usr/bin/env python
"""Synthesize a k×-scaled copy of a testdata sf directory for the
round-10 scale spot-bench (VERDICT r9 next #5: "sf0.01-green cannot
bound sf0.5 arithmetic" — the ANSI-overflow / super-linear-blowup class
needs one measurement ABOVE bench scale).

The real testdata tops out at sf0.1 and is read-only, so scaling is done
by k-fold replication with consistent key shifting (DuckDB, no Spark):

- every surrogate key domain (custkey, orderkey, partkey, suppkey,
  doc_id, vec_id, event_id, user_id) shifts by ``i * (max(key)+1)`` for
  replica i, applied to BOTH sides of each FK edge, so referential
  structure (join fan-outs, group sizes per key) is preserved exactly;
  user_id shifts by the CUSTKEY stride (its domain is a subset of
  custkey) so replica-i events join replica-i customers, not replica-0;
- dimension tables (region, nation) and dim FKs (c_nationkey …) are NOT
  shifted — dims stay dims, exactly like a bigger TPC-H SF;
- replica i>0 documents get a replica token prefixed to ``text`` (and
  n_chars recomputed) so the dedup/near-dup tiers see a k×-LARGER corpus,
  not k exact copies of the same corpus (exact-duplicate blowup is the
  separate, already-measured viral-duplicate sweep);
- replica i>0 embeddings perturb dimension 0 by ``i * 0.173`` for the
  same reason (cosine-pair screens must not see k-fold identical
  vectors).

Usage: python tools/scale_fixture.py <k> <out_dir> [base_sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

BASE_DEFAULT = "/root/testdata/sf0.1"

# (table, [(column, key_domain)]) — key_domain names a shift stride shared
# across every column in that domain, keeping FK edges consistent.
SHIFTS = {
    "region": [],
    "nation": [],
    "supplier": [("s_suppkey", "suppkey")],
    "customer": [("c_custkey", "custkey")],
    "part": [("p_partkey", "partkey")],
    "orders": [("o_orderkey", "orderkey"), ("o_custkey", "custkey")],
    "lineitem": [
        ("l_orderkey", "orderkey"),
        ("l_partkey", "partkey"),
        ("l_suppkey", "suppkey"),
    ],
    "events": [("event_id", "eventid"), ("user_id", "userid")],
    "documents": [("doc_id", "docid")],
    "embeddings": [("vec_id", "vecid")],
}

# key_domain -> (table, column) that defines its stride
STRIDE_SOURCE = {
    "suppkey": ("supplier", "s_suppkey"),
    "custkey": ("customer", "c_custkey"),
    "partkey": ("part", "p_partkey"),
    "orderkey": ("orders", "o_orderkey"),
    "eventid": ("events", "event_id"),
    # user_id's domain is a SUBSET of custkey (verified: every user_id is a
    # c_custkey at sf0.01 and sf0.1), so it must shift by the custkey stride
    # — shifting by its own max+1 would join replica-i events back to
    # replica-0's customer slice (ADVICE r10).
    "userid": ("customer", "c_custkey"),
    "docid": ("documents", "doc_id"),
    "vecid": ("embeddings", "vec_id"),
}


def build(k: int, out_dir: str, base: str = BASE_DEFAULT) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    strides = {
        dom: con.execute(
            f"SELECT MAX({col}) + 1 FROM read_parquet('{base}/{tbl}.parquet')"
        ).fetchone()[0]
        for dom, (tbl, col) in STRIDE_SOURCE.items()
    }
    for tbl, shifts in SHIFTS.items():
        src = f"read_parquet('{base}/{tbl}.parquet')"
        if not shifts:  # dims copy through once — they are not scaled
            con.execute(
                f"COPY (SELECT * FROM {src}) TO '{out_dir}/{tbl}.parquet' (FORMAT PARQUET)"
            )
            continue
        parts = []
        for i in range(k):
            sel = []
            cols = [
                r[0]
                for r in con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()
            ]
            shift_map = {c: dom for c, dom in shifts}
            for c in cols:
                if c in shift_map:
                    sel.append(f"{c} + {i * strides[shift_map[c]]} AS {c}")
                elif tbl == "documents" and c == "text" and i > 0:
                    sel.append(f"'r{i}x ' || text AS text")
                elif tbl == "documents" and c == "n_chars" and i > 0:
                    sel.append(f"n_chars + {len(f'r{i}x ')} AS n_chars")
                elif tbl == "embeddings" and c == "embedding" and i > 0:
                    sel.append(
                        "list_prepend(CAST(embedding[1] + "
                        f"{i * 0.173} AS FLOAT), embedding[2:]) AS embedding"
                    )
                else:
                    sel.append(c)
            parts.append(f"SELECT {', '.join(sel)} FROM {src}")
        union = "\nUNION ALL\n".join(parts)
        con.execute(
            f"COPY ({union}) TO '{out_dir}/{tbl}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out_dir}/{tbl}.parquet')"
        ).fetchone()[0]
        print(f"{tbl}: {n} rows")


if __name__ == "__main__":
    k = int(sys.argv[1])
    out = sys.argv[2]
    base = sys.argv[3] if len(sys.argv) > 3 else BASE_DEFAULT
    build(k, out, base)
    print(f"DONE: {out} at {k}x of {base}")
