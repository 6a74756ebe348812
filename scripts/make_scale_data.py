"""Generate a derived sf1 dataset for scale evidence (SURVEY §8).

The driver ships sf0.001/0.01/0.1 (read-only); scaling evidence above
sf0.1 needs a 10x corpus.  This script derives ``.scale/sf1/`` from
``/root/testdata/sf0.1`` by DETERMINISTIC 10x replication: copy ``i``
of each fact row gets every key shifted by ``i * (max_key + 1)`` so
per-copy referential integrity holds (copy i of lineitem joins copy i
of orders/part/supplier, etc.) and join fan-outs stay realistic at
exactly 10x the rows.  Dimension tables (region, nation) keep their
cardinality — exactly how TPC-H itself scales.

Text and embeddings are PERTURBED per copy, not duplicated verbatim:
- documents: in copy i>0, every third token (phase-shifted by copy) is
  suffixed with the copy number, pushing cross-copy n-gram Jaccard /
  MinHash similarity well below dedup thresholds.  Without this, each
  base doc's 10 near-identical variants would meet in the same LSH
  buckets and the candidate stage would grow quadratically in the copy
  count — a duplication artifact, not a property of a 10x corpus — and
  the measured scaling ratios would be meaningless.
- embeddings: copy i>0 coordinates get a small deterministic
  copy-and-dimension-dependent offset, so ANN buckets/cells spread
  instead of stacking 10 identical vectors per point.

Everything is plain DuckDB SQL — deterministic, no RNG, re-runnable.

Usage: python scripts/make_scale_data.py [out_dir] (default .scale/sf1)
"""

from __future__ import annotations

import pathlib
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
# replication factor; override with a second CLI arg for deeper points
# (e.g. ``python scripts/make_scale_data.py .scale/sf5 50``)
COPIES = 10


def main() -> None:
    global COPIES
    out = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else ".scale/sf1")
    if len(sys.argv) > 2:
        COPIES = int(sys.argv[2])
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW copies AS SELECT unnest(range(0, {COPIES})) AS i")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW src_{t} AS SELECT * FROM '{SRC}/{t}.parquet'"
        )

    # key shift per table: max_key + 1 of the sf0.1 base
    shift = {
        "cust": con.execute("SELECT max(c_custkey)+1 FROM src_customer").fetchone()[0],
        "supp": con.execute("SELECT max(s_suppkey)+1 FROM src_supplier").fetchone()[0],
        "part": con.execute("SELECT max(p_partkey)+1 FROM src_part").fetchone()[0],
        "ord": con.execute("SELECT max(o_orderkey)+1 FROM src_orders").fetchone()[0],
        "ev": con.execute("SELECT max(event_id)+1 FROM src_events").fetchone()[0],
        "user": con.execute("SELECT max(user_id)+1 FROM src_events").fetchone()[0],
        "doc": con.execute("SELECT max(doc_id)+1 FROM src_documents").fetchone()[0],
        "vec": con.execute("SELECT max(vec_id)+1 FROM src_embeddings").fetchone()[0],
    }

    sql = {
        "region": "SELECT * FROM src_region",
        "nation": "SELECT * FROM src_nation",
        "customer": f"""
            SELECT c_custkey + i*{shift['cust']} AS c_custkey,
                   c_name || '#' || i AS c_name, c_nationkey, c_acctbal,
                   c_mktsegment
            FROM src_customer, copies""",
        "supplier": f"""
            SELECT s_suppkey + i*{shift['supp']} AS s_suppkey,
                   s_name || '#' || i AS s_name, s_nationkey, s_acctbal
            FROM src_supplier, copies""",
        "part": f"""
            SELECT p_partkey + i*{shift['part']} AS p_partkey,
                   p_name || '#' || i AS p_name, p_brand, p_type, p_size,
                   p_retailprice
            FROM src_part, copies""",
        "orders": f"""
            SELECT o_orderkey + i*{shift['ord']} AS o_orderkey,
                   o_custkey + i*{shift['cust']} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM src_orders, copies""",
        "lineitem": f"""
            SELECT l_orderkey + i*{shift['ord']} AS l_orderkey,
                   l_partkey + i*{shift['part']} AS l_partkey,
                   l_suppkey + i*{shift['supp']} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM src_lineitem, copies""",
        # same time range, 10x the users/events: density scales, windows
        # and sessionization see 10x load per time bucket.
        "events": f"""
            SELECT event_id + i*{shift['ev']} AS event_id, ts,
                   user_id + i*{shift['user']} AS user_id,
                   event_type, value, props
            FROM src_events, copies""",
        "documents": f"""
            SELECT doc_id + i*{shift['doc']} AS doc_id,
                   CASE WHEN i = 0 THEN text ELSE
                       list_aggregate(
                           list_transform(string_split(text, ' '),
                               (tok, p) -> CASE WHEN (p + i*7) % 3 = 0
                                           THEN tok || i ELSE tok END),
                           'string_agg', ' ')
                   END AS text,
                   lang, source,
                   CAST(length(CASE WHEN i = 0 THEN text ELSE
                       list_aggregate(
                           list_transform(string_split(text, ' '),
                               (tok, p) -> CASE WHEN (p + i*7) % 3 = 0
                                           THEN tok || i ELSE tok END),
                           'string_agg', ' ')
                   END) AS BIGINT) AS n_chars
            FROM src_documents, copies""",
        "embeddings": f"""
            SELECT vec_id + i*{shift['vec']} AS vec_id,
                   CAST(list_transform(CAST(embedding AS DOUBLE[]),
                       (x, d) -> x + i * 0.003 * (((d*7 + i*3) % 5) - 2))
                       AS FLOAT[]) AS embedding,
                   label
            FROM src_embeddings, copies""",
    }

    for t, q in sql.items():
        con.execute(
            f"COPY ({q}) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
