"""Generate a larger SF by key-shifted replication of an existing SF dir.

The driver provides sf0.001/0.01/0.1 only; the scale probe (VERDICT r6/r7
item #1) needs data above 600k lineitem rows. This derives an sfN-equivalent
from the driver's own sf0.1 by unioning R key-shifted copies, preserving
join consistency (every shifted fact key points at the matching shifted
dimension row):

  customer.c_custkey, orders.o_custkey        += i * stride(custkey)
  orders.o_orderkey, lineitem.l_orderkey      += i * stride(orderkey)
  part.p_partkey, lineitem.l_partkey          += i * stride(partkey)
  supplier.s_suppkey, lineitem.l_suppkey      += i * stride(suppkey)
  region/nation                                unchanged (fixed-size in TPC-H)
  events.event_id                             += i * stride; ts/user_id kept
  documents.doc_id += i * stride; replica text gets a ' r{i}' suffix so
      replicas are near-dups (realistic dedup stress), n_chars recomputed
  embeddings.vec_id += i * stride; vectors kept byte-identical (ANN ties
      must resolve via the vec_id tiebreakers every oracle carries)

Strides are round powers of ten above the source max key, so replica
membership is readable from the key (replica = key // stride).

Usage: python tools/scale_up.py SRC_DIR DST_DIR REPLICAS [--exact-text]
e.g.   python tools/scale_up.py /root/testdata/sf0.1 scale_data/sf1 10

--exact-text keeps replica document text byte-identical (no ' r{i}'
suffix): the corpus becomes R-way EXACT-duplicate families, the regime
the rule-7 collapse paths (ngram_jaccard_pairs / minhash / simhash /
embedding collapse_exact) are built for — use it to MEASURE those wins
above sf0.1, where the default near-dup perturbation hides them.
"""

import math
import os
import sys

import duckdb


def _stride(con: duckdb.DuckDBPyConnection, path: str, col: str) -> int:
    mx = con.sql(f"SELECT max({col}) FROM '{path}'").fetchone()[0]
    return 10 ** math.ceil(math.log10(int(mx) + 1))


def scale_up(
    src: str, dst: str, replicas: int, exact_text: bool = False
) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {min(16, os.cpu_count() or 8)}")

    p = {t: f"{src}/{t}.parquet" for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings".split()
    )}
    s_cust = _stride(con, p["customer"], "c_custkey")
    s_ord = _stride(con, p["orders"], "o_orderkey")
    s_part = _stride(con, p["part"], "p_partkey")
    s_supp = _stride(con, p["supplier"], "s_suppkey")
    s_evt = _stride(con, p["events"], "event_id")
    s_doc = _stride(con, p["documents"], "doc_id")
    s_vec = _stride(con, p["embeddings"], "vec_id")
    print(f"strides: cust={s_cust} ord={s_ord} part={s_part} supp={s_supp} "
          f"evt={s_evt} doc={s_doc} vec={s_vec}")

    con.execute(f"CREATE TABLE reps AS SELECT unnest(range({replicas})) AS i")

    def write(table: str, select: str) -> None:
        out = f"{dst}/{table}.parquet"
        con.execute(
            f"COPY ({select}) TO '{out}' (FORMAT PARQUET, COMPRESSION ZSTD)"
        )
        n = con.sql(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"  {table}: {n} rows")

    # Fixed-size dimensions: copy through unchanged.
    write("region", f"SELECT * FROM '{p['region']}'")
    write("nation", f"SELECT * FROM '{p['nation']}'")

    write("customer", f"""
        SELECT c_custkey + i*{s_cust} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM '{p['customer']}' CROSS JOIN reps""")
    write("supplier", f"""
        SELECT s_suppkey + i*{s_supp} AS s_suppkey, s_name, s_nationkey,
               s_acctbal
        FROM '{p['supplier']}' CROSS JOIN reps""")
    write("part", f"""
        SELECT p_partkey + i*{s_part} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice
        FROM '{p['part']}' CROSS JOIN reps""")
    write("orders", f"""
        SELECT o_orderkey + i*{s_ord} AS o_orderkey,
               o_custkey + i*{s_cust} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{p['orders']}' CROSS JOIN reps""")
    write("lineitem", f"""
        SELECT l_orderkey + i*{s_ord} AS l_orderkey,
               l_partkey + i*{s_part} AS l_partkey,
               l_suppkey + i*{s_supp} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM '{p['lineitem']}' CROSS JOIN reps""")
    write("events", f"""
        SELECT event_id + i*{s_evt} AS event_id, ts, user_id, event_type,
               value, props
        FROM '{p['events']}' CROSS JOIN reps""")
    # Replica docs get a short suffix: near-duplicates of the original
    # (Jaccard stays high) rather than exact clones, so both exact- and
    # near-dup operators see realistic 10-way clusters. --exact-text
    # skips the suffix: byte-identical R-way families, the rule-7
    # collapse measurement regime.
    doc_text = (
        "text"
        if exact_text
        else "CASE WHEN i = 0 OR text IS NULL THEN text "
             "ELSE text || ' r' || i END"
    )
    write("documents", f"""
        SELECT doc_id + i*{s_doc} AS doc_id,
               {doc_text} AS text,
               lang, source,
               length({doc_text}) AS n_chars
        FROM '{p['documents']}' CROSS JOIN reps""")
    write("embeddings", f"""
        SELECT vec_id + i*{s_vec} AS vec_id, embedding, label
        FROM '{p['embeddings']}' CROSS JOIN reps""")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--exact-text"]
    src, dst, replicas = args[0], args[1], int(args[2])
    scale_up(src, dst, replicas, exact_text="--exact-text" in sys.argv)
