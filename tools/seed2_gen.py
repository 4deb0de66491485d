#!/usr/bin/env python3
"""Second-seed TESTDATA variant generator (fixture-coincidence sweep).

Usage: python3 tools/seed2_gen.py <srcSfDir> <outDir> [seed]

CORRECTNESS runs on one driver-generated dataset (seed=42). A query
could in principle pass by coincidence of that fixture's specific
values. This tool derives a "seed 2" dataset from the same source dir
by DETERMINISTIC measure-preserving remaps — every schema, key SET,
and enum domain is preserved (so dense-range filters, FK joins, and
domain-dependent queries stay structurally valid), while the actual
values, key assignments, and row relationships all change:

  - every key column is re-assigned by a seeded PERMUTATION of its own
    key set, applied consistently across tables (FK-preserving);
  - enum domains (status, priority, segment, brand, type, flag, lang,
    source, label, event_type) are permuted onto themselves;
  - money/measure columns get a seeded per-row cent jitter;
  - dates/timestamps get a seeded per-row shift;
  - document text is cyclically word-rotated per doc (n_chars is
    recomputed so the text/length invariant holds);
  - embedding vectors are component-rotated by one position.

Verify + oracle_check/driver_check then re-run all queries against the
derived dir: both engines recompute on the same new values, so any
fixture-coincidence pass flips to a mismatch. Dev tool only — the
shipped library has no Python dependency.
"""
import os
import sys

import duckdb


def main(src, out, seed=2):
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    tables = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]
    for t in tables:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}/{t}.parquet'")

    def keymap(name, union_sql):
        """Seeded permutation of a key set onto itself: key k (in
        hash-of-(k, seed) rank order) is assigned the r-th smallest key.
        """
        con.sql(f"""
          CREATE TABLE {name} AS
          WITH ks AS ({union_sql}),
          a AS (SELECT k, row_number() OVER
                  (ORDER BY hash(k * 2654435761 + {seed}), k) AS r FROM ks),
          b AS (SELECT k AS new, row_number() OVER (ORDER BY k) AS r FROM ks)
          SELECT a.k AS old, b.new FROM a JOIN b USING (r)""")

    def dommap(name, col_sql):
        """Seeded permutation of an enum domain onto itself."""
        col, tbl = col_sql.split(" FROM ")
        con.sql(f"""
          CREATE TABLE {name} AS
          WITH ds AS (SELECT DISTINCT {col} AS v FROM {tbl}),
          a AS (SELECT v, row_number() OVER
                  (ORDER BY hash(v || '#{seed}'), v) AS r FROM ds),
          b AS (SELECT v AS new, row_number() OVER (ORDER BY v) AS r FROM ds)
          SELECT a.v AS old, b.new FROM a JOIN b USING (r)""")

    keymap("m_cust", "SELECT DISTINCT c_custkey AS k FROM customer "
                     "UNION SELECT DISTINCT o_custkey FROM orders")
    keymap("m_supp", "SELECT DISTINCT s_suppkey AS k FROM supplier "
                     "UNION SELECT DISTINCT l_suppkey FROM lineitem")
    keymap("m_part", "SELECT DISTINCT p_partkey AS k FROM part "
                     "UNION SELECT DISTINCT l_partkey FROM lineitem")
    keymap("m_order", "SELECT DISTINCT o_orderkey AS k FROM orders "
                      "UNION SELECT DISTINCT l_orderkey FROM lineitem")
    keymap("m_doc", "SELECT DISTINCT doc_id AS k FROM documents")
    keymap("m_vec", "SELECT DISTINCT vec_id AS k FROM embeddings")
    keymap("m_user", "SELECT DISTINCT user_id AS k FROM events")
    keymap("m_event", "SELECT DISTINCT event_id AS k FROM events")
    dommap("d_seg", "c_mktsegment FROM customer")
    dommap("d_brand", "p_brand FROM part")
    dommap("d_ptype", "p_type FROM part")
    dommap("d_ostat", "o_orderstatus FROM orders")
    dommap("d_oprio", "o_orderpriority FROM orders")
    dommap("d_rflag", "l_returnflag FROM lineitem")
    dommap("d_lstat", "l_linestatus FROM lineitem")
    dommap("d_etype", "event_type FROM events")
    dommap("d_lang", "lang FROM documents")
    dommap("d_src", "source FROM documents")
    dommap("d_label", "label FROM embeddings")

    def write(name, sql):
        con.sql(f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{out}/{name}.parquet'").fetchone()[0]
        print(f"  {name}: {n} rows")

    # cent jitter in [-99, +99] keyed off the OLD key (deterministic)
    def cj(x, k):
        return (f"(round({x} * 100) + (({k}) * 37 + {seed}) % 199 - 99)"
                " / 100.0")

    write("region", "SELECT * FROM region")
    write("nation", "SELECT * FROM nation")
    write("customer", f"""
      SELECT m.new AS c_custkey,
        'Customer#' || lpad(cast(m.new AS varchar), 9, '0') AS c_name,
        c_nationkey, {cj('c_acctbal', 'c_custkey')} AS c_acctbal,
        g.new AS c_mktsegment
      FROM customer
      JOIN m_cust m ON c_custkey = m.old
      JOIN d_seg g ON c_mktsegment = g.old""")
    write("supplier", f"""
      SELECT m.new AS s_suppkey,
        'Supplier#' || lpad(cast(m.new AS varchar), 9, '0') AS s_name,
        s_nationkey, {cj('s_acctbal', 's_suppkey')} AS s_acctbal
      FROM supplier JOIN m_supp m ON s_suppkey = m.old""")
    write("part", f"""
      SELECT m.new AS p_partkey, p_name, b.new AS p_brand,
        t.new AS p_type,
        cast(greatest(1, p_size + (p_partkey + {seed}) % 3 - 1) AS int)
          AS p_size,
        {cj('p_retailprice', 'p_partkey')} AS p_retailprice
      FROM part JOIN m_part m ON p_partkey = m.old
      JOIN d_brand b ON p_brand = b.old
      JOIN d_ptype t ON p_type = t.old""")
    write("orders", f"""
      SELECT m.new AS o_orderkey, c.new AS o_custkey,
        s.new AS o_orderstatus,
        {cj('o_totalprice', 'o_orderkey')} AS o_totalprice,
        o_orderdate + to_days(cast((o_orderkey + {seed}) % 11 - 5
          AS int)) AS o_orderdate,
        p.new AS o_orderpriority
      FROM orders JOIN m_order m ON o_orderkey = m.old
      JOIN m_cust c ON o_custkey = c.old
      JOIN d_ostat s ON o_orderstatus = s.old
      JOIN d_oprio p ON o_orderpriority = p.old""")
    write("lineitem", f"""
      SELECT m.new AS l_orderkey, pk.new AS l_partkey,
        sk.new AS l_suppkey, l_linenumber,
        greatest(1, l_quantity + (l_orderkey + l_linenumber) % 3 - 1)
          AS l_quantity,
        {cj('l_extendedprice', 'l_orderkey * 7 + l_linenumber')}
          AS l_extendedprice,
        (cast(round(l_discount * 100) AS bigint)
          + l_orderkey + {seed}) % 11 / 100.0 AS l_discount,
        (cast(round(l_tax * 100) AS bigint)
          + l_orderkey * 3 + {seed}) % 9 / 100.0 AS l_tax,
        rf.new AS l_returnflag, ls.new AS l_linestatus,
        l_shipdate + to_days(cast((l_orderkey + l_linenumber) % 11 - 5
          AS int)) AS l_shipdate
      FROM lineitem JOIN m_order m ON l_orderkey = m.old
      JOIN m_part pk ON l_partkey = pk.old
      JOIN m_supp sk ON l_suppkey = sk.old
      JOIN d_rflag rf ON l_returnflag = rf.old
      JOIN d_lstat ls ON l_linestatus = ls.old""")
    write("events", f"""
      SELECT m.new AS event_id, ts + to_minutes(cast(
          (event_id + {seed}) % 121 - 60 AS int)) AS ts,
        u.new AS user_id, t.new AS event_type,
        {cj('value', 'event_id')} AS value, props
      FROM events JOIN m_event m ON event_id = m.old
      JOIN m_user u ON user_id = u.old
      JOIN d_etype t ON event_type = t.old""")
    write("documents", f"""
      WITH rot AS (
        SELECT m.new AS doc_id, l.new AS lang, s.new AS source,
          string_split_regex(trim(text), '\\s+') AS w,
          cast(doc_id % 7 AS bigint) AS r
        FROM documents JOIN m_doc m ON doc_id = m.old
        JOIN d_lang l ON lang = l.old
        JOIN d_src s ON source = s.old)
      SELECT doc_id,
        array_to_string(list_concat(w[cast(
            1 + r % greatest(len(w), 1) AS bigint) + 1:],
          w[:cast(1 + r % greatest(len(w), 1) AS bigint)]), ' ')
          AS text,
        lang, source,
        len(array_to_string(list_concat(w[cast(
            1 + r % greatest(len(w), 1) AS bigint) + 1:],
          w[:cast(1 + r % greatest(len(w), 1) AS bigint)]), ' '))
          AS n_chars
      FROM rot""")
    write("embeddings", f"""
      SELECT m.new AS vec_id,
        list_concat(embedding[2:], embedding[1:1]) AS embedding,
        lb.new AS label
      FROM embeddings JOIN m_vec m ON vec_id = m.old
      JOIN d_label lb ON label = lb.old""")
    print(f"seed-{seed} dataset written to {out}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 2)
