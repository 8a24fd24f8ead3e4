#!/usr/bin/env python3
"""q243 oracle loud-fail guard test (round-12 ADVICE carry / directive #5).

The q243 DuckDB oracle unrolls k-core peeling to 7 fixed levels while the
engine iterates to the true fixpoint. On every shipped fixture the peel
converges within 6 rounds, but a deeper-peeling fixture would previously
produce a silent oracle/engine hash mismatch blamed on the engine. The
oracle now carries a guard CTE that raises error(...) when the last two
unrolled levels differ (s6 <> s5, i.e. the fixpoint was NOT reached).

This script proves both directions against the REAL oracle SQL (read from
a Verify dump's oracle_sql.json):
  1. a shallow fixture (41x41 complete bipartite core, converges round 1)
     runs clean;
  2. a deep fixture (the same core plus a 10-node cascade chain engineered
     to peel one node per round, 10 rounds > 7 levels) makes the oracle
     FAIL LOUDLY with the q243 guard message instead of silently emitting
     a wrong survivor set.

Usage: python3 tools/test_q243_guard.py <verify_out_dir>
       (any directory holding oracle_sql.json from graft.Verify)
"""
import json
import sys

import duckdb


def load_sql(out_dir: str) -> str:
    with open(f"{out_dir}/oracle_sql.json") as f:
        return json.load(f)["q243_kcore"]


def run_fixture(sql: str, edges):
    """edges: iterable of (custkey, suppkey). Returns the oracle rows."""
    con = duckdb.connect()
    con.execute("CREATE TABLE orders (o_orderkey BIGINT, o_custkey BIGINT)")
    con.execute("CREATE TABLE lineitem (l_orderkey BIGINT, l_suppkey BIGINT)")
    for i, (c, s) in enumerate(edges):
        con.execute("INSERT INTO orders VALUES (?, ?)", [i, c])
        con.execute("INSERT INTO lineitem VALUES (?, ?)", [i, s])
    return con.execute(sql).fetchall()


def core_edges(n=41):
    """Complete bipartite n x n: every node has degree n >= 40 forever."""
    return [(c, s) for c in range(n) for s in range(n)]


def deep_edges():
    """Core + a 10-node cascade chain: chain node x_i has exactly 38 core
    neighbors + x_{i-1} + x_{i+1} (the chain alternates customer/supplier
    so every edge stays bipartite). x_0 starts at degree 39 < 40 and is
    peeled in round 1; each removal drops the next node to 39, so the
    peel takes 10 rounds -- deeper than the oracle's 7 unrolled levels."""
    edges = list(core_edges())
    chain = 10
    # chain ids far above the core ids; even index = customer, odd = supplier
    def cust(i):
        return 1000 + i

    def supp(i):
        return 2000 + i

    for i in range(chain):
        is_customer = i % 2 == 0
        # 38 core neighbors of the opposite side (x_9, the chain end, gets
        # 39 so only x_0 is sub-threshold at the start)
        n_core = 39 if i == chain - 1 else 38
        for j in range(n_core):
            if is_customer:
                edges.append((cust(i), j))
            else:
                edges.append((j, supp(i)))
        # chain link to the next node (i, i+1) -- opposite sides
        if i + 1 < chain:
            if is_customer:
                edges.append((cust(i), supp(i + 1)))
            else:
                edges.append((cust(i + 1), supp(i)))
    return edges


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
    sql = load_sql(out_dir)
    assert "error(" in sql, "q243 oracle lost its loud-fail guard"

    rows = run_fixture(sql, core_edges())
    assert len(rows) == 82, f"shallow fixture: expected 82 survivors, got {len(rows)}"
    print(f"PASS shallow fixture: {len(rows)} survivors, guard silent")

    try:
        run_fixture(sql, deep_edges())
    except duckdb.Error as e:
        assert "q243 oracle" in str(e), f"wrong failure: {e}"
        print(f"PASS deep fixture: guard fired loudly -> {e}")
        return
    raise AssertionError(
        "deep-peeling fixture did NOT trip the q243 oracle guard")


if __name__ == "__main__":
    main()
