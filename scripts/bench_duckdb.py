#!/usr/bin/env python3
"""DuckDB timings for the headline oracle queries on a tables dir —
the single-node baseline side of the scale falsification bench
(pairs with `SPARK_GRAFT_ONLY=... runMain graft.Bench`).

Usage: python3 scripts/bench_duckdb.py <sfDir> <oracle_sql.json> q1 q2 ...
Prints one JSON line: {"queries": {name: seconds}, "sf": dir}
Two passes, min per query — same steady-state methodology as Bench.
"""
import json
import sys
import time

import duckdb
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, oracle_path, names):
    con = duckdb.connect()
    import os
    for t in TABLES:
        raw = f"{sf_dir}/{t}.parquet"
        # Spark-written table = dir of part files; DuckDB wants a glob
        path = f"{raw}/*.parquet" if os.path.isdir(raw) else raw
        # scaled dirs store events.ts as raw int64 nanos (matching the
        # generator's TIMESTAMP(NANOS) physical type); rebuild a
        # timestamp so the oracle SQL sees the same schema either way
        if t == "events":
            typ = str(ds.dataset(raw).schema.field("ts").type)
            if typ == "int64":
                con.execute(
                    f"CREATE VIEW {t} AS SELECT event_id, "
                    f"make_timestamp(ts // 1000) AS ts, user_id, "
                    f"event_type, value, props FROM read_parquet('{path}')")
                continue
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    oracles = json.load(open(oracle_path))
    results = {}
    for name in names:
        sql = oracles[name]
        times = []
        for _ in range(2):
            t0 = time.time()
            con.execute(sql).fetchall()
            times.append(time.time() - t0)
        results[name] = min(times)
    print(json.dumps({"queries": results, "sf": sf_dir}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3:])
