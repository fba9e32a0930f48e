"""sf1.0 scale-proof harness: generate the decade-up fixture tables
(miru_spark.testgen), run ALL 50 gate queries through the engine AND their
DuckDB oracles over the same parquet, and record a CORRECTNESS-style JSON.

Usage: python scripts/scale_gate.py [sf] [out_json]
Defaults: sf=1.0, BENCH/correctness_sf{sf}.json. The generated tables land
in /dev/shm/miru_gen_sf{sf} (tmpfs — the sandbox disk is the bottleneck)
and are reused if present.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entry_mod
from miru_spark.session import get_spark
from miru_spark.testgen import generate_sf

TABLES = ["documents", "events", "embeddings", "orders", "lineitem"]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out_json = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, "BENCH", f"correctness_sf{sf}.json")
    )
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    sf_dir = os.path.join(base, f"miru_gen_sf{sf}")

    os.environ.setdefault("SPARK_GRAFT_PREALLOC", "1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("scale_gate", master=f"local[{cpus}]")

    # lineitem is written LAST — its _SUCCESS marker means the whole set landed
    if not os.path.exists(os.path.join(sf_dir, "lineitem.parquet", "_SUCCESS")):
        t0 = time.perf_counter()
        counts = generate_sf(spark, sf_dir, sf)
        print(f"generated sf={sf} in {time.perf_counter()-t0:.1f}s: {counts}", file=sys.stderr)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet/*.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    results: dict[str, dict] = {}
    for name in queries:
        t0 = time.perf_counter()
        entry = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None, "sec": None,
        }
        try:
            got = _normalize(queries[name](spark, sf_dir).toPandas())
            entry["spark_rows"] = len(got)
            sql = oracles.get(name)
            if sql is None:
                entry["err"] = "no_oracle"
            else:
                want = _normalize(con.execute(sql).df())
                entry["oracle_rows"] = len(want)
                entry["rows_match"] = len(got) == len(want)
                entry["schema_match"] = list(got.columns) == list(want.columns) and all(
                    got[c].dtype.kind == want[c].dtype.kind for c in got.columns
                )
                ok = entry["rows_match"] and entry["schema_match"]
                if ok:
                    for c in got.columns:
                        eq = (got[c].values == want[c].values) | (
                            pd.isna(got[c].values) & pd.isna(want[c].values)
                            if pd.api.types.is_float_dtype(got[c])
                            else np.zeros(len(got), dtype=bool)
                        )
                        if not eq.all():
                            ok = False
                            break
                entry["hash_match"] = ok if entry["rows_match"] and entry["schema_match"] else False
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            entry["err"] = f"{type(e).__name__}: {e}"[:300]
        entry["sec"] = round(time.perf_counter() - t0, 2)
        results[name] = entry
        status = "PASS" if entry["hash_match"] else (entry["err"] or "FAIL")
        print(f"{name}: {status} ({entry['sec']}s, rows={entry['spark_rows']})", file=sys.stderr)

    n_pass = sum(1 for r in results.values() if r["hash_match"])
    n_no_oracle = sum(1 for r in results.values() if r["err"] == "no_oracle")
    summary = {
        "sf": sf,
        "n_queries": len(results),
        "n_pass": n_pass,
        "n_no_oracle": n_no_oracle,
        "n_fail": len(results) - n_pass - n_no_oracle,
        "results": results,
    }
    os.makedirs(os.path.dirname(out_json), exist_ok=True)
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: summary[k] for k in ("sf", "n_queries", "n_pass", "n_no_oracle", "n_fail")}))
    spark.stop()


if __name__ == "__main__":
    main()
