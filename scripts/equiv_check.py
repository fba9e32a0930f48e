"""Old-vs-new operator equivalence harness for optimization rounds.

Loads the ROUND-START implementation of an operator module from a git
worktree (default /tmp/r7_before) side by side with the current tree's, runs
both over the same parquet inputs in one Spark session, and asserts the
outputs are EXACTLY equal (row multiset, float bit-for-bit via repr).

Usage: python scripts/equiv_check.py <sf_dir> [check ...]
Checks: cosine_pairs lsh_pairs langid minhash clusters
"""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BEFORE = os.environ.get("SPARK_GRAFT_BEFORE_TREE", "/tmp/r7_before")


def load_old(rel: str, name: str):
    spec = importlib.util.spec_from_file_location(name, os.path.join(BEFORE, rel))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def rows_key(rows):
    return sorted(tuple(repr(v) for v in r) for r in rows)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    checks = sys.argv[2:] or ["cosine_pairs", "lsh_pairs", "langid"]

    from miru_spark.session import get_spark
    from miru_spark.operators import dedup as new_dedup
    from miru_spark.operators import similarity as new_sim
    from miru_spark.operators import textstats as new_ts

    old_sim = load_old("miru_spark/operators/similarity.py", "old_similarity")
    old_ts = load_old("miru_spark/operators/textstats.py", "old_textstats")
    old_dedup = load_old("miru_spark/operators/dedup.py", "old_dedup")

    spark = get_spark("equiv_check", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    pairs_fns = {
        "cosine_pairs": lambda m: m.cosine_pairs(emb, "vec_id", "embedding", threshold=0.45),
        "lsh_pairs": lambda m: m.lsh_cosine_pairs(
            emb, "vec_id", "embedding", threshold=0.45, n_planes=8, n_tables=8),
        "langid": lambda m: m.langid_lite(docs, "doc_id", "text"),
        "minhash": lambda m: m.minhash_dedup_pairs(docs, "doc_id", "text", n=3, threshold=0.85),
        "clusters": lambda m: m.dup_clusters(docs, "doc_id", "text", n=3, threshold=0.85),
    }
    mods = {
        "cosine_pairs": (old_sim, new_sim),
        "lsh_pairs": (old_sim, new_sim),
        "langid": (old_ts, new_ts),
        "minhash": (old_dedup, new_dedup),
        "clusters": (old_dedup, new_dedup),
    }

    failed = []
    for c in checks:
        old_mod, new_mod = mods[c]
        print(f"{c}: running OLD...", flush=True)
        old_rows = rows_key(pairs_fns[c](old_mod).collect())
        print(f"{c}: OLD done ({len(old_rows)}), running NEW...", flush=True)
        new_rows = rows_key(pairs_fns[c](new_mod).collect())
        print(f"{c}: NEW done", flush=True)
        ok = old_rows == new_rows
        print(f"{c}: {'EQUAL' if ok else 'MISMATCH'} (old={len(old_rows)} new={len(new_rows)})")
        if not ok:
            only_old = [r for r in old_rows if r not in set(new_rows)][:5]
            only_new = [r for r in new_rows if r not in set(old_rows)][:5]
            print(f"  only_old: {only_old}\n  only_new: {only_new}")
            failed.append(c)
    spark.stop()
    if failed:
        sys.exit(f"MISMATCH in: {failed}")
    print("ALL EQUAL")


if __name__ == "__main__":
    main()
