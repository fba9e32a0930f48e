"""Deduplication operators for training-data pipelines.

Exact and n-gram-Jaccard dedup are exact set algebra (SQL-expressible, oracle
gated); MinHash+LSH and SimHash are the scale paths — candidate generation is
approximate but every emitted pair is verified with the exact measure, so
with adequate (bands × rows) the verified output equals the exact result
with overwhelming probability (miss probability bounds in docstrings).

The shingle relation is the shared substrate: distinct token n-grams per doc,
built with pure Catalyst array functions (transform/slice/array_join) — no
Python in the hot path. At 100 TB the self-join on shingle is the classic
explode-join; the MinHash path replaces it with a bounded (doc × bands) join.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from miru_spark.tokenize import tokens_col

# MinHash parameters: 128 hashes = 32 bands × 4 rows.
# P(candidate miss | jaccard=j) = (1 - j^4)^32 → 6e-11 at j=0.85, 5e-8 at 0.8.
MINHASH_K = 128
LSH_BANDS = 32
LSH_ROWS = 4
# 31-bit Mersenne prime: a*x+b stays < 2^62, no int64 overflow JVM-side;
# 1/2^31 per-hash collision probability is negligible for dedup candidates.
_MERSENNE = (1 << 31) - 1


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content digest. One shuffle, partial agg."""
    return (
        df.select(F.col(id_col).alias("doc"), F.md5(F.col(text_col)).alias("content_md5"))
        .groupBy("content_md5")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc").alias("canonical"),
            F.max("doc").alias("max_doc"),
        )
    )


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(doc, shingle) — distinct token n-grams.

    One Arrow kernel per batch: tokenize (same regex dialect as
    tokenize.tokens_col, asserted by the oracle gates), slide the n-gram
    window, and dedup per doc with a set. Per-doc dedup ≡ the previous
    global ``.distinct()`` because the doc id is part of the key — so the
    distinct SHUFFLE of the full (doc, shingle) relation (2.6M rows at
    sf1.0) disappears along with the interpreted transform/slice/array_join
    lambda chain and the explode. Docs with fewer than n tokens produce no
    shingles, matching the oracle's WHERE len(t) >= n."""
    import re
    from typing import Iterator

    import pyarrow as pa

    from miru_spark.tokenize import TOKEN_SPLIT_RE

    find_re = re.compile(TOKEN_SPLIT_RE.replace("[^", "[", 1))

    def _shingle(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if batch.num_rows == 0:
                continue
            docs = batch.column("doc").to_numpy(zero_copy_only=False)
            texts = batch.column("__text").to_pylist()
            o_doc: list = []
            o_sh: list = []
            for d, txt in zip(docs, texts):
                if not txt:
                    continue
                toks = find_re.findall(txt.lower())
                if len(toks) < n:
                    continue
                grams = set(
                    " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
                )
                o_doc.append(np.full(len(grams), d, dtype=np.int64))
                o_sh.extend(grams)
            if o_sh:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(np.concatenate(o_doc)), pa.array(o_sh, pa.string())],
                    names=["doc", "shingle"],
                )

    return df.select(
        F.col(id_col).cast("long").alias("doc"), F.col(text_col).alias("__text")
    ).mapInArrow(_shingle, "doc long, shingle string")


def jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.8
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (doc_a < doc_b, j ≥ threshold).

    Self-join on shared shingle → |A∩B|; |A∪B| = |A|+|B|−|A∩B|. The join is
    the scale bottleneck (hot shingles fan out); MinHash below is the 100 TB
    path — this exact form is the oracle it must reproduce.
    """
    sh = shingles(df, id_col, text_col, n).cache()
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _hash_params(k: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, _MERSENNE, size=k, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=k, dtype=np.int64)
    return a, b


def minhash_signatures(
    sh: DataFrame, k: int = MINHASH_K, seed: int = 42, doc_grouped: bool = False
) -> DataFrame:
    """(doc, sig: array<long>) — k min-hashes.

    h_i(s) = (a_i * x + b_i) mod M31 over x = xxhash64(shingle) mod M31
    (hashed JVM-side). The per-doc min over all k functions is ONE
    Arrow-batched numpy pass over doc-sorted runs ((n×k) broadcasted
    multiply + minimum.reduceat at run starts, partition-trailing run
    carried across batches) — codegen'ing k=128 separate min aggregates was
    measured at 31% of the whole bench suite. Map-side pre-aggregation is
    traded for one (doc, x) shuffle; rows per doc are bounded by doc length,
    so no reducer hot spot.

    ``doc_grouped=True`` asserts each doc's rows already form ONE
    contiguous run inside ONE partition — true for ``shingles()`` output,
    whose kernel emits every doc's shingles consecutively and is only
    narrowly transformed downstream — and skips the repartition+sort
    exchange entirely (the run-carry kernel needs runs, not global order).
    A caller passing shuffled rows here would get split signatures, so it
    stays opt-in for relations this module built itself.
    """
    a, b = _hash_params(k, seed)
    hashed = sh.select("doc", F.pmod(F.xxhash64("shingle"), F.lit(_MERSENNE)).alias("x"))
    src = hashed if doc_grouped else hashed.repartition("doc").sortWithinPartitions("doc")
    av = a.reshape(1, -1)
    bv = b.reshape(1, -1)
    M = _MERSENNE

    def _sig(batches):
        import pyarrow as pa

        def emit(docs: np.ndarray, mins: np.ndarray) -> pa.RecordBatch:
            n = len(docs)
            offsets = np.arange(0, (n + 1) * k, k, dtype=np.int32)
            sig_col = pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(mins.ravel(), pa.int64())
            )
            return pa.RecordBatch.from_arrays(
                [pa.array(docs.astype(np.int64)), sig_col], names=["doc", "sig"]
            )

        carry_doc = None
        carry_min = None
        # doc_grouped PROMISES one contiguous run per doc per partition; a
        # doc re-appearing after its run closed means the caller's layout
        # guarantee is broken, and silently emitting two partial signatures
        # would corrupt downstream banding — fail loudly instead. (The
        # sorted path merges duplicates by construction, so no set there.)
        closed: set | None = set() if doc_grouped else None

        def close(doc) -> None:
            if closed is not None:
                if doc in closed:
                    raise RuntimeError(
                        f"minhash_signatures(doc_grouped=True): doc {doc} "
                        f"appears in more than one run — the input is not "
                        f"doc-grouped; pass doc_grouped=False (or fix the "
                        f"producer's layout)"
                    )
                closed.add(doc)

        for batch in batches:
            d = batch.column("doc").to_numpy(zero_copy_only=False).astype(np.int64)
            x = batch.column("x").to_numpy(zero_copy_only=False).astype(np.int64)
            if not len(d):
                continue
            # x, a < 2^31 ⇒ x*a + b < 2^62: no int64 overflow. Reduce mod
            # M = 2^31−1 by Mersenne folding (2^31 ≡ 1 mod M): two
            # fold-adds bring v into [0, M], then one conditional subtract
            # lands EXACTLY v % M — same integers as the previous `% M`,
            # without the 64-bit integer division (~2× on this inner loop).
            h = x[:, None] * av + bv
            h = (h & M) + (h >> 31)
            h = (h & M) + (h >> 31)
            h -= (h >= M) * M
            starts = np.concatenate(([0], np.flatnonzero(d[1:] != d[:-1]) + 1))
            mins = np.minimum.reduceat(h, starts, axis=0)
            run_docs = d[starts]
            if carry_doc is not None:
                if run_docs[0] == carry_doc:
                    mins[0] = np.minimum(mins[0], carry_min)
                else:
                    close(carry_doc)
                    yield emit(np.array([carry_doc]), carry_min[None, :])
            carry_doc = int(run_docs[-1])
            carry_min = mins[-1].copy()
            if len(run_docs) > 1:
                if closed is not None:
                    for rd in run_docs[:-1]:
                        close(int(rd))
                yield emit(run_docs[:-1], mins[:-1])
        if carry_doc is not None:
            close(carry_doc)
            yield emit(np.array([carry_doc]), carry_min[None, :])

    return src.mapInArrow(_sig, "doc long, sig array<long>")


def lsh_candidate_pairs(
    sig: DataFrame, bands: int = LSH_BANDS, rows: int = LSH_ROWS
) -> DataFrame:
    """Banding: docs sharing any band bucket become candidate pairs.

    Shape (r7): ONE kernel per shuffle partition of the (doc, band, bucket)
    relation sorts its rows by (band, bucket) and enumerates each bucket's
    doc pairs as numpy index arithmetic, chunk-emitted so a mega-bucket
    (an exact-dup group whose every band collides) streams instead of
    materializing C(m,2) at once. This replaces the previous hot-bucket
    count job + broadcast semi-join + sort-merge self-join (which also
    forced caching ``banded`` to share the signature computation across
    its three consumers) with a single exchange of the banded rows;
    singleton buckets — almost every bucket — are skipped at memory speed
    inside the kernel instead of via a pre-filter pass. The candidate SET
    is identical by construction: pairs sharing (band, bucket), doc_a <
    doc_b, deduped across bands by the same final distinct."""
    from typing import Iterator

    import pyarrow as pa

    banded = sig.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.xxhash64(F.slice("sig", i * rows + 1, rows)).alias("bucket"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")

    CHUNK = 1 << 20  # pairs buffered per emitted batch — bounds kernel memory

    def pairs_kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        chunks = [b for b in batches if b.num_rows]
        if not chunks:
            return
        tbl = pa.Table.from_batches(chunks)
        d = tbl.column("doc").to_numpy(zero_copy_only=False).astype(np.int64)
        bd = tbl.column("band").to_numpy(zero_copy_only=False).astype(np.int64)
        bk = tbl.column("bucket").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((d, bk, bd))
        d, bd, bk = d[order], bd[order], bk[order]
        change = (bd[1:] != bd[:-1]) | (bk[1:] != bk[:-1])
        starts = np.concatenate(([0], np.flatnonzero(change) + 1, [len(d)]))
        buf_a: list[np.ndarray] = []
        buf_b: list[np.ndarray] = []
        buffered = 0

        def flush() -> pa.RecordBatch:
            nonlocal buf_a, buf_b, buffered
            rb = pa.RecordBatch.from_arrays(
                [pa.array(np.concatenate(buf_a)), pa.array(np.concatenate(buf_b))],
                names=["doc_a", "doc_b"],
            )
            buf_a, buf_b, buffered = [], [], 0
            return rb

        for gi in range(len(starts) - 1):
            s, e = int(starts[gi]), int(starts[gi + 1])
            m = e - s
            if m < 2:
                continue
            g = d[s:e]  # ascending within the bucket (lexsort) ⇒ a < b
            if m <= 2048:
                iu, ju = np.triu_indices(m, k=1)
                buf_a.append(g[iu])
                buf_b.append(g[ju])
                buffered += len(iu)
            else:
                for i in range(m - 1):  # big buckets: one vector op per row
                    buf_a.append(np.full(m - 1 - i, g[i], dtype=np.int64))
                    buf_b.append(g[i + 1 :])
                    buffered += m - 1 - i
                    if buffered >= CHUNK:
                        yield flush()
            if buffered >= CHUNK:
                yield flush()
        if buffered:
            yield flush()

    return (
        banded.repartition("band", "bucket")
        .mapInArrow(pairs_kernel, "doc_a long, doc_b long")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.85,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS,
    seed: int = 42,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-verified.

    Candidates from banding, then exact Jaccard on just the candidate pairs
    (join back to shingles), emit pairs with j ≥ threshold. Output is
    rank-identical to ``jaccard_pairs`` up to the (negligible) LSH miss
    probability; the expensive all-pairs shingle join never happens.
    """
    sh = shingles(df, id_col, text_col, n).cache()
    # sh is this module's own shingle kernel output (per-doc contiguous
    # runs, narrowly transformed) — the signature pass can skip its
    # repartition+sort exchange
    sig = minhash_signatures(sh, k, seed, doc_grouped=True)
    # cand backs three consumers (the a-side join and both legs of the
    # candidate-doc semi-filter); cache it or each recomputes the banding
    cand = lsh_candidate_pairs(sig, bands, rows).cache()
    # verify touches only candidate docs' shingles — semi-filter the 2.6M-row
    # shingle relation down to the ~4k candidate docs BEFORE the attach
    # joins and the sizes aggregate (guide §3.2's semi-join pre-filter);
    # per-doc shingle counts are unchanged by dropping other docs' rows
    cdocs = (
        cand.select(F.col("doc_a").alias("doc"))
        .union(cand.select(F.col("doc_b").alias("doc")))
        .distinct()
    )
    # shc backs FOUR plan branches (both attach joins and both size legs);
    # uncached, each branch re-runs the semi-filter pass over the full
    # shingle cache — cache the ~candidate-docs-sized remainder once so the
    # branches share it (same bounded-lifecycle class as sh/cand above)
    shc = sh.join(F.broadcast(cdocs), "doc", "leftsemi").cache()
    sizes = shc.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    a_sh = shc.select(F.col("doc").alias("doc_a"), F.col("shingle").alias("s"))
    b_sh = shc.select(F.col("doc").alias("doc_b"), F.col("shingle").alias("s"))
    inter = (
        cand.join(a_sh, "doc_a")
        .join(b_sh, ["doc_b", "s"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 64) -> DataFrame:
    """(doc, simhash: long) — 64-bit SimHash over tf-weighted token hashes.

    Expressed as explode → per-bit weighted vote → reassemble, all JVM-side:
    the vote is one groupBy with 64 sum expressions (map-side combinable).

    Bit source: bit ``i`` of the signature is bit ``i % 16`` of the 16-bit
    integer parsed from hex digits ``[4·(i//16), 4·(i//16)+4)`` of
    ``md5(term)``. md5 (unlike xxhash64) produces identical bytes in every
    engine, which makes the whole operator integer-exact replayable in the
    DuckDB oracle (`oracles.simhash_pairs_sql`) — no float, no
    engine-specific hash.
    """
    tf = (
        df.select(F.col(id_col).alias("doc"), F.explode(tokens_col(text_col)).alias("term"))
        .groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("h_hex", F.md5("term"))
    )
    for c in range(4):
        tf = tf.withColumn(
            f"h{c}", F.conv(F.substring("h_hex", c * 4 + 1, 4), 16, 10).cast("int")
        )
    votes = [
        F.sum(
            F.when(
                F.shiftright(F.col(f"h{i // 16}"), i % 16).bitwiseAND(F.lit(1)) == 1,
                F.col("tf"),
            ).otherwise(-F.col("tf"))
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    voted = tf.groupBy("doc").agg(*votes)
    acc = F.lit(0).cast("long")
    for i in range(bits):
        # bit 63 of a signed long is -(2^63)
        bit_val = (1 << i) if i < 63 else -(1 << 63)
        acc = acc + F.when(F.col(f"v{i}") > 0, F.lit(bit_val).cast("long")).otherwise(F.lit(0))
    return voted.select("doc", acc.alias("simhash"))


def simhash_pairs(df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Blocking: split the 64-bit hash into 4 × 16-bit chunks — any pair within
    Hamming 3 shares at least one chunk exactly (pigeonhole), so the join is
    on chunk equality, never all-pairs.
    """
    s = simhash(df, id_col, text_col)
    chunked = s.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned("simhash", c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("ckey"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cc"),
    ).select("doc", "simhash", "cc.chunk", "cc.ckey")
    a = chunked.alias("a")
    b = chunked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.ckey") == F.col("b.ckey"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
    driver_max_edges: int = 1_000_000,
) -> DataFrame:
    """(doc, canonical) — connected components over an undirected pair list;
    canonical = min node id of the component.

    Iterative min-label propagation with pointer jumping: each round every
    node takes the min label over itself and its neighbors, then compresses
    label → label(label). Plain propagation needs O(diameter) rounds; the
    jump step doubles the reach per round, so convergence is O(log diameter)
    — near-dup graphs (small, shallow clusters) converge in 2-3 rounds. Per
    round: two shuffles (neighbor groupBy + jump join) over the LABEL
    relation only (2 longs/node), never the text; localCheckpoint truncates
    the lineage so the plan stays O(1) per round. The per-round driver
    scalar is the convergence count — the orchestrator pattern for iterative
    algorithms (the data never visits the driver).

    ``driver_max_edges``: edge lists at or under this bound (a broadcast-
    class footprint — ≤ ~16 MB of id pairs at the default) are solved with
    a driver-side union-find in one bounded collect instead of the
    multi-round shuffle loop; 0 disables the fast path. Both paths produce
    identical (doc, canonical) labels.
    """
    # materialize the pair list BEFORE the symmetric union branches it:
    # both union legs read one plan, so an expensive upstream (the whole
    # minhash verify pipeline in dup_clusters) runs once, not once per leg
    e = pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v")).localCheckpoint(eager=True)
    # The pair list is a RESULT-class relation (verified near-dup pairs) —
    # orders of magnitude smaller than the corpus it came from. When it fits
    # the broadcast-class budget (≤ driver_max_edges ⇒ ≤ ~16 MB of longs,
    # the same footprint class as a broadcast join's build side, which also
    # collects to the driver), solve the components with a driver union-find
    # in one bounded collect instead of ~4 shuffle jobs per pointer-jump
    # round: the count is a cheap scan of the checkpointed relation, so the
    # expensive upstream never runs twice, and graphs above the bound take
    # the distributed loop below unchanged (the 100 TB shape). Labels are
    # identical by construction: union-by-min keeps every root the minimum
    # id of its tree, so find(n) is exactly the component min the
    # min-label-propagation loop converges to.
    if driver_max_edges and e.count() <= driver_max_edges:
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        # toArrow keeps the driver footprint at the advertised two int64
        # arrays (~16 MB at the bound) instead of driver_max_edges pyspark
        # Row objects
        etbl = e.toArrow()
        us = etbl.column("u").to_pylist()
        vs = etbl.column("v").to_pylist()
        for u, v in zip(us, vs):
            if u not in parent:
                parent[u] = u
            if v not in parent:
                parent[v] = v
            ru, rv = find(u), find(v)
            if ru != rv:
                if rv < ru:
                    ru, rv = rv, ru
                parent[rv] = ru  # attach larger root under smaller ⇒ root = min
        rows = sorted((n, find(n)) for n in parent)
        spark = pairs.sparkSession
        # the distributed path's node column carries the UNION-widened type
        # of (u, v); mirror it exactly so both paths return one schema
        out_type = (
            e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .schema["u"].dataType.simpleString()
        )
        return spark.createDataFrame(
            rows, f"doc {out_type}, canonical {out_type}"
        )
    edges = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    edges = edges.localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges["v"] == labels["node"])
            .groupBy("u")
            .agg(F.min("label").alias("nmin"))
        )
        # `old` rides along so the convergence check below is a narrow scan
        # of the checkpointed round output — the previous shape re-joined
        # jumped against labels (one extra shuffle join per round) just to
        # recover the pre-round label. stepped is checkpointed because the
        # jump step consumes it TWICE (as input and as the label(label)
        # lookup side); un-materialized, Spark recomputes the whole
        # neighbor-min subtree once per branch.
        stepped = (
            labels.join(nbr_min, labels["node"] == nbr_min["u"], "left")
            .select(
                "node",
                F.col("label").alias("old"),
                F.least(F.col("label"), F.coalesce("nmin", F.col("label"))).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        # pointer jump: label <- label(label)
        lab2 = stepped.select(F.col("node").alias("n2"), F.col("label").alias("l2"))
        jumped = (
            stepped.join(lab2, stepped["label"] == lab2["n2"], "left")
            .select(
                "node", "old",
                F.least("label", F.coalesce("l2", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        labels = jumped.select("node", "label")
        if jumped.filter(F.col("old") != F.col("label")).isEmpty():
            break
    else:
        # pointer jumping covers diameter ~2^max_iter in max_iter rounds —
        # exhausting the budget while labels still move means a bug (or an
        # adversarial graph), and silently returning split components would
        # let duplicate docs survive dedup with no signal. Fail loudly.
        changed = jumped.filter(F.col("old") != F.col("label")).count()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still moving) — with pointer jumping this "
            f"indicates a defect, not a large graph"
        )
    return labels.select(F.col("node").alias("doc"), F.col("label").alias("canonical"))


def dup_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.85,
    **minhash_kwargs,
) -> DataFrame:
    """(doc, canonical) near-dup clusters: MinHash+LSH verified pairs →
    connected components. The canonical-per-cluster assignment is the dedup
    primitive a training pipeline actually consumes (keep one doc per
    component, drop the rest); pair emission alone under-deletes chains
    (A~B, B~C but A≁C must still collapse to one survivor).

    Scale shape: the pair list is the banded-LSH verified output (never
    all-pairs), and the component loop touches only (node, label) longs.
    """
    pairs = minhash_dedup_pairs(df, id_col, text_col, n=n, threshold=threshold, **minhash_kwargs)
    return connected_components(pairs, "doc_a", "doc_b")
