"""Collaborative filtering — the reference's Reco plugin 3-field walk
(miru-reco-plugins/.../reco/CollaborativeFiltering.java:58-213) re-expressed
as two self-joins + a weighted count, the classic item-CF DataFrame shape.

Walk, mirrored step for step:
  1. my docs → distinct parents(field1)            = ``mine``
  2. others' activity on those parents, weight =
     # of my parents they share (top contributors) = ``contributors``
  3. contributors' other parents, scored by sum of
     contributor weight, minus already-seen        = ``scored``

At scale: ``mine`` is small → broadcast both joins against the big activity
table; the final groupBy keys on the candidate item (high cardinality, no
skew). The reference used heaps and batched bitmap gathers for exactly this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def collaborative_filter(
    activity: DataFrame,
    user_col: str,
    item_col: str,
    user_id,
    k: int = 20,
    max_contributors: int = 100,
) -> DataFrame:
    """Top-k item recommendations for ``user_id`` from a (user, item)
    activity relation. Deterministic: score desc, then item asc.

    ``max_contributors`` is the reference's contributor heap cut
    (CollaborativeFiltering.java:58-213 keeps only the top contributors by
    shared-parent weight). It also bounds the broadcast below: without the
    cut, one hot item shared with the seed user could pull in millions of
    contributor rows. Tie-break weight desc, user asc (total order)."""
    pairs = activity.select(
        F.col(user_col).alias("u"), F.col(item_col).alias("i")
    ).distinct()
    mine = pairs.filter(F.col("u") == user_id).select("i")
    contributors = (
        pairs.join(F.broadcast(mine), "i")
        .filter(F.col("u") != user_id)
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("weight"))
        .orderBy(F.desc("weight"), F.asc("u"))
        .limit(max_contributors)
    )
    scored = (
        pairs.join(F.broadcast(contributors), "u")
        .join(F.broadcast(mine), "i", "left_anti")  # minus already-seen
        .groupBy(F.col("i").alias("item"))
        .agg(F.sum("weight").alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc("item")).limit(k)
