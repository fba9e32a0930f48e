"""Catwalk (model build) + Strut (model score) — the reference's ML surface.

Catwalk gathers, for every feature value (a tuple of field terms), how many
activities in the numerator (label) set carry it and how many carry it at
all: FeatureScore{termIds, numerators[], denominator}
(miru-stream-plugins/.../catwalk/Catwalk.java:105-117 numerator accumulation,
:146-186 denominator = cardinality of the AND of the feature's term bitmaps).
That is exactly a naive-Bayes count table — one groupBy per feature
definition, map-side combinable, no bitmaps needed.

Strut scores candidates against the model: per feature,
s_i = numerator_i / denominator (Strut.java:202-216, clamped to [0,1]),
combined across features by CatwalkDefinition.featureStrategy
(Strut.finalizeScore:367-397):

  * UNIT_WEIGHTED      Σ s_i / n_features   (zero features score 0 — since
                       s_i ≥ 0 the branchy reference loop reduces to this)
  * REGRESSION_WEIGHTED Σ s_i
  * MAX                max_i s_i

then a top-k heap → ordered LIMIT. The model is small (one row per feature
value) — broadcast joins against the candidate relation; candidate scoring
is a fixed-size column expression in sorted-feature order, so floats are
deterministic without any ordered fold.

At 100 TB: the model build is one shuffle per feature over pre-aggregated
partials; scoring is scan + N broadcast joins + ordered LIMIT (Catalyst's
partial top-k per partition). No skew risk — feature values group millions
of rows into few cells, and the heavy side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STRATEGIES = ("unit_weighted", "regression_weighted", "max")


def catwalk_model(
    df: DataFrame, label: Column, features: dict[str, Column | list[Column]]
) -> DataFrame:
    """(feature_id, feature_value, numerator, denominator) count model.

    ``label`` is the numerator predicate (the reference's numeratorTermSets
    membership); ``features`` maps feature id → the Catalyst expression(s)
    producing that feature's value. A LIST of columns is a multi-field
    feature tuple, and any ARRAY-typed component is a multi-valued field:
    the feature instances are the CARTESIAN product across the components'
    values — the reference's MiruAggregateUtil.permutate
    (miru-plugin/.../solution/MiruAggregateUtil.java:408-439), restated as
    array_distinct + one explode per multi-valued component (sequential
    explodes ARE the cartesian). A doc with duplicate values in one field
    still counts once per distinct tuple, like the reference's per-tuple
    bitmap AND."""
    from pyspark.sql.types import ArrayType

    outs = []
    for fid in sorted(features):
        comps = features[fid]
        if not isinstance(comps, (list, tuple)):
            comps = [comps]
        work = df.select(
            label.alias("__label"),
            *[c.alias(f"__c{i}") for i, c in enumerate(comps)],
        )
        names = [f"__c{i}" for i in range(len(comps))]
        for name in names:
            if isinstance(work.schema[name].dataType, ArrayType):
                work = work.withColumn(name, F.explode(F.array_distinct(F.col(name))))
        fv = (
            F.col(names[0]).cast("string")
            if len(names) == 1
            else F.concat_ws("\x1f", *[F.col(n).cast("string") for n in names])
        )
        outs.append(
            work.groupBy(fv.alias("feature_value"))
            .agg(
                F.sum(F.when(F.col("__label"), 1).otherwise(0)).cast("long").alias("numerator"),
                F.count(F.lit(1)).alias("denominator"),
            )
            .select(
                F.lit(fid).alias("feature_id"), "feature_value", "numerator", "denominator"
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def strut_score(
    df: DataFrame,
    id_col: str,
    features: dict[str, Column | list[Column]],
    model: DataFrame,
    strategy: str = "unit_weighted",
    k: int = 100,
) -> DataFrame:
    """Top-k candidates by model score (score desc, doc desc tie-break).

    One broadcast join per feature (the reference's model.score point lookup,
    Strut.java:202-216); candidates whose feature value is absent from the
    model contribute 0 for that feature (the reference skips null
    modelScores). Multi-valued features (array components, catwalk_model's
    permutate shape) score each tuple instance and keep the per-feature MAX
    across instances — exactly the reference's per-feature accumulator
    ``score(current, update) = max(current, update)`` for all three
    strategies (Strut.java:355-365), before finalizeScore combines across
    features (:367-397)."""
    from pyspark.sql.types import ArrayType

    if strategy not in STRATEGIES:
        raise ValueError(f"strategy must be one of {STRATEGIES}")
    fids = sorted(features)

    def _comps(fid):
        comps = features[fid]
        return list(comps) if isinstance(comps, (list, tuple)) else [comps]

    def _is_multi(fid):
        probe = df.select(*[c.alias(f"__c{i}") for i, c in enumerate(_comps(fid))])
        return any(
            isinstance(probe.schema[f"__c{i}"].dataType, ArrayType)
            for i in range(len(_comps(fid)))
        )

    def _model_side(fid):
        return model.filter(F.col("feature_id") == fid).select(
            F.col("feature_value").alias(f"__f_{fid}"),
            (
                F.least(
                    F.col("numerator").cast("double") / F.col("denominator"),
                    F.lit(1.0),
                )
            ).alias(f"__s_{fid}"),
        )

    def _fv(names):
        return (
            F.col(names[0]).cast("string")
            if len(names) == 1
            else F.concat_ws("\x1f", *[F.col(n).cast("string") for n in names])
        )

    single = [fid for fid in fids if not _is_multi(fid)]
    multi = [fid for fid in fids if _is_multi(fid)]
    # single-valued features are per-row expressions over the SAME row, so
    # every feature value rides ONE scan of the candidate relation and each
    # model lookup is a broadcast join on the value — the previous
    # per-feature doc-keyed reattach join sort-merged the full candidate
    # relation once per feature (2 × 1M-row shuffles on the bench shape)
    # for information the row already carried. Zero shuffles remain on the
    # all-single path; multi-valued (permutate) features keep the
    # explode → broadcast lookup → per-doc max → doc join shape.
    def _fv_inline(fid):
        comps = _comps(fid)
        expr = (
            comps[0].cast("string")
            if len(comps) == 1
            else F.concat_ws("\x1f", *[c.cast("string") for c in comps])
        )
        return expr.alias(f"__f_{fid}")

    out = df.select(F.col(id_col).alias("doc"), *[_fv_inline(fid) for fid in single])
    for fid in single:
        out = out.join(F.broadcast(_model_side(fid)), f"__f_{fid}", "left")
    for fid in multi:
        comps = _comps(fid)
        inst = df.select(
            F.col(id_col).alias("doc"),
            *[c.alias(f"__c{i}") for i, c in enumerate(comps)],
        )
        names = [f"__c{i}" for i in range(len(comps))]
        for name in names:
            if isinstance(inst.schema[name].dataType, ArrayType):
                inst = inst.withColumn(name, F.explode(F.array_distinct(F.col(name))))
        inst = inst.select("doc", _fv(names).alias(f"__f_{fid}"))
        scored = (
            inst.join(F.broadcast(_model_side(fid)), f"__f_{fid}")
            .groupBy("doc")
            .agg(F.max(f"__s_{fid}").alias(f"__s_{fid}"))
        )
        out = out.join(scored, "doc", "left")
    s = [F.coalesce(F.col(f"__s_{fid}"), F.lit(0.0)) for fid in fids]
    if strategy == "unit_weighted":
        score = sum(s[1:], s[0]) / F.lit(float(len(s)))
    elif strategy == "regression_weighted":
        score = sum(s[1:], s[0])
    else:  # max
        score = F.greatest(*s) if len(s) > 1 else s[0]
    return (
        out.select("doc", F.round(score, 6).alias("score"))
        .orderBy(F.desc("score"), F.desc("doc"))
        .limit(k)
    )
