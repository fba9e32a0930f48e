"""Multi-tenant stream surface: authz mask, inbox, unread tracking
(SURVEY.md §1.1 — previously declared out of scope; closed in round 3).

Reference parity:
* authz_mask        — MiruAuthzIndex.getCompositeAuthz: the composite authz
                      bitmap is the OR of the per-label bitmaps for every
                      label in the caller's MiruAuthzExpression
                      (m-service/.../index/lab/LabAuthzIndex.java:80-86;
                      m-api/.../query/filter/MiruAuthzExpression.java), then
                      ANDed into every query (FullTextCustomQuestion.java:
                      105-107). Batch restatement: docs whose authz-label
                      array intersects the expression values.
* inbox             — MiruInboxIndex: one bitmap per MiruStreamId holding
                      the docs appended to that stream's inbox
                      (m-plugin/index/MiruInboxIndex.java).
* unread            — MiruUnreadTrackingIndex: per-stream unread bitmap;
                      `append` adds new docs, `applyRead(readMask)` clears
                      them (m-plugin/index/MiruUnreadTrackingIndex.java).
                      Batch restatement: inbox minus the read set — either
                      an explicit read-doc relation (anti-join) or a
                      last-read watermark (`doc > last_read`, the
                      setLastActivityIndex cursor form).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def authz_mask(
    docs: DataFrame, authz_col: str, allowed: list[str], id_cols: list[str] | None = None
) -> DataFrame:
    """Doc set visible under the authz expression: the doc's label array
    intersects ``allowed`` (OR-composite of per-label posting sets). An
    empty expression sees nothing (the reference's NOT_PROVIDED refuses)."""
    id_cols = id_cols or ["part", "doc_id"]
    if not allowed:
        return docs.select(*id_cols).limit(0)
    expr = F.array(*[F.lit(v) for v in allowed])
    return docs.filter(F.arrays_overlap(F.col(authz_col), expr)).select(*id_cols)


def inbox(
    df: DataFrame, stream_col: str, stream_id, doc_col: str,
    predicate: Column | None = None,
) -> DataFrame:
    """The stream's inbox doc set, newest-first capable (callers order by
    doc desc for the inbox-browse shape)."""
    out = df.filter(F.col(stream_col) == F.lit(stream_id))
    if predicate is not None:
        out = out.filter(predicate)
    return out.select(F.col(doc_col).alias("doc")).distinct()


def unread(
    df: DataFrame, stream_col: str, stream_id, doc_col: str,
    read_docs: DataFrame | None = None,
    last_read: int | None = None,
) -> DataFrame:
    """Unread docs of a stream: inbox minus the read mask.

    ``read_docs`` (a relation with a ``doc`` column) is applyRead's explicit
    mask form; ``last_read`` is the setLastActivityIndex watermark form
    (docs with id > watermark are unread). Both may be combined; neither
    given means everything in the inbox is unread."""
    out = inbox(df, stream_col, stream_id, doc_col)
    if last_read is not None:
        out = out.filter(F.col("doc") > int(last_read))
    if read_docs is not None:
        out = out.join(read_docs.select("doc").distinct(), "doc", "left_anti")
    return out
