"""Annotation / preference-label aggregation — the RLHF-data side of a
training pipeline.

A labeling campaign produces many (item, annotator, label) votes; before
anything trains on them the pipeline must collapse them to one label per
item and measure how much the annotators agreed (low-agreement items get
re-queued or down-weighted).  The reference engine has no analogue — this
family exists because a 100-TB training-data platform ingests human (and
LLM-judge) labels at the same scale as documents.

Scale shape: two keyed aggregations — (item, annotator) to collapse each
annotator to their latest vote, then (item) to count votes per label and
pick the winner — both map-side combinable, no windows, no driver state.
The per-item label histogram is bounded by the label vocabulary (tens),
so the second aggregate's rows are O(items × labels) before the final
per-item reduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def majority_label(
    df: DataFrame,
    item_col: str = "item_id",
    annotator_col: str = "annotator_id",
    label_col: str = "label",
    ts_col: str | None = None,
    vote_id_col: str | None = None,
) -> DataFrame:
    """Collapse raw annotation votes to one winning label per item, with
    agreement statistics.

    Semantics (each step deterministic, so engines agree bit-for-bit):

    1. **One vote per (item, annotator)** — an annotator who re-labeled an
       item counts once, with their LATEST vote: max over the
       (``ts_col``, ``vote_id_col``, label) struct.  ``vote_id_col`` must
       be unique per vote so the tiebreak is total; pass ``ts_col=None``
       to skip recency and treat (item, annotator) votes as already unique.
    2. **Winner** — the label with the most votes; ties break to the
       lexicographically SMALLEST label (min over the (-count, label)
       struct), never to arrival order.
    3. **Agreement** — ``winner_share_q`` = winner votes / total votes and
       ``pairwise_agree_q`` = Σ_l c_l(c_l−1) / n(n−1) (the probability two
       random annotators of this item agree — Fleiss' per-item observed
       agreement), both in integer micro-units so no float-sum ordering
       can diverge.  Items with one vote report pairwise_agree_q = NULL
       (0/0), not fake certainty.

    Output: (item, winner_label, winner_votes, n_votes, n_labels,
    winner_share_q, pairwise_agree_q).
    """
    votes = df
    if ts_col is not None:
        order = [F.col(ts_col)]
        if vote_id_col is not None:
            order.append(F.col(vote_id_col))
        latest = votes.groupBy(item_col, annotator_col).agg(
            F.max(F.struct(*order, F.col(label_col).alias("label"))).alias("_v")
        )
        votes = latest.select(item_col, F.col("_v.label").alias(label_col))
    else:
        # Caller asserts one row per (item, annotator) already — each row is
        # one vote; collapsing same-label rows here would silently shrink
        # majorities, so no distinct.
        votes = votes.select(item_col, label_col)

    hist = votes.groupBy(item_col, label_col).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    n = F.sum("c").cast("long")
    win = F.min(F.struct((-F.col("c")).alias("neg"), F.col(label_col).alias("label")))
    agree_pairs = F.sum(F.col("c") * (F.col("c") - F.lit(1))).cast("long")
    out = hist.groupBy(item_col).agg(
        win.alias("_w"),
        n.alias("n_votes"),
        F.count(F.lit(1)).cast("long").alias("n_labels"),
        agree_pairs.alias("_ap"),
    )
    # Shares in integer micro-units via exact integer division (DIV) — a
    # float divide + floor can land one off when the true quotient sits an
    # ulp below an integer; DuckDB's `//` is integer-exact, so ours is too.
    return out.select(
        item_col,
        F.col("_w.label").alias("winner_label"),
        (-F.col("_w.neg")).cast("long").alias("winner_votes"),
        "n_votes",
        "n_labels",
        F.expr("CAST((-_w.neg) * 1000000 DIV n_votes AS BIGINT)").alias(
            "winner_share_q"
        ),
        F.when(
            F.col("n_votes") > 1,
            F.expr(
                "CAST(_ap * 1000000 DIV (n_votes * (n_votes - 1)) AS BIGINT)"
            ),
        ).alias("pairwise_agree_q"),
    )
