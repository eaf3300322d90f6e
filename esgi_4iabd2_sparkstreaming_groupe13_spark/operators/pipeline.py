"""End-to-end corpus-preparation pipeline — the canonical LLM
training-data prep job, composed from the operator tiers this package
already ships (each stage is the tested operator, not a re-
implementation):

    filter (Gopher rules → trained quality scorer)
    → dedup (exact content sha → near-dup MinHash/CC, keep BEST copy)
    → scrub (PII redaction)
    → organize (deterministic split assignment → global shuffle)

Every stage is optional through :class:`PrepConfig`, every drop is
counted in the returned report (corpus prep must be auditable — "we
went from 12.4B to 9.1B docs and here is where each billion went"),
and every decision is a pure function of document id/content, so the
pipeline is deterministic across re-runs, partitionings, and engines.

Scale shape: stages communicate by LEFT SEMI joins on the id column
(8-byte keys through every shuffle — document payloads move only
through the final redaction join), and each operator keeps its own
pinned plan (see the per-operator docstrings / PLANS.md).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PrepConfig:
    """Knobs for :func:`prep_corpus`; ``None`` disables a stage."""

    text_col: str = "text"
    id_col: str = "doc_id"
    #: (name, sql_condition) rules; None → the published Gopher
    #: defaults (text.GOPHER_RULES). Pass [] to skip rule filtering.
    gopher_rules: list[tuple[str, str]] | None = None
    #: minimum trained-classifier score; None skips the stage
    quality_min: float | None = 0.5
    #: MinHash near-dup threshold; None skips fuzzy dedup
    near_dup_threshold: float | None = 0.9
    redact: bool = True
    train_pct: int = 90
    val_pct: int = 5
    shuffle: bool = True


def prep_corpus(
    df: DataFrame, config: PrepConfig = PrepConfig()
) -> tuple[DataFrame, dict]:
    """Run the full prep chain over a document table; returns the
    prepared corpus and a per-stage audit report.

    The output carries the input columns (text redacted in place when
    enabled) plus ``split`` (+ its audit ``bucket``) and, when
    shuffling, ``shuffle_pos`` — the contiguous 1-based epoch order a
    trainer consumes directly.
    """
    from .caching import track_persist
    from .corpus import global_shuffle, split_assign
    from .dedup import dedup_best_reps, dedup_exact_content
    from .text import gopher_filter_report, quality_classifier_score, redact_pii

    c = config
    report: dict = {}

    # every surviving frame is consumed by ≥2 downstream plans (the
    # stage count + the next stage), so persist through the tracked
    # registry — the caller (CLI/test/bench loop) releases with
    # caching.release_cached() after its final action
    def advance(nxt: DataFrame, stage: str) -> DataFrame:
        nxt = track_persist(nxt)
        report[stage] = nxt.count()
        return nxt

    cur = advance(df, "input_docs")

    if c.gopher_rules is None or c.gopher_rules:
        verdicts = gopher_filter_report(
            cur, c.text_col, c.id_col, c.gopher_rules
        )
        keep = verdicts.filter(F.col("passes")).select(c.id_col)
        cur = advance(cur.join(keep, c.id_col, "left_semi"), "after_gopher")

    scores = None
    if c.quality_min is not None:
        # persisted: the near-dup keep-rule reuses these scores
        # instead of paying the full classifier scan a second time
        scores = track_persist(
            quality_classifier_score(cur, c.text_col, c.id_col).select(
                c.id_col, "quality_score"
            )
        )
        keep = scores.filter(
            F.col("quality_score") >= c.quality_min
        ).select(c.id_col)
        cur = advance(cur.join(keep, c.id_col, "left_semi"), "after_quality")

    keep = dedup_exact_content(cur, c.text_col, c.id_col).select(c.id_col)
    cur = advance(cur.join(keep, c.id_col, "left_semi"), "after_exact_dedup")

    if c.near_dup_threshold is not None:
        best = dedup_best_reps(
            cur, c.text_col, c.id_col, c.near_dup_threshold, scores=scores
        ).select(F.col("best_doc_id").alias(c.id_col))
        cur = advance(cur.join(best, c.id_col, "left_semi"), "after_near_dedup")

    report["output_docs"] = report[
        "after_near_dedup" if c.near_dup_threshold is not None
        else "after_exact_dedup"
    ]

    if c.redact:
        red = track_persist(redact_pii(cur, c.text_col, c.id_col))
        report["pii_redactions"] = int(
            red.agg(F.sum("n_redactions")).collect()[0][0] or 0
        )
        cur = (
            cur.drop(c.text_col)
            .join(red.drop("n_redactions"), c.id_col)
            .withColumnRenamed("redacted", c.text_col)
        )

    cur = split_assign(cur, c.id_col, c.train_pct, c.val_pct, full_row=True)
    if c.shuffle:
        cur = global_shuffle(cur, c.id_col)
    return cur, report
