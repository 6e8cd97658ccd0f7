"""Streaming curation admission: the batch curation pipeline's gate
stages (language filter → quality gate) fused onto the streaming
near-dup index — the production ingestion loop where a corpus is built
continuously instead of in one batch pass.

Order matters for cost: the gates are pure Catalyst row filters and run
FIRST, so rejected documents never pay shingling, signature
aggregation, or an index probe; the near-dup admission (the only
stateful, shuffling stage) sees only the survivors. Gate predicates are
deterministic functions of the row, so replaying a committed epoch
filters identically and the index's exactly-once marker protocol is
undisturbed.

Reference lineage: the reference composes sources → filter/map stages →
stateful stages in exactly this shape (SURVEY.md §3 pipeline model);
the quality/language gates are the LLM-pipeline extension of its
`filter` stage, and the index supplies the stateful stage.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hazelcast_jet_contrib_spark.functions import text as TX
from hazelcast_jet_contrib_spark.streaming.dedup_index import StreamingNearDupIndex


def curation_admission(
    index: StreamingNearDupIndex,
    min_quality: float | None = 0.5,
    langs: list[str] | None = None,
    require_gopher: bool = False,
):
    """foreachBatch function: language filter → quality gate →
    (optional) Gopher battery → near-dup index admission. Use::

        fb = curation_admission(index, min_quality=0.5, langs=["en"])
        stream.writeStream.foreachBatch(fb).start()

    Accepted rows accumulate under the index's ``accepted/`` store.
    """
    inner = index.foreach_batch()
    text_col = index._text_col

    def fb(batch_df, epoch_id):
        df = batch_df
        if langs is not None:
            if "lang" not in df.columns:
                # a silent skip here would admit every language into the
                # PERMANENT index — misconfiguration must fail fast
                raise ValueError(
                    f"curation_admission(langs={langs!r}) requires a 'lang' "
                    f"column; batch has {df.columns}"
                )
            df = df.filter(F.col("lang").isin(*langs))
        if min_quality is not None:
            df = df.filter(F.round(TX.quality_score(text_col), 4) >= min_quality)
        if require_gopher:
            # the FULL battery — a document passes iff every flag is 1
            # (gopher_flags contract); enforcing a subset would admit
            # repetition/boilerplate the batch pipeline rejects
            import functools

            g = TX.gopher_flags(text_col)
            df = df.filter(
                functools.reduce(
                    lambda a, b: a & b,
                    [g[name] == 1 for name in TX.GOPHER_FLAG_NAMES],
                )
            )
        inner(df, epoch_id)

    return fb
