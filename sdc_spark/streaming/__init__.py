"""Structured Streaming surface — capability the batch-only reference lacks
(SURVEY.md §2.6 marks streaming 'absent — our extension').

Design: every streaming aggregation here has a batch twin built from the
same expressions, so the driver's batch oracle checks the semantics and the
streaming tests check the incremental execution (memory sink,
processAllAvailable)."""

from sdc_spark.streaming.windows import (  # noqa: F401
    session_agg_batch,
    sliding_agg,
    tumbling_agg,
    tumbling_agg_batch,
)
