"""Python UDTFs (Spark 4 `@udtf`) — the §2.10 row the reference lacks
entirely (UDAF/UDTF: absent; SURVEY marks them as our extension point).

`SentenceSplit` segments normalized text into sentences with positions.
The split rule is RE2-compatible (`[.!?]+\\s+`, delimiter consumed, no
lookbehind) so the same rule runs verbatim in DuckDB oracles and in
Spark's JVM `regexp_split` — and tests/test_frame_extra.py pins the UDTF
output row-identical to the pure-JVM posexplode form.

Scale note: a UDTF is per-row Python (Arrow transport, interpreted eval)
— it is the API-surface demonstration, not the hot path. Pipelines that
only need the rows should use the JVM form (split + posexplode); a UDTF
earns its cost when the per-row logic genuinely needs Python (stateful
tokenizers, imported models).
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_BOUNDARY = r"[.!?]+\s+"


@udtf(returnType="sent_no: int, sentence: string, n_words: int")
class SentenceSplit:
    """One output row per sentence of the input text: (index, text,
    word count). Empty/whitespace-only fragments are dropped."""

    def eval(self, text: str):  # noqa: D102
        if not text:
            return
        for i, s in enumerate(
            x for x in re.split(_BOUNDARY, text.strip()) if x.strip()
        ):
            yield (i, s, len(s.split()))


def register(spark) -> None:
    """Register `split_sentences` for SQL lateral use (idempotent)."""
    spark.udtf.register("split_sentences", SentenceSplit)
