"""Round-4 curation/warehouse additions: weighted sampling, SCD2 history,
hash-sharded epoch shuffle.

All three are deterministic pure-DataFrame compositions (md5-derived
uniforms, window ranks), so each has an exact DuckDB oracle despite being
'sampling'/'shuffling' semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sdc_spark.operators.curation import weighted_sample_per_group
from sdc_spark.plans.registry import oracle, query
from sdc_spark.sources.readers import local_rows, read_table


@query("sample_weighted")
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, 5 docs per source with
    P(pick) ∝ n_chars (Efraimidis–Spirakis keys over md5 uniforms — see
    operators/curation.weighted_sample_per_group). Longer docs are
    proportionally likelier but never guaranteed; the draw is bit-stable
    across engines/retries."""
    doc = read_table(spark, sf_dir, "documents")
    out = weighted_sample_per_group(doc, "source", "doc_id", "n_chars", 5)
    return out.select("source", "doc_id", "n_chars").orderBy("source", "doc_id")


oracle(
    "sample_weighted",
    """
    WITH keyed AS (
        SELECT source, doc_id, n_chars,
               ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                    + 1) / 4294967296.0) / n_chars AS k
        FROM documents WHERE n_chars > 0
    ), ranked AS (
        SELECT source, doc_id, n_chars,
               row_number() OVER (PARTITION BY source ORDER BY k DESC, doc_id) AS rk
        FROM keyed
    )
    SELECT source, doc_id, n_chars FROM ranked WHERE rk <= 5
    ORDER BY source, doc_id
    """,
)


@query("curation_curriculum")
def curation_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning phase assignment: corpus ordered by quality
    ascending (train low-noise-last curricula flip the ordering) and cut
    into 4 count-balanced phases with exact ntile semantics — WITHOUT
    ntile's single-partition global sort: the global rank rides
    order.with_position (range exchange + P-row broadcast offsets) and
    the phase is a closed-form function of the position. Per-phase
    manifest: doc count, token budget, quality band — the numbers a
    training scheduler consumes."""
    from sdc_spark.functions import text as stext
    from sdc_spark.operators.curation import curriculum_phases

    doc = read_table(spark, sf_dir, "documents")
    scored = doc.select(
        "doc_id",
        stext.quality_score("text").alias("quality"),
        stext.ws_token_count("text").alias("n_tokens"),
    )
    phased = curriculum_phases(scored, ["quality", "doc_id"], 4)
    return (
        phased.groupBy("phase")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("token_budget"),
            F.round(F.min("quality"), 6).alias("q_lo"),
            F.round(F.max("quality"), 6).alias("q_hi"),
        )
        .orderBy("phase")
    )


oracle(
    "curation_curriculum",
    r"""
    WITH c AS (
        SELECT doc_id,
               length(text) AS n_chars,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
               len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha,
               len(regexp_extract_all(text, '[^\w\s]')) AS n_punct,
               len(regexp_extract_all(
                   regexp_replace(trim(lower(text)), '\s+', ' ', 'g'),
                   '(^| )(the|and|of|to|is|with)( |$)')) AS n_stop
        FROM documents
    ),
    scored AS (
        SELECT doc_id, n_tokens,
               (CAST(n_alpha AS DOUBLE) / CAST(n_chars AS DOUBLE)) * 0.4
                 + (1.0 - CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE)) * 0.2
                 + least((CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 4.0,
                         1.0) * 0.4 AS quality
        FROM c
    ),
    phased AS (
        SELECT doc_id, n_tokens, quality,
               ntile(4) OVER (ORDER BY quality, doc_id) AS phase
        FROM scored
    )
    SELECT CAST(phase AS INT) AS phase, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS token_budget,
           round(min(quality), 6) AS q_lo, round(max(quality), 6) AS q_hi
    FROM phased GROUP BY phase ORDER BY phase
    """,
)


@query("curation_balanced_shards")
def curation_balanced_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-balanced training-shard export: documents dealt across 8
    shards in boustrophedon (snake) order of token count — per-shard
    token totals stay within one heavy document of each other, so no
    data-parallel rank starves. Per-shard manifest graded exactly (shard
    is a closed-form function of the distributed global position; oracle
    recomputes it from row_number arithmetic)."""
    from sdc_spark.functions.text import ws_token_count
    from sdc_spark.operators.curation import snake_sharding

    doc = read_table(spark, sf_dir, "documents").select(
        "doc_id", ws_token_count("text").alias("n_tokens")
    )
    sharded = snake_sharding(doc, "n_tokens", 8)
    return (
        sharded.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.min("doc_id").alias("min_doc"),
        )
        .orderBy("shard")
    )


oracle(
    "curation_balanced_shards",
    r"""
    WITH t AS (
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
        FROM documents
    ), p AS (
        SELECT doc_id, n_tokens,
               row_number() OVER (ORDER BY n_tokens DESC, doc_id) - 1 AS pos
        FROM t
    ), s AS (
        SELECT doc_id, n_tokens,
               CASE WHEN (pos // 8) % 2 = 0 THEN pos % 8
                    ELSE 7 - (pos % 8) END AS shard
        FROM p
    )
    SELECT CAST(shard AS INT) AS shard, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
           min(doc_id) AS min_doc
    FROM s GROUP BY shard ORDER BY shard
    """,
)


@query("scd2_customer_status")
def scd2_customer_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 history construction (the CDC pattern `cdc_latest_state`
    is the type-1 half of): each customer's order-status changes become
    validity intervals — valid_from = this change's date, valid_to = the
    next change's date (null while current), is_current flag. One window
    over (custkey, orderdate): a single hash shuffle, no self-join.
    Consecutive same-status rows are collapsed first (true SCD2 stores
    only changes)."""
    orders = read_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changes = (
        orders.withColumn("__prev__", F.lag("o_orderstatus").over(w))
        .filter(
            F.col("__prev__").isNull() | (F.col("o_orderstatus") != F.col("__prev__"))
        )
        .drop("__prev__")
    )
    w2 = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        changes.select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderdate").cast("string").alias("valid_from"),
            F.lead("o_orderdate").over(w2).cast("string").alias("valid_to"),
            F.lead("o_orderdate").over(w2).isNull().alias("is_current"),
        )
        .orderBy("custkey", "valid_from")
    )


oracle(
    "scd2_customer_status",
    """
    WITH changes AS (
        SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
               lag(o_orderstatus) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey) AS prev
        FROM orders
    ), kept AS (
        SELECT * FROM changes WHERE prev IS NULL OR o_orderstatus <> prev
    )
    SELECT o_custkey AS custkey,
           o_orderstatus AS status,
           CAST(o_orderdate AS VARCHAR) AS valid_from,
           CAST(lead(o_orderdate) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey)
                AS VARCHAR) AS valid_to,
           lead(o_orderdate) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) IS NULL
               AS is_current
    FROM kept
    ORDER BY custkey, valid_from
    """,
)


@query("shuffle_shard_epoch")
def shuffle_shard_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle for training export: shard =
    md5_32(seed||doc_id) mod 64, position within shard = rank of the full
    hash. A seeded hash permutation is how you globally shuffle 100 TB
    without a global sort: changing the seed string re-permutes every
    epoch, each shard is written independently, and any engine can
    reproduce the exact layout. One hash shuffle on shard."""
    doc = read_table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("epoch1:"), F.col("doc_id").cast("string")).cast("binary"))
    shard = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 64).alias("shard")
    keyed = doc.select("doc_id", shard, h.alias("__h__"))
    w = W.partitionBy("shard").orderBy("__h__", "doc_id")
    return (
        keyed.withColumn("pos", F.row_number().over(w))
        .select("shard", "pos", "doc_id")
        .orderBy("shard", "pos")
    )


oracle(
    "shuffle_shard_epoch",
    """
    WITH keyed AS (
        SELECT doc_id,
               md5('epoch1:' || CAST(doc_id AS VARCHAR)) AS h,
               ('0x' || substr(md5('epoch1:' || CAST(doc_id AS VARCHAR)), 1, 8))
                   ::BIGINT % 64 AS shard
        FROM documents
    )
    SELECT shard,
           row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS pos,
           doc_id
    FROM keyed
    ORDER BY shard, pos
    """,
)


@query("frame_explode")
def frame_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.explode surface over real data: split each document into tokens,
    explode to one row per token (explode_outer — pandas empty/null -> one
    null row), count per token over the 'src0' slice. The explode is a
    Generate node fused into the scan stage: no shuffle until the final
    map-side-combined count."""
    from sdc_spark.frame.core import SparkFrame
    from sdc_spark.frame.series import IDX
    from sdc_spark.operators.dedup import normalized_text

    doc = read_table(spark, sf_dir, "documents").filter(F.col("source") == "src0")
    frame = SparkFrame(
        doc.select(
            F.col("doc_id").alias(IDX),
            "doc_id",
            F.split(normalized_text(F.col("text")), " ").alias("toks"),
        )
    )
    exploded = frame.explode("toks")
    return (
        exploded._df.groupBy(F.col("toks").alias("token"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(30)
    )


oracle(
    "frame_explode",
    r"""
    SELECT t.token, count(*) AS n
    FROM (
        SELECT unnest(string_split(
                   regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) AS token
        FROM documents WHERE source = 'src0'
    ) t
    GROUP BY t.token
    ORDER BY n DESC, t.token
    LIMIT 30
    """,
)


@query("stats_profile")
def stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiler (warehouse data-quality primitive): for
    each profiled lineitem column — rows, nulls, exact distinct count,
    min, max — computed in a SINGLE scan + aggregate (all columns'
    partials ride one map-side combine), then unpivoted to one row per
    column. Contrast with naive per-column scans: at 100 TB this is 1
    pass, not 4."""
    li = read_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            # fixed-point (1e-4) LONGs computed BEFORE the aggregate:
            # floor(x*1e4 + 0.5) is a pure IEEE-double op sequence, bitwise
            # identical in Spark and DuckDB, so both engines aggregate the
            # SAME integers and no engine-specific round()/cast-rounding
            # (Spark truncates double->long, DuckDB rounds) can flake the
            # oracle hash (values here are prices/rates, <=2 decimals, >0)
            F.min(F.floor(F.col(c) * 10000 + F.lit(0.5)).cast("long")).alias(
                f"{c}__min"
            ),
            F.max(F.floor(F.col(c) * 10000 + F.lit(0.5)).cast("long")).alias(
                f"{c}__max"
            ),
        ]
    row = li.agg(*aggs)
    # unpivot the single aggregate row via explode-of-structs: unionAll of
    # per-column selects would copy the aggregate subplan (4 scans); this
    # keeps it ONE scan + one 1-row Generate
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__rows").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_val_e4"),
            F.col(f"{c}__max").alias("max_val_e4"),
        )
        for c in cols
    ]
    return (
        row.select(F.explode(F.array(*structs)).alias("s"))
        .select("s.*")
        .orderBy("column")
    )


oracle(
    "stats_profile",
    """
    WITH agg AS (
        -- integer-only comparison surface: floor(x*1e4 + 0.5) pre-agg
        -- mirrors the Spark side bit-for-bit (IEEE double mul/add/floor),
        -- and every aggregate is CAST to BIGINT so no HUGEINT/DECIMAL
        -- reaches the driver's hasher
        SELECT CAST(count(*) AS BIGINT) AS rows_,
               CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS qn,
               CAST(count(DISTINCT l_quantity) AS BIGINT) AS qd,
               min(CAST(floor(l_quantity * 10000 + 0.5) AS BIGINT)) AS qmin,
               max(CAST(floor(l_quantity * 10000 + 0.5) AS BIGINT)) AS qmax,
               CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS en,
               CAST(count(DISTINCT l_extendedprice) AS BIGINT) AS ed,
               min(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT)) AS emin,
               max(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT)) AS emax,
               CAST(sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS dn,
               CAST(count(DISTINCT l_discount) AS BIGINT) AS dd,
               min(CAST(floor(l_discount * 10000 + 0.5) AS BIGINT)) AS dmin,
               max(CAST(floor(l_discount * 10000 + 0.5) AS BIGINT)) AS dmax,
               CAST(sum(CASE WHEN l_tax IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS tn,
               CAST(count(DISTINCT l_tax) AS BIGINT) AS td,
               min(CAST(floor(l_tax * 10000 + 0.5) AS BIGINT)) AS tmin,
               max(CAST(floor(l_tax * 10000 + 0.5) AS BIGINT)) AS tmax
        FROM lineitem
    )
    SELECT 'l_discount' AS "column", rows_ AS n_rows, dn AS n_nulls,
           dd AS n_distinct, dmin AS min_val_e4, dmax AS max_val_e4 FROM agg
    UNION ALL
    SELECT 'l_extendedprice', rows_, en, ed, emin, emax FROM agg
    UNION ALL
    SELECT 'l_quantity', rows_, qn, qd, qmin, qmax FROM agg
    UNION ALL
    SELECT 'l_tax', rows_, tn, td, tmin, tmax FROM agg
    ORDER BY "column"
    """,
)


@query("table_diff")
def table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (data diff): compare the orders table with
    a deterministically perturbed next-day snapshot (every key % 97 == 0
    repriced +1%, every key % 101 == 0 deleted) and classify each key as
    added/removed/changed/unchanged — one full-outer join on the key with
    md5 row-fingerprint comparison, then a tiny count per class. At scale
    the fingerprints (16 bytes) are what shuffles, not the rows."""
    orders = read_table(spark, sf_dir, "orders")
    new = (
        orders.filter(F.col("o_orderkey") % 101 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 97 == 0, F.round(F.col("o_totalprice") * 1.01, 2)
            ).otherwise(F.col("o_totalprice")),
        )
    )
    fp = lambda df: df.select(  # noqa: E731
        "o_orderkey",
        F.md5(
            F.concat_ws(
                "|", F.col("o_totalprice").cast("string"), "o_orderstatus"
            ).cast("binary")
        ).alias("fp"),
    )
    a, b = fp(orders).alias("a"), fp(new).alias("b")
    j = a.join(b, "o_orderkey", "full_outer")
    cls = (
        F.when(F.col("a.fp").isNull(), F.lit("added"))
        .when(F.col("b.fp").isNull(), F.lit("removed"))
        .when(F.col("a.fp") != F.col("b.fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(cls.alias("class"))
        .groupBy("class")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("class")
    )


oracle(
    "table_diff",
    """
    WITH new AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 97 = 0
                    THEN round(o_totalprice * 1.01, 2) ELSE o_totalprice END
                   AS o_totalprice,
               o_orderstatus
        FROM orders WHERE o_orderkey % 101 <> 0
    ), a AS (
        SELECT o_orderkey,
               md5(CAST(o_totalprice AS VARCHAR) || '|' || o_orderstatus) AS fp
        FROM orders
    ), b AS (
        SELECT o_orderkey,
               md5(CAST(o_totalprice AS VARCHAR) || '|' || o_orderstatus) AS fp
        FROM new
    )
    SELECT CASE WHEN a.fp IS NULL THEN 'added'
                WHEN b.fp IS NULL THEN 'removed'
                WHEN a.fp <> b.fp THEN 'changed'
                ELSE 'unchanged' END AS class,
           count(*) AS n
    FROM a FULL OUTER JOIN b USING (o_orderkey)
    GROUP BY 1 ORDER BY 1
    """,
)


def _fk_edge_join(fact: DataFrame, edges) -> DataFrame:
    """The audit's join frame: the fact's FK columns left-joined to each
    edge's DISTINCT dim key set (a duplicated dim key must not fan the
    fact rows out — NOT EXISTS semantics, like the anti-join this
    replaced). NO broadcast hint anywhere: one referenced side
    (orders.o_orderkey for lineitem→orders) is FACT-sized, and a forced
    broadcast of billions of keys OOMs the driver at corpus scale. AQE
    picks per edge — genuinely small dims still broadcast from size
    estimates; fact-sized key sets get a shuffled join. Module-level so
    the plan-shape test can pin the hint's absence."""
    j = fact.select(*[fk for fk, _, _, _ in edges])
    for fk, dim, pk, _ in edges:
        d = dim.select(pk).distinct()
        j = j.join(d, j[fk] == d[pk], "left")
    return j


@query("fk_integrity_audit")
def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit (warehouse constraint checking):
    orphan counts for each declared FK edge — lineitem→orders,
    lineitem→part, lineitem→supplier, orders→customer — via left joins
    against the distinct key side, one conditional-aggregate scan per
    fact table, with only the FK columns read (column pruning visible
    in the scan)."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    part = read_table(spark, sf_dir, "part")
    supp = read_table(spark, sf_dir, "supplier")
    cust = read_table(spark, sf_dir, "customer")

    # ONE pass per fact table (r11: the per-edge anti-join+count form
    # scanned lineitem six times — 3 orphan counts + 3 totals): all of a
    # fact's FK edges check in a single scan via left joins to the dim
    # key sets (strategy AQE-chosen — see _fk_edge_join) + one
    # conditional aggregate. Identical counts — an orphan is exactly a
    # null-matched dim key.
    def audit(fact, edges):
        j = _fk_edge_join(fact, edges)
        row = j.agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(F.col(pk).isNull().cast("long")).alias(f"o_{i}")
                for i, (_, _, pk, _) in enumerate(edges)
            ],
        ).collect()[0]
        return [
            (edge, int(row[f"o_{i}"]), int(row["n"]))
            for i, (_, _, _, edge) in enumerate(edges)
        ]

    rows = audit(
        li,
        [
            ("l_orderkey", orders, "o_orderkey", "lineitem->orders"),
            ("l_partkey", part, "p_partkey", "lineitem->part"),
            ("l_suppkey", supp, "s_suppkey", "lineitem->supplier"),
        ],
    ) + audit(orders, [("o_custkey", cust, "c_custkey", "orders->customer")])
    return local_rows(
        spark, rows, "edge string, n_orphans long, n_rows long"
    ).orderBy("edge")


oracle(
    "fk_integrity_audit",
    """
    SELECT 'lineitem->orders' AS edge,
           (SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans,
           (SELECT count(*) FROM lineitem) AS n_rows
    UNION ALL
    SELECT 'lineitem->part',
           (SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM part p
                               WHERE p.p_partkey = l.l_partkey)),
           (SELECT count(*) FROM lineitem)
    UNION ALL
    SELECT 'lineitem->supplier',
           (SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM supplier s
                               WHERE s.s_suppkey = l.l_suppkey)),
           (SELECT count(*) FROM lineitem)
    UNION ALL
    SELECT 'orders->customer',
           (SELECT count(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey)),
           (SELECT count(*) FROM orders)
    ORDER BY edge
    """,
)


@query("attribution_last_touch")
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: for every purchase, the most recent prior
    click by the same user (id, timestamp gap in seconds) — an as-of
    self-join on the event stream expressed as ONE running-last window
    per user (carry the latest click id/ts forward, read it at purchase
    rows). One hash shuffle on user_id; no self-join, no range scan."""
    ev = read_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    is_click = F.col("event_type") == "click"
    last_click_id = F.last(
        F.when(is_click, F.col("event_id")), ignorenulls=True
    ).over(w)
    last_click_ts = F.last(F.when(is_click, F.col("ts")), ignorenulls=True).over(w)
    return (
        ev.select(
            "user_id",
            "event_id",
            "event_type",
            "ts",
            last_click_id.alias("click_id"),
            last_click_ts.alias("click_ts"),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            "click_id",
            (F.unix_micros(F.col("ts").cast("timestamp"))
             - F.unix_micros(F.col("click_ts").cast("timestamp"))).alias("gap_us"),
        )
        .orderBy("user_id", "purchase_id")
    )


oracle(
    "attribution_last_touch",
    """
    WITH carried AS (
        SELECT user_id, event_id, event_type, ts,
               last_value(CASE WHEN event_type = 'click' THEN event_id END
                          IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS click_id,
               last_value(CASE WHEN event_type = 'click' THEN ts END
                          IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS click_ts
        FROM events
    )
    SELECT user_id, event_id AS purchase_id, click_id,
           epoch_us(ts) - epoch_us(click_ts) AS gap_us
    FROM carried WHERE event_type = 'purchase'
    ORDER BY user_id, purchase_id
    """,
)
