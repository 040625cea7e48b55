"""Relational analogues of the reference's operator shapes (SURVEY.md
§2.2-2.6), expressed over the driver's TPC-H-ish tables so the DuckDB
oracle can verify them at sf0.01.

Each function cites the reference operator whose *shape* it exercises
(the reference computes over PDFs; the relational skeleton — filter /
aggregate / window / join / permutation — is identical). All are
(spark, sf_dir) -> DataFrame.

Determinism rules used throughout (so value hashes match DuckDB):
  * money/double sums -> fixed-point micro units:
    CAST(FLOOR(x * 1000000.0) AS BIGINT), summed exactly as int64;
  * counts cast to long on both sides (DuckDB sum(BIGINT) is HUGEINT,
    so oracles wrap sums in CAST(... AS BIGINT));
  * timestamps surfaced as epoch seconds (bigint);
  * ranking windows always carry a unique tie-break key.

Scale notes: small dimensions (region, nation, supplier, even
customer at TPC-H ratios) are broadcast explicitly; fact-fact joins
shuffle on their join key only after filters are pushed below the
join (written filter-first so Catalyst keeps them at the scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import read_table


def micro(col) -> "F.Column":
    """Fixed-point micro-units: exact int64 arithmetic on both engines."""
    return F.floor(col * F.lit(1000000.0)).cast("long")


# ------------------------------------------------------ aggregations (E17)

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape — the reference's get-info-on-pdf per-page
    aggregate (GetInfoOnPDF.java:812-851) as groupBy().agg()."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") < F.lit("1997-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(micro(F.col("l_quantity"))).alias("sum_qty_micro"),
            F.sum(micro(F.col("l_extendedprice"))).alias("sum_price_micro"),
            F.sum(micro(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("sum_disc_price_micro"),
        )
    )


def e16_customer_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order profile — /analysis/* counts
    (AnalysisController.java:36-148): count, exact total, last date."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.sum(micro(F.col("o_totalprice"))).alias("total_micro"),
        F.max(F.unix_timestamp("o_orderdate")).alias("last_order_epoch"),
    )


def e3_doc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page classification TEXT/IMAGE/MIXED thresholds
    (PdfContentExtractor.java:52,70-86; 20-char text presence) mapped
    onto document length classes."""
    docs = read_table(spark, sf_dir, "documents")
    cls = (
        F.when(F.col("n_chars") < 20, "EMPTY")
        .when(F.col("n_chars") < 200, "SHORT")
        .otherwise("TEXT")
    )
    return docs.groupBy(cls.alias("doc_class")).agg(F.count("*").alias("n_docs"))


# ------------------------------------------------------------- joins (S8+)

def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape — customer⋈orders⋈lineitem with a broadcast
    dimension; the reference's overlay/page-zip join analogue
    (PdfOverlayController.java)."""
    cust = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey")
        .agg(
            F.sum(micro(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("revenue_micro")
        )
        .orderBy(F.desc("revenue_micro"), F.asc("l_orderkey"))
        .limit(10)
    )


def q5_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape — snowflake join with broadcast dims."""
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = read_table(spark, sf_dir, "nation")
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    sup = read_table(spark, sf_dir, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(cust, (orders.o_custkey == cust.c_custkey)
              & (cust.c_nationkey == sup.s_nationkey))
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(micro(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("revenue_micro")
        )
    )


# ----------------------------------------------------------- windows (E18+)

def e18_top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Title inference = top-1 by size (AutoRenameController.java:106-138):
    row_number over (customer, totalprice desc)."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey",
                micro(F.col("o_totalprice")).alias("price_micro"))
    )


def s3_running_sum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-by-size = running sum -> bucket (SplitPdfBySizeController):
    cumulative quantity per order, bucket = floor(cum/100)."""
    li = read_table(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is NOT unique in this corpus; the
    # window order must be total or the running sum is nondeterministic
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_partkey", "l_suppkey",
                 micro(F.col("l_quantity")), micro(F.col("l_extendedprice")))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_orderkey", "l_linenumber",
        F.sum(micro(F.col("l_quantity"))).over(w).alias("cum_qty_micro"),
    ).withColumn(
        "bucket", F.floor(F.col("cum_qty_micro") / F.lit(100000000.0)).cast("long")
    )


def s4_lead_next_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chapter end-pages = lead() (SplitPdfByChaptersController:62-90):
    next order per customer with gap in seconds."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead(F.unix_timestamp("o_orderdate")).over(w)
    return orders.select(
        "o_custkey", "o_orderkey",
        F.unix_timestamp("o_orderdate").alias("order_epoch"),
        nxt.alias("next_order_epoch"),
    ).withColumn("gap_s", F.col("next_order_epoch") - F.col("order_epoch"))


def e12_unique_name_suffix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-name suffixing base_1.ext (AttachmentService.java:454-472)
    = row_number per name partition."""
    part = read_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_partkey")
    return part.select(
        "p_partkey", "p_brand",
        F.concat(F.col("p_brand"), F.lit("_"),
                 F.row_number().over(w).cast("string")).alias("filename"),
    )


def s6_reverse_permutation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REVERSE page rearrangement (RearrangePagesPDFController:212-220)
    as a deterministic index permutation per document."""
    li = read_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey")
    return li.select(
        "l_orderkey", "l_linenumber",
        (F.max("l_linenumber").over(w) - F.col("l_linenumber") + 1).alias("new_pos"),
    )


def s1_merge_comparator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric-aware filename rank over merge inputs — a DELIBERATE
    engine extension: the reference's byFileName is plain
    case-insensitive lexicographic (MergeController.java:118-123, which
    operators.pageops._merge_sort_keys mirrors exactly); this gate
    exercises the natural-sort variant useful for 'src2' < 'src12'
    upload names."""
    docs = read_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    num = F.regexp_extract("source", "([0-9]+)", 1).cast("long")
    w = Window.orderBy(num.asc(), F.col("source").asc())
    return per_src.select(
        "source", num.alias("src_num"), "n_docs",
        F.row_number().over(w).cast("long").alias("merge_rank"),
    )


def f4_size_class_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter-page-size vs standard sizes (FilterController.java:160-181,
    PdfUtils.textToPageSize :52-66): classify against the FULL nine-size
    map (A0-A6, LETTER, LEGAL), count per class. The wire-level area
    comparator is q_f4_page_size_wire."""
    part = read_table(spark, sf_dir, "part")
    cls = (
        F.when(F.col("p_size") <= 5, "A6")
        .when(F.col("p_size") <= 11, "A5")
        .when(F.col("p_size") <= 17, "A4")
        .when(F.col("p_size") <= 22, "A3")
        .when(F.col("p_size") <= 28, "A2")
        .when(F.col("p_size") <= 33, "A1")
        .when(F.col("p_size") <= 39, "A0")
        .when(F.col("p_size") <= 44, "LETTER")
        .otherwise("LEGAL")
    )
    return part.groupBy(cls.alias("size_class")).agg(
        F.count("*").alias("n_parts"),
        F.sum(micro(F.col("p_retailprice"))).alias("total_price_micro"),
    )


# ------------------------------------------------------------ filters (F*)

def f1_filter_contains_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter-contains-text (FilterController.java:62-77)."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.filter(F.col("text").contains("spark join")).select(
        "doc_id", "lang", "n_chars"
    )


def f3_filter_count_comparator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter-page-count Greater (FilterController.java:127-142)."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey").agg(F.count("*").alias("n_lines"))
        .filter(F.col("n_lines") >= 8)
    )


def f5_filter_size_comparator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter-file-size (FilterController.java:199-211) over n_chars."""
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("n_chars") > 400)
        .groupBy("lang").agg(F.count("*").alias("n_docs"))
    )


def f7_page_select_dsl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-select DSL (GeneralUtils.java:636-830) — '2n+1' over 7
    lines; the evaluated set embeds as a literal so Catalyst pushes the
    IN filter to the scan."""
    from ..functions.page_select import parse_page_selection

    pages = parse_page_selection("2n+1", total=7)
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_linenumber").isin(pages))
        .groupBy("l_linenumber").agg(F.count("*").alias("n_rows"))
    )


def e13_regex_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextFinder regex search (TextFinder.java:21-193): occurrence
    counts per document, docs with >= 1 match."""
    docs = read_table(spark, sf_dir, "documents")
    n = F.size(F.regexp_extract_all(F.col("text"), F.lit("ta[a-z]+"), 0)).cast("long")
    return (
        docs.select("doc_id", n.alias("n_matches"))
        .filter(F.col("n_matches") > 0)
    )


# ---------------------------------------------------------------- events

def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window rollup (batch shape of the streaming path):
    per (hour, event_type) count + exact micro sum."""
    ev = read_table(spark, sf_dir, "events")
    hour = F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch")
    return ev.groupBy(hour, "event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(micro(F.col("value"))).alias("sum_value_micro"),
    )


def events_sessionize(spark: SparkSession, sf_dir: str,
                      gap_minutes: int = 480) -> DataFrame:
    """Gap-based sessionization — the canonical stateful-stream shape
    (Structured Streaming's session_window / flatMapGroupsWithState
    semantics), computed batch-exact so the DuckDB oracle can pin it:
    per user, events ordered by (ts, event_id) chain into one session
    while consecutive gaps stay STRICTLY UNDER ``gap_minutes``; a gap
    >= the threshold opens the next session (session_window's
    end-exclusive [t, t+gap) convention, so the batch operator and the
    streaming-native one agree bit-for-bit — pinned in
    tests/test_retrieval_sessionize.py). Output one row per session:
    (user_id,
    session_idx 1-based, n_events, start_us, end_us epoch-micros,
    sum_value_micro).

    Scale shape: one window partitioned by user_id (the natural key —
    no global ordering anywhere) for the lag + running sum, then the
    same-keyed groupBy; both stages share the user_id shuffle. Epoch
    MICROseconds keep the arithmetic integer-exact."""
    ev = read_table(spark, sf_dir, "events")
    # parquet yields TIMESTAMP_NTZ; the session pins UTC, so the
    # ltz cast is the identity DuckDB's epoch_us applies to naive ts
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    flagged = ev.select(
        "user_id", "ts", "event_id", us.alias("us"),
        micro(F.col("value")).alias("v_micro"),
    ).withColumn(
        "new_s",
        (F.lag("us").over(w).isNull()
         | ((F.col("us") - F.lag("us").over(w)) >= gap_us)).cast("int"),
    ).withColumn(
        "session_idx",
        F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return flagged.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
        F.sum("v_micro").alias("sum_value_micro"),
    )


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-props extraction (the reference's JSON round-trip,
    ConvertPdfJsonController): parse props JSON, aggregate by key."""
    ev = read_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select(k.alias("k"), "value")
        .groupBy("k").agg(F.count("*").alias("n"),
                          F.sum(micro(F.col("value"))).alias("sum_value_micro"))
    )


def events_funnel(events: DataFrame,
                  steps: tuple[str, ...] = ("view", "click", "purchase"),
                  ) -> DataFrame:
    """Ordered funnel analysis (the classic product-analytics op):
    per user, step k counts only if an event of its type occurs
    STRICTLY AFTER the user's step-(k-1) time; step times are the
    earliest qualifying events. One filtered aggregate + join per
    step — each stage shuffles on user_id only, and every stage after
    the first joins against a funnel-survivor table that only
    shrinks.

    Output: (user_id, reached) with reached in 0..len(steps).
    """
    users = events.select("user_id").distinct()
    prev = None  # (user_id, t) of the previous step
    reached_flags = []
    for k, step in enumerate(steps):
        ev = events.filter(F.col("event_type") == step)
        if prev is None:
            cur = ev.groupBy("user_id").agg(F.min("ts").alias("t"))
        else:
            cur = (
                ev.join(prev.withColumnRenamed("t", "pt"), "user_id")
                .filter(F.col("ts") > F.col("pt"))
                .groupBy("user_id").agg(F.min("ts").alias("t"))
            )
        reached_flags.append(
            cur.select("user_id", F.lit(1).alias(f"s{k}")))
        prev = cur
    out = users
    for k, fl in enumerate(reached_flags):
        out = out.join(fl, "user_id", "left")
    total = None
    for k in range(len(steps)):
        c = F.coalesce(F.col(f"s{k}"), F.lit(0))
        total = c if total is None else total + c
    return out.select("user_id", total.cast("long").alias("reached"))


def events_cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention (the other classic analytics table):
    users cohort by the epoch-week of their FIRST event; each
    (cohort_week, week_offset) cell counts the distinct cohort members
    active that week. Two user-keyed aggregates + one distinct —
    nothing scales beyond (users x active weeks).

    Output: (cohort_week, week_offset, n_users).
    """
    # ts is TIMESTAMP_NTZ: route through timestamp (session is pinned
    # UTC) to get epoch seconds — matches DuckDB's epoch() on naive ts
    wk = F.floor(
        F.col("ts").cast("timestamp").cast("long") / 604800).cast("long")
    activity = events.select("user_id", wk.alias("wk")).distinct()
    first = activity.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    return (
        activity.join(first, "user_id")
        .groupBy("cohort_week",
                 (F.col("wk") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
    )


def events_dau_mau(events: DataFrame, window_days: int = 28) -> DataFrame:
    """DAU / rolling-MAU activity table (the product-analytics
    companion to events_cohort_retention): day = epoch-day of the
    event, DAU(d) = distinct users active on d, MAU(d) = distinct
    users active in [d - window_days + 1, d], stickiness =
    DAU*1000 div MAU (per-mille, exact integer).

    Scale shape: one distinct over (user_id, day) — the only shuffle
    that sees the raw feed — then each activity row explodes into the
    <= window_days report days it contributes to (a bounded, narrow
    28x expansion, NOT a range join against the fact table) and one
    groupBy day. Report days are restricted to days with activity via
    a broadcast semi-join on the tiny day dimension.

    Output: (day, dau, mau, stickiness_pm).
    """
    day = F.floor(
        F.col("ts").cast("timestamp").cast("long") / 86400).cast("long")
    activity = events.select("user_id", day.alias("day")).distinct()
    days = activity.select("day").distinct()
    contrib = activity.select(
        "user_id",
        F.explode(F.sequence(
            F.col("day"), F.col("day") + F.lit(window_days - 1))).alias("d"),
    ).join(F.broadcast(days).withColumnRenamed("day", "d"), "d", "semi")
    mau = contrib.groupBy("d").agg(
        F.count_distinct("user_id").cast("long").alias("mau"))
    dau = activity.groupBy("day").agg(
        F.count_distinct("user_id").cast("long").alias("dau"))
    return (
        dau.join(mau.withColumnRenamed("d", "day"), "day")
        .select("day", "dau", "mau",
                F.expr("dau * 1000 div mau").cast("long")
                .alias("stickiness_pm"))
    )


def events_asof(events: DataFrame, left_type: str = "purchase",
                right_type: str = "view") -> DataFrame:
    """Point-in-time (as-of) join — the time-series operator Spark has
    no built-in for: each ``left_type`` event is paired with the
    LATEST ``right_type`` event of the same user at or before its
    timestamp (the classic trades-asof-quotes shape).

    Implemented the distributed-merge way, NOT as a range join: both
    sides union into one stream tagged by side, a single window per
    user_id ordered by (time, side, event_id) — right-side rows sort
    before a left-side row at the same instant, so 'at or before'
    includes ties — and a running max over the right side's times
    carries the as-of match forward. One user-keyed shuffle total; no
    per-row Python, no range-join blowup on dense histories.

    Output: (event_id, user_id, us, right_us, gap_us) epoch-micros;
    right_us/gap_us NULL when no prior match exists. Ties among
    right-side events at the same instant collapse to the instant
    itself (the output carries the matched TIME, which is unique).
    """
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    tagged = (
        events.filter(F.col("event_type").isin(left_type, right_type))
        .select(
            "event_id", "user_id", us.alias("us"),
            (F.col("event_type") == left_type).cast("int").alias("side"),
        )
    )
    w = (Window.partitionBy("user_id").orderBy("us", "side", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = tagged.withColumn(
        "right_us",
        F.max(F.when(F.col("side") == 0, F.col("us"))).over(w))
    return (
        matched.filter(F.col("side") == 1)
        .select("event_id", "user_id", "us", "right_us",
                (F.col("us") - F.col("right_us")).alias("gap_us"))
    )


def events_range_join(events: DataFrame, n_windows: int = 24,
                      width_min: int = 90, stride_min: int = 420,
                      ) -> DataFrame:
    """Interval containment join, the scalable way: events land in
    maintenance windows [start, start + width) derived from the
    feed's own first timestamp (windows every ``stride_min`` minutes).
    Instead of a naive theta-join (a cartesian at cluster scale), each
    window explodes into the HOUR BINS it covers and events equi-join
    on their hour bin, with the exact containment as a residual
    filter — the classic bin + equi-join + residual range-join plan:
    the shuffle is hash(bin), never all-pairs.

    The window dimension is tiny and broadcast; the anchor (min ts) is
    the one bounded driver-side aggregate, same sanction as the IVF
    sample. Output: (window_idx, start_us, n_events, sum_value_micro).
    Empty windows are kept with zero counts (left join) so the result
    shape is stable.
    """
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    ev = events.select(us.alias("us"), micro(F.col("value")).alias("vm"))
    # bounded collect: ONE scalar anchoring the window grid
    t0 = ev.agg(F.min("us")).collect()[0][0] or 0
    width_us = width_min * 60 * 1_000_000
    stride_us = stride_min * 60 * 1_000_000
    hour_us = 3_600_000_000
    spark = events.sparkSession
    win = spark.range(n_windows).select(
        F.col("id").cast("long").alias("window_idx"),
        (F.lit(t0) + F.col("id") * stride_us).alias("start_us"),
    ).withColumn("end_us", F.col("start_us") + width_us)
    bins = win.select(
        "window_idx", "start_us", "end_us",
        F.explode(F.sequence(
            F.floor(F.col("start_us") / hour_us),
            F.floor((F.col("end_us") - 1) / hour_us))).alias("bin"),
    )
    hits = (
        ev.withColumn("bin", F.floor(F.col("us") / hour_us))
        .join(F.broadcast(bins), "bin")
        .filter((F.col("us") >= F.col("start_us"))
                & (F.col("us") < F.col("end_us")))
        .groupBy("window_idx").agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("vm").alias("sum_value_micro"))
    )
    return (
        win.select("window_idx", "start_us").join(hits, "window_idx", "left")
        .select("window_idx", "start_us",
                F.coalesce("n_events", F.lit(0)).cast("long")
                .alias("n_events"),
                F.coalesce("sum_value_micro", F.lit(0)).cast("long")
                .alias("sum_value_micro"))
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot_daily(events: DataFrame) -> DataFrame:
    """Day x event-type pivot (the classic wide analytics table):
    one groupBy(day).pivot(event_type) count with the type list given
    EXPLICITLY — an open pivot needs a distinct-scan job first and
    makes the output schema data-dependent, which a 100 TB pipeline
    can't have. One shuffle on day; counts are map-side partial.

    Output: (day, n_click, n_error, n_purchase, n_signup, n_view).
    """
    day = F.floor(
        F.col("ts").cast("timestamp").cast("long") / 86400).cast("long")
    wide = (
        events.select(day.alias("day"), "event_type")
        .groupBy("day").pivot("event_type", list(EVENT_TYPES)).count()
    )
    return wide.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).cast("long")
                 .alias(f"n_{t}") for t in EVENT_TYPES])


def events_rolling_value(events: DataFrame,
                         trailing_days: int = 7) -> DataFrame:
    """Per-user trailing-7-day spend via a RANGE window frame — the
    time-based rolling aggregate (rows-frames are wrong under gaps:
    the frame must span VALUE distance on the day axis, not row
    count). One user-keyed day aggregate, then a range frame over the
    per-day rows — frame width is bounded by active days, never by
    event volume.

    Output: (user_id, day, day_value_micro, rolling_value_micro).
    """
    day = F.floor(
        F.col("ts").cast("timestamp").cast("long") / 86400).cast("long")
    daily = (
        events.select("user_id", day.alias("day"),
                      micro(F.col("value")).alias("vm"))
        .groupBy("user_id", "day").agg(
            F.sum("vm").alias("day_value_micro"))
    )
    w = (Window.partitionBy("user_id").orderBy("day")
         .rangeBetween(-(trailing_days - 1), 0))
    return daily.select(
        "user_id", "day", "day_value_micro",
        F.sum("day_value_micro").over(w).alias("rolling_value_micro"))


def skew_report(df: DataFrame, key_col: str, k: int = 10) -> DataFrame:
    """Join-key skew diagnostic — the audit a 100-TB pipeline runs
    BEFORE keying a shuffle on a column (the repo's salted extraction
    and AQE notes assume you know which keys are hot; this measures
    it): per-key row counts, the top-k hottest keys with their ppm
    share, and the global row/key totals denormalized onto each row
    so one artifact answers 'is this key safe to shuffle on'.

    Scale shape: one partial-agg'd groupBy onto the key universe,
    a one-row totals broadcast, a bounded top-k window. Output:
    (rank, key, cnt, share_ppm, n_rows, n_keys)."""
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")) \
        .agg(F.count("*").cast("long").alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_keys"),
    )
    rk = Window.orderBy(F.desc("cnt"), F.asc("key"))
    return (
        counts.withColumn("rank", F.row_number().over(rk).cast("long"))
        .filter(F.col("rank") <= k)
        .crossJoin(F.broadcast(totals))
        .select(
            "rank", "key", "cnt",
            F.expr("cnt * 1000000 div greatest(1L, n_rows)")
            .cast("long").alias("share_ppm"),
            "n_rows", "n_keys",
        )
    )


def length_percentiles(df: DataFrame, percentiles=(50, 90, 99),
                       text_col: str = "text") -> DataFrame:
    """Exact doc-length percentiles (the data-card distribution stat)
    without a global sort: byte lengths collapse to a distinct-length
    count table (bounded by the LENGTH universe, not the corpus), a
    cumulative window runs over that small table, and percentile p is
    the smallest length whose cumulative count reaches
    ceil(p * N / 100) — the classic counting-sort quantile, exact at
    any scale where the value universe is bounded.

    Output: (pct, target_rank, value)."""
    counts = df.select(
        F.octet_length(F.col(text_col)).cast("long").alias("len")
    ).groupBy("len").agg(F.count("*").cast("long").alias("cnt"))
    n = int(counts.agg(F.sum("cnt")).collect()[0][0] or 0)
    w = Window.orderBy("len") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = counts.select(
        "len", F.sum("cnt").over(w).cast("long").alias("cum"))
    out = None
    for p in percentiles:
        target = (p * n + 99) // 100
        row = cum.filter(F.col("cum") >= target).agg(
            F.lit(int(p)).cast("long").alias("pct"),
            F.lit(target).cast("long").alias("target_rank"),
            F.min("len").cast("long").alias("value"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def events_hourly_anomaly(df: DataFrame, factor_x10: int = 20,
                          min_trail: int = 12,
                          window_hours: int = 24) -> DataFrame:
    """Traffic-anomaly flags over the event stream — the pipeline
    health monitor every ingestion system runs (a crawler bug or bot
    flood shows up as an hourly count spiking vs its own trailing
    baseline): per event_type, hour h is anomalous when its count
    exceeds factor_x10/10 times the trailing ``window_hours``-row
    mean, decided by the integer cross-multiplication
        10 * cnt * trail_n > factor_x10 * trail_sum
    after at least ``min_trail`` prior hours exist (cold-start hours
    are never flagged).

    Scale shape: one (event_type, hour) partial-agg'd groupBy — the
    hourly table is tiny after it — then a per-type ROWS window over
    that table; never a window over raw events.

    Output: (event_type, hour_epoch, cnt, trail_n, trail_sum,
    anomaly)."""
    from pyspark.sql import Window

    hourly = (df.groupBy(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(F.count("*").cast("long").alias("cnt")))
    w = (Window.partitionBy("event_type").orderBy("hour")
         .rowsBetween(-window_hours, -1))
    trail_n = F.count("cnt").over(w).cast("long")
    trail_sum = F.sum("cnt").over(w).cast("long")
    out = (hourly.withColumn("trail_n", trail_n)
           .withColumn("trail_sum", F.coalesce(trail_sum, F.lit(0))))
    anomaly = ((F.col("trail_n") >= min_trail)
               & (10 * F.col("cnt") * F.col("trail_n")
                  > factor_x10 * F.col("trail_sum")))
    return out.select(
        "event_type",
        F.unix_timestamp("hour").cast("long").alias("hour_epoch"),
        "cnt", "trail_n", "trail_sum",
        anomaly.cast("int").cast("long").alias("anomaly"))


def events_rollup(df: DataFrame) -> DataFrame:
    """Hierarchical ROLLUP aggregation — the multi-level OLAP
    summary (type x hour-of-day -> type -> grand total) computed in
    ONE pass instead of three separate groupBys (Spark's rollup()
    partial-aggregates every level in the same shuffle, the classic
    data-cube trick). Null grouping slots are coalesced to sentinels
    ('(all)' / -1) and the level id is derived EXPLICITLY from which
    dims are present, so the output is engine-portable without
    relying on grouping_id() bit conventions.

    Output: (event_type, hod, lvl, n_events, sum_value_micro) with
    lvl 0 = leaf, 1 = per-type subtotal, 2 = grand total."""
    hod = F.hour("ts").cast("long")
    rolled = (df.select(F.col("event_type"), hod.alias("hod"),
                        micro(F.col("value")).alias("v"))
              .rollup("event_type", "hod")
              .agg(F.count("*").cast("long").alias("n_events"),
                   F.sum("v").cast("long").alias("sum_value_micro")))
    lvl = (F.when(F.col("event_type").isNull(), F.lit(2))
           .when(F.col("hod").isNull(), F.lit(1))
           .otherwise(F.lit(0)))
    return rolled.select(
        F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
        F.coalesce("hod", F.lit(-1)).cast("long").alias("hod"),
        lvl.cast("long").alias("lvl"),
        "n_events", "sum_value_micro")
