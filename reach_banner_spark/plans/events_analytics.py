"""Product-analytics operators over the ``events`` table.

The reference engine's query surface is exercised by its users as an
analytics engine over event streams (SURVEY.md §2.2 windows/sessionization
— `win_session_batch` / `stream_session` are already on the surface); this
module adds the three canonical event-analytics shapes every such engine
ships: ordered funnel conversion, cohort retention, and the event-type
transition graph (the Markov edge list — the same edge-list shape the KG
consumption keys analyze, derived from behavioral sequences instead of
extracted triples).

Conventions follow plans/relational.py: every computed column aliased
identically on both engines, formatted ``%.6f`` ratios are ROUND(x, 6)
BEFORE formatting on BOTH engines (decimal ties round half-away-from-zero
identically — see the 39f2a8e tie fix), empty-corpus aggregates coalesce
to zero, and everything runs pure JVM-side (whole-stage codegen, no
Python in any plan).

Scale notes (100 TB discipline): every key here shuffles user_id-first,
so the event fact table partitions by its natural key and the windows /
self-joins reuse one co-partitioning; the final rollups are
dimension-sized (steps × 1, cohorts × weeks, event-type²).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Above this row count events_rfm switches its quartile step from exact
# unpartitioned NTILE windows to broadcast approx_percentile cutoffs
# (r5-VERDICT #2): the user-grain single-partition sort is the one
# window in this module whose size grows with users instead of a
# bounded domain. Test SFs sit far below the gate, so the oracle pins
# the exact path; the forced-path pytest exercises the approx branch.
RFM_EXACT_CUTOFF = int(os.environ.get("RBS_RFM_EXACT_CUTOFF", "5000000"))

QueryFn = Callable[[SparkSession, str], DataFrame]
REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(key: str, sql: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[key] = (fn, sql)
        return fn

    return deco


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..caching import cached_scan

    return cached_scan(spark, f"{sf_dir}/events.parquet")


_FMT6 = lambda c: F.format_string("%.6f", F.round(c, 6))  # noqa: E731


# ------------------------------------------------------------- funnel ----

def first_touch_cols():
    """The per-user first-touch aggregate columns (built LAZILY — a
    module-level Column constant would break session-free import, same
    rule as textstats.quality_gates). Each is a plain MIN, so the state
    is exactly mergeable across micro-batches: min(merge) == min(all) —
    the property ``stream_funnel`` relies on."""
    return [
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t1"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t2"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t3"),
    ]


def funnel_rollup(u: DataFrame) -> DataFrame:
    """Fold a per-user first-touch table (t1, t2, t3) into the 3-row
    funnel — shared by the batch key and its streaming twin so the step
    semantics live ONCE."""
    # NULL-comparison semantics match the oracle's CASE: NULL > x is
    # NULL -> otherwise(0)
    flags = u.select(
        F.when(F.col("t1").isNotNull(), 1).otherwise(0).alias("r1"),
        F.when(F.col("t2") > F.col("t1"), 1).otherwise(0).alias("r2"),
        F.when(
            (F.col("t2") > F.col("t1")) & (F.col("t3") > F.col("t2")), 1
        ).otherwise(0).alias("r3"),
    )
    tot = flags.agg(
        F.coalesce(F.sum("r1"), F.lit(0)).cast("long").alias("s1"),
        F.coalesce(F.sum("r2"), F.lit(0)).cast("long").alias("s2"),
        F.coalesce(F.sum("r3"), F.lit(0)).cast("long").alias("s3"),
    )
    return tot.select(
        F.expr(
            "stack(3, CAST(1 AS BIGINT), 'view', s1,"
            " CAST(2 AS BIGINT), 'click', s2,"
            " CAST(3 AS BIGINT), 'purchase', s3) AS (step_idx, step, users)"
        )
    )


@register(
    "funnel_conversion",
    # First-touch ordered funnel view -> click -> purchase: a user reaches
    # step k when the FIRST occurrence of step k's event is strictly after
    # the first occurrence of step k-1's (Amplitude-style "first touch"
    # ordering — computable in ONE pass; NULL first-touch comparisons are
    # false on both engines).
    "WITH u AS ("
    " SELECT user_id,"
    "  MIN(CASE WHEN event_type = 'view' THEN ts END) AS t1,"
    "  MIN(CASE WHEN event_type = 'click' THEN ts END) AS t2,"
    "  MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t3"
    " FROM events GROUP BY user_id), "
    "f AS ("
    " SELECT CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS r1,"
    "  CASE WHEN t2 > t1 THEN 1 ELSE 0 END AS r2,"
    "  CASE WHEN t2 > t1 AND t3 > t2 THEN 1 ELSE 0 END AS r3 FROM u) "
    "SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step,"
    " CAST(COALESCE(SUM(r1), 0) AS BIGINT) AS users FROM f "
    "UNION ALL SELECT 2, 'click', CAST(COALESCE(SUM(r2), 0) AS BIGINT) FROM f "
    "UNION ALL SELECT 3, 'purchase', CAST(COALESCE(SUM(r3), 0) AS BIGINT) FROM f",
)
def funnel_conversion(spark, sf):
    """First-touch ordered funnel over the event stream: how many users
    viewed, then first-clicked after their first view, then
    first-purchased after that click.

    Scale shape: ONE shuffle (the per-user conditional-min aggregate, with
    map-side partial aggregation — state per user is three timestamps),
    then a single-row global sum and a constant 3-row ``stack``. No joins,
    no windows; the plan is two exchanges regardless of event volume."""
    e = _events(spark, sf)
    return funnel_rollup(e.groupBy("user_id").agg(*first_touch_cols()))


_W1_US = 24 * 3600 * 1_000_000  # view -> click conversion window
_W2_US = 72 * 3600 * 1_000_000  # click -> purchase conversion window


@register(
    "events_funnel_window",
    # TIME-BOUNDED funnel (the Amplitude/GA "conversion window"): step 2
    # counts the first click STRICTLY AFTER the first view and within
    # 24 h of it; step 3 the first purchase after that click and within
    # 72 h. All comparisons in exact integer microseconds; NULL window
    # anchors propagate NULL (the CASE guards are identical on both
    # engines).
    "WITH e AS (SELECT user_id, event_type, "
    " CAST(epoch_us(ts) AS BIGINT) AS us FROM events), "
    "w1 AS (SELECT *, MIN(CASE WHEN event_type = 'view' THEN us END) "
    " OVER (PARTITION BY user_id) AS t1 FROM e), "
    "w2 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND us > t1 "
    f" AND us <= t1 + {_W1_US} THEN us END) "
    " OVER (PARTITION BY user_id) AS t2 FROM w1), "
    "w3 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND us > t2 "
    f" AND us <= t2 + {_W2_US} THEN us END) "
    " OVER (PARTITION BY user_id) AS t3 FROM w2), "
    "u AS (SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3 "
    " FROM w3 GROUP BY user_id) "
    "SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step, "
    " CAST(COALESCE(SUM(CASE WHEN t1 IS NOT NULL THEN 1 END), 0) AS BIGINT)"
    "  AS users FROM u "
    "UNION ALL SELECT 2, 'click_24h', "
    " CAST(COALESCE(SUM(CASE WHEN t2 IS NOT NULL THEN 1 END), 0) AS BIGINT)"
    " FROM u "
    "UNION ALL SELECT 3, 'purchase_72h', "
    " CAST(COALESCE(SUM(CASE WHEN t3 IS NOT NULL THEN 1 END), 0) AS BIGINT)"
    " FROM u",
)
def events_funnel_window(spark, sf):
    """Time-bounded ordered funnel: view → first click within 24 h of
    the first view → first purchase within 72 h of that click. Unlike
    ``funnel_conversion`` (pure first-touch ordering), each step's
    anchor is the first qualifying event AFTER the previous step's
    anchor and inside its conversion window — the semantics product
    analytics tools actually ship.

    Scale shape: THREE chained whole-partition window mins over ONE
    user_id exchange (each window conditions on the previous one's
    value, so they cannot fuse into a single aggregate, but they all
    reuse the same partitioning — the per-user rollup and the chained
    windows add no further fact-scale exchange); the final funnel is a
    single-row sum + constant 3-row stack."""
    w = Window.partitionBy("user_id")
    e = _events(spark, sf).select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    t1 = F.min(
        F.when(F.col("event_type") == "view", F.col("us"))
    ).over(w)
    e = e.withColumn("t1", t1)
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click")
            & (F.col("us") > F.col("t1"))
            & (F.col("us") <= F.col("t1") + F.lit(_W1_US)),
            F.col("us"),
        )
    ).over(w)
    e = e.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("us") > F.col("t2"))
            & (F.col("us") <= F.col("t2") + F.lit(_W2_US)),
            F.col("us"),
        )
    ).over(w)
    u = (
        e.withColumn("t3", t3)
        .groupBy("user_id")
        .agg(
            F.max("t1").alias("t1"),
            F.max("t2").alias("t2"),
            F.max("t3").alias("t3"),
        )
    )
    tot = u.agg(
        F.coalesce(
            F.sum(F.when(F.col("t1").isNotNull(), 1)), F.lit(0)
        ).cast("long").alias("s1"),
        F.coalesce(
            F.sum(F.when(F.col("t2").isNotNull(), 1)), F.lit(0)
        ).cast("long").alias("s2"),
        F.coalesce(
            F.sum(F.when(F.col("t3").isNotNull(), 1)), F.lit(0)
        ).cast("long").alias("s3"),
    )
    return tot.select(
        F.expr(
            "stack(3, CAST(1 AS BIGINT), 'view', s1,"
            " CAST(2 AS BIGINT), 'click_24h', s2,"
            " CAST(3 AS BIGINT), 'purchase_72h', s3)"
            " AS (step_idx, step, users)"
        )
    )


# ---------------------------------------------------------- retention ----

@register(
    "retention_cohort",
    # Classic D0-cohort weekly retention: cohort = a user's first active
    # date; a user counts as retained in week k of their cohort when they
    # have any event in [d0 + 7k, d0 + 7(k+1)).
    "WITH first AS ("
    " SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id), "
    "act AS ("
    " SELECT DISTINCT e.user_id, f.d0,"
    "  CAST(FLOOR(DATEDIFF('day', f.d0, CAST(e.ts AS DATE)) / 7) AS BIGINT) AS week_k"
    " FROM events e JOIN first f ON e.user_id = f.user_id) "
    "SELECT CAST(d0 AS VARCHAR) AS cohort_date, week_k,"
    " CAST(COUNT(*) AS BIGINT) AS n_active "
    "FROM act GROUP BY d0, week_k",
)
def retention_cohort(spark, sf):
    """Weekly cohort retention: users bucketed by first-active date, one
    row per (cohort_date, week offset) with the retained-user count.

    Scale shape: the cohort derivation and the activity join BOTH key on
    user_id, so one hash partitioning serves the aggregate, the join, and
    the per-user DISTINCT (AQE will broadcast the cohort side at small SF;
    at 100 TB both sides co-partition and no second fact shuffle occurs).
    The final rollup is cohorts × weeks — dimension-sized."""
    e = _events(spark, sf)
    first = e.groupBy("user_id").agg(F.min(F.col("ts").cast("date")).alias("d0"))
    return retention_rollup(cohort_activity(e, first))


def cohort_activity(e: DataFrame, first: DataFrame) -> DataFrame:
    """Distinct (user_id, d0, week_k) activity rows for a batch of events
    against a per-user cohort table — the fact-scale half of
    ``retention_cohort``, shared with the streaming twin (which calls it
    per micro-batch against the carried cohort state; rows are
    idempotent under re-derivation, so union-distinct across batches ==
    one-shot distinct)."""
    return (
        e.join(first, "user_id")
        .select(
            "user_id",
            "d0",
            F.floor(
                F.datediff(F.col("ts").cast("date"), F.col("d0")) / 7
            ).cast("long").alias("week_k"),
        )
        .distinct()
    )


def retention_rollup(act: DataFrame) -> DataFrame:
    """(cohort_date, week_k, n_active) rollup of a distinct activity
    table — cohorts × weeks sized; shared between the batch key and the
    streaming twin."""
    return act.groupBy("d0", "week_k").agg(
        F.count(F.lit(1)).alias("n_active")
    ).select(
        F.date_format("d0", "yyyy-MM-dd").alias("cohort_date"),
        "week_k",
        "n_active",
    )


# -------------------------------------------------------- transitions ----

@register(
    "event_transitions",
    # Per-user consecutive event-type bigrams (the behavioral Markov edge
    # list) with per-source transition probabilities as %.6f strings
    # (ratio of exact BIGINT counts; ROUND before format per house rule).
    "WITH s AS ("
    " SELECT user_id, event_type AS src, LEAD(event_type) OVER ("
    "  PARTITION BY user_id ORDER BY ts, event_id) AS dst FROM events), "
    "c AS ("
    " SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n FROM s"
    " WHERE dst IS NOT NULL GROUP BY src, dst) "
    "SELECT src, dst, n, printf('%.6f', ROUND("
    " CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY src), 6)) AS p "
    "FROM c",
)
def event_transitions(spark, sf):
    """Event-type transition graph: counts and per-source probabilities of
    consecutive event-type pairs within each user's timeline (ties broken
    by event_id — deterministic ordering, per house rule).

    Scale shape: one window shuffle on user_id (sequence derivation), one
    aggregation shuffle on the (src, dst) pair, then a window over the
    event-type²-sized count table (dimension-sized — the probability
    normalization never touches the fact table). The probability is a
    ratio of exact integer counts, so both engines compute the identical
    IEEE double before the shared ROUND/format contract."""
    e = _events(spark, sf)
    return transition_rollup(transition_pairs(e))


def transition_pairs(e: DataFrame) -> DataFrame:
    """Per-user consecutive event-type bigram counts (src, dst, n) — the
    fact-scale half of ``event_transitions``, shared with the streaming
    twin (which runs it per micro-batch over carried-boundary ∪ batch).
    One user_id window shuffle + one pair-keyed aggregation."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).where(F.col("dst").isNotNull())
    return s.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))


def transition_rollup(c: DataFrame) -> DataFrame:
    """Normalize a (src, dst, n) count table into per-source transition
    probabilities — dimension-sized (event-type²), shared between the
    batch key and the streaming twin so the %.6f contract lives ONCE."""
    wn = Window.partitionBy("src")
    return c.select(
        "src",
        "dst",
        "n",
        _FMT6(F.col("n").cast("double") / F.sum("n").over(wn)).alias("p"),
    )


# ---------------------------------------------------------- anomaly ----

@register(
    "events_anomaly",
    # z-scores composed ONLY from exact-integer aggregates and a fixed
    # IEEE op sequence: numerator cnt*n - sx is an exact BIGINT; variance
    # is ONE division of exact integers; then sqrt -> multiply -> divide,
    # spelled identically on both engines, so every intermediate double
    # is bit-identical and ROUND(z, 6) can't diverge.
    "WITH d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, "
    " CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2), "
    "s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
    " CAST(SUM(cnt) AS BIGINT) AS sx, CAST(SUM(cnt * cnt) AS BIGINT) AS sxx "
    " FROM d GROUP BY event_type) "
    "SELECT d.event_type, d.day, d.cnt, "
    "printf('%.6f', ROUND(CAST(d.cnt * s.n - s.sx AS DOUBLE) / "
    " (CAST(s.n AS DOUBLE) * SQRT(CAST(s.sxx * s.n - s.sx * s.sx AS DOUBLE)"
    "  / CAST(s.n * s.n AS DOUBLE))), 6)) AS z, "
    "ABS(ROUND(CAST(d.cnt * s.n - s.sx AS DOUBLE) / "
    " (CAST(s.n AS DOUBLE) * SQRT(CAST(s.sxx * s.n - s.sx * s.sx AS DOUBLE)"
    "  / CAST(s.n * s.n AS DOUBLE))), 6)) >= 2.0 AS is_anomaly "
    "FROM d JOIN s ON s.event_type = d.event_type "
    "WHERE s.sxx * s.n > s.sx * s.sx",
)
def events_anomaly(spark, sf):
    """Daily-volume anomaly detection per event type — the ops-monitoring
    query an analytics engine runs over its own event stream: each
    (event_type, day) gets the z-score of its daily count against the
    type's own daily distribution, with |z| >= 2 flagged. All statistics
    are exact integers (count, sum, sum-of-squares) so the z-score is a
    FIXED sequence of IEEE ops (one exact-integer numerator, one variance
    division, sqrt, multiply, divide) that both engines execute
    identically — the float rule's composed-op variant. Zero-variance
    types are excluded (z undefined), exact-integer comparison.

    Scale shape: one (event_type, day)-keyed partial+final aggregation
    over the fact table (map-side combine does the heavy lifting), then
    a type-level rollup of the TINY daily table and a broadcast join
    back — the anomaly test itself never reshuffles facts."""
    return anomaly_rollup(daily_counts(_events(spark, sf)))


def daily_counts(e: DataFrame) -> DataFrame:
    """(event_type, day, cnt) daily volume table — the fact-scale half of
    ``events_anomaly``, shared with the streaming twin: counts are
    exactly mergeable (sum over batches == count over all events), so
    the twin merges per-batch daily counts into carried state and runs
    the SAME rollup at the end."""
    return e.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def anomaly_rollup(d: DataFrame) -> DataFrame:
    """z-score + flag rollup over a (event_type, day, cnt) table — the
    dimension-sized half of ``events_anomaly`` (see that key's docstring
    for the exact-integer / fixed-IEEE-sequence float contract), shared
    with the streaming twin."""
    s = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cnt").alias("sx"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("sxx"),
    )
    num = (F.col("cnt") * F.col("n") - F.col("sx")).cast("double")
    var = (
        (F.col("sxx") * F.col("n") - F.col("sx") * F.col("sx")).cast("double")
        / (F.col("n") * F.col("n")).cast("double")
    )
    z = F.round(num / (F.col("n").cast("double") * F.sqrt(var)), 6)
    return (
        d.join(F.broadcast(s), "event_type")
        .filter(
            F.col("sxx") * F.col("n") > F.col("sx") * F.col("sx")
        )
        .select(
            "event_type",
            "day",
            "cnt",
            F.format_string("%.6f", z).alias("z"),
            (F.abs(z) >= 2.0).alias("is_anomaly"),
        )
    )


# -------------------------------------------------------- attribution ----

def last_touch_cols():
    """The per-conversion last-touch window columns (lazy, same rule as
    first_touch_cols): for every event row, the most recent STRICTLY
    PRECEDING view/click in the user's totally-ordered timeline
    (ts, event_id tie-break), carried as last_value IGNORE NULLS over
    ROWS UNBOUNDED PRECEDING .. 1 PRECEDING. Shared with the streaming
    twin, where the carried per-user state is exactly this column's
    prefix — a max-by that merges across any batch split."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin("view", "click")
    return [
        F.last(F.when(is_touch, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("touch_id"),
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type_raw"),
        F.last(F.when(is_touch, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("touch_ts"),
    ]


@register(
    "events_attribution",
    # Last-touch conversion attribution: each purchase is credited to the
    # most recent preceding view/click by the same user (strict precedence
    # under the total (ts, event_id) order; purchases with no prior touch
    # are 'none'). The touch->conversion gap is an exact integer
    # microsecond difference — the win_session_batch precision rule.
    "WITH a AS (SELECT user_id, event_id, event_type, ts, "
    " last_value(CASE WHEN event_type IN ('view','click') THEN event_id END"
    "  IGNORE NULLS) OVER w AS touch_id, "
    " last_value(CASE WHEN event_type IN ('view','click') THEN event_type END"
    "  IGNORE NULLS) OVER w AS touch_type_raw, "
    " last_value(CASE WHEN event_type IN ('view','click') THEN ts END"
    "  IGNORE NULLS) OVER w AS touch_ts "
    "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
    " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) "
    "SELECT user_id, event_id AS conv_id, "
    "COALESCE(touch_type_raw, 'none') AS touch_type, touch_id, "
    "CAST(epoch_us(ts) - epoch_us(touch_ts) AS BIGINT) AS gap_us "
    "FROM a WHERE event_type = 'purchase'",
)
def events_attribution(spark, sf):
    """Last-touch attribution — the marketing-analytics join every event
    engine ships: conversions (purchases) credited to the user's most
    recent preceding touch (view/click), with the touch->conversion gap
    in exact integer microseconds.

    Scale shape: ONE user_id-keyed window exchange (the same
    co-partitioning every key in this module rides); no join — the
    'as-of' lookup is the ignore-nulls running last_value, which beats a
    range self-join at any scale because each event is touched once."""
    e = _events(spark, sf)
    a = e.select("user_id", "event_id", "event_type", "ts", *last_touch_cols())
    return a.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("conv_id"),
        F.coalesce(F.col("touch_type_raw"), F.lit("none")).alias("touch_type"),
        "touch_id",
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("touch_ts").cast("timestamp"))
        )
        .cast("long")
        .alias("gap_us"),
    )


@register(
    "events_rolling_dau",
    # Rolling 7-day active users per calendar day. COUNT(DISTINCT) has no
    # window form in either engine, so the rolling distinct is spelled as
    # a bounded range join: anchor days (calendar-sized) x the deduped
    # (day, user) table restricted to the trailing week.
    "WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id "
    "FROM events), "
    "anchors AS (SELECT DISTINCT day FROM du) "
    "SELECT CAST(a.day AS VARCHAR) AS day, "
    "CAST(COUNT(DISTINCT CASE WHEN d.day = a.day THEN d.user_id END) "
    " AS BIGINT) AS dau, "
    "CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS wau7 "
    "FROM anchors a JOIN du d "
    "ON d.day BETWEEN a.day - 6 AND a.day "
    "GROUP BY a.day",
)
def events_rolling_dau(spark, sf):
    """Rolling engagement: per calendar day, same-day actives (DAU) and
    trailing-7-day actives (WAU) — the dashboard pair every event
    pipeline publishes. Distinct-over-a-sliding-window cannot ride a
    window frame (no windowed COUNT DISTINCT), so the scalable spelling
    is: dedup events to the (day, user) grain FIRST (the corpus-scale
    pass, one user-keyed exchange that collapses the fact table to
    calendar_days x users rows), THEN broadcast the calendar-sized
    anchor-day list for the trailing-week range join. Join fan-out is
    bounded by 7 x |day-user pairs| regardless of event volume; the raw
    fact table is touched exactly once. Day emitted as a formatted
    string (date rule)."""
    e = _events(spark, sf)
    du = e.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    return rolling_dau_rollup(du)


def rolling_dau_rollup(du: DataFrame) -> DataFrame:
    """Trailing-week rollup over the deduped (day, user) table — shared
    between the batch key and ``stream_dau`` (one definition of the
    anchor range join and both distinct counts)."""
    anchors = du.select("day").distinct()
    j = F.broadcast(anchors.withColumnRenamed("day", "aday")).join(
        du,
        (F.col("day") >= F.date_sub(F.col("aday"), 6))
        & (F.col("day") <= F.col("aday")),
    )
    return j.groupBy("aday").agg(
        F.countDistinct(
            F.when(F.col("day") == F.col("aday"), F.col("user_id"))
        ).alias("dau"),
        F.countDistinct("user_id").alias("wau7"),
    ).select(
        F.date_format("aday", "yyyy-MM-dd").alias("day"), "dau", "wau7"
    )


# the SCD2 interval build as a reusable SQL fragment: scd2_intervals' own
# oracle, and the dimension-history side of join_temporal's oracle
_SCD2_SQL = (
    "WITH o AS (SELECT user_id, event_type, ts, event_id, "
    "LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
    "AS prev_type FROM events), "
    "ch AS (SELECT user_id, event_type, ts, event_id FROM o "
    "WHERE prev_type IS NULL OR event_type <> prev_type) "
    "SELECT user_id, event_type AS state, "
    "CAST(epoch_us(ts) AS BIGINT) AS valid_from_us, "
    "CAST(epoch_us(LEAD(ts) OVER (PARTITION BY user_id "
    "ORDER BY ts, event_id)) AS BIGINT) AS valid_to_us, "
    "LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL "
    "AS is_current FROM ch"
)


@register(
    "scd2_intervals",
    # Slowly-changing-dimension type-2 build: collapse consecutive equal
    # states (gaps-and-islands), open an interval per change, close it
    # with the next change's timestamp. Exact integer microseconds.
    _SCD2_SQL,
)
def scd2_intervals(spark, sf):
    """SCD type-2 dimension build — the lakehouse pattern for turning an
    event stream into a queryable state HISTORY table ([valid_from,
    valid_to) per state run, open interval = current row). Two window
    passes over ONE user_id-keyed exchange (change detection via lag,
    interval close via lead on the collapsed runs — the second window
    reuses the first's partitioning, so no re-shuffle); no self-join.
    Validity bounds are exact integer microseconds (events_attribution
    precedent), the (ts, event_id) total order pins ties, and the
    output is the MERGE-free way to publish SCD2 at 100 TB: append-only
    event facts in, deterministic interval table out."""
    e = _events(spark, sf).select("user_id", "event_type", "ts", "event_id")
    return scd2_close(scd2_change_rows(e))


def _scd2_w():
    return Window.partitionBy("user_id").orderBy("ts", "event_id")


def scd2_change_rows(e: DataFrame) -> DataFrame:
    """Collapse consecutive equal states to their opening rows (the lag
    change-detection half of SCD2) — shared with ``stream_scd2``, which
    applies it per micro-batch over carried-opener ∪ batch rows."""
    o = e.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(_scd2_w()).alias("prev_type"),
    )
    return o.filter(
        F.col("prev_type").isNull()
        | (F.col("event_type") != F.col("prev_type"))
    ).drop("prev_type")


def scd2_close(ch: DataFrame) -> DataFrame:
    """Close each change-opened interval with the next change's timestamp
    (lead) — the second shared SCD2 half; the open run per user keeps a
    NULL valid_to and the is_current flag."""
    nxt = F.lead("ts").over(_scd2_w())
    return ch.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("valid_from_us"),
        F.unix_micros(nxt.cast("timestamp")).alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
    )


@register(
    "calendar_densify",
    # Date densification: one calendar row per user per day of their
    # activity span, flagged active/inactive — the gap-filling join that
    # precedes any per-day time series (LOCF, rolling stats, forecasting).
    "WITH span AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS d0, "
    "MAX(CAST(ts AS DATE)) AS d1 FROM events GROUP BY user_id), "
    "cal AS (SELECT user_id, CAST(unnest(generate_series(d0, d1, "
    "INTERVAL 1 DAY)) AS DATE) AS day FROM span), "
    "act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events) "
    "SELECT c.user_id, CAST(c.day AS VARCHAR) AS day, "
    "a.user_id IS NOT NULL AS was_active "
    "FROM cal c LEFT JOIN act a ON a.user_id = c.user_id AND a.day = c.day",
)
def calendar_densify(spark, sf):
    """Per-user calendar densification via the ``sequence`` generator:
    expand each user's [first, last] activity span to one row per day,
    left-joined against the deduped active-day set. The generated rows
    are bounded by users x span-days (never by event volume), the span
    aggregate and both join sides key on user_id (one co-partitioning),
    and generation happens DISTRIBUTED at the owning row — no driver
    calendar loop, no cross join against a global date dimension (which
    would fan out to users x global-calendar regardless of span). Day
    emitted as a formatted string (date rule)."""
    e = _events(spark, sf)
    span = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0"),
        F.max(F.to_date("ts")).alias("d1"),
    )
    cal = span.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    act = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    return (
        cal.join(
            act.withColumn("was_active", F.lit(True)),
            ["user_id", "day"],
            "left",
        )
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("was_active", F.lit(False)).alias("was_active"),
        )
    )


# ------------------------------------------------------------- streaks ----

@register(
    "events_streaks",
    # Gaps-and-islands: consecutive-active-day streaks per user via the
    # classic day - row_number() island key (all date/int arithmetic —
    # exact on both engines).
    "WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day "
    " FROM events), "
    "r AS (SELECT user_id, day, ROW_NUMBER() OVER ("
    " PARTITION BY user_id ORDER BY day) AS rn FROM du), "
    "s AS (SELECT user_id, COUNT(*) AS len FROM ("
    " SELECT user_id, day - CAST(rn AS INT) AS grp FROM r) g "
    " GROUP BY user_id, grp) "
    "SELECT user_id, CAST(MAX(len) AS BIGINT) AS best_streak, "
    "CAST(COUNT(*) AS BIGINT) AS n_streaks, "
    "CAST(SUM(len) AS BIGINT) AS active_days "
    "FROM s GROUP BY user_id",
)
def events_streaks(spark, sf):
    """Consecutive-day activity streaks per user — the gaps-and-islands
    window pattern (engagement streaks, uptime runs, sensor dropouts all
    reduce to it). An island is identified by ``day - row_number()``
    being constant: subtracting the per-user day rank from the calendar
    day collapses each consecutive run to one key, with no self-join and
    no iteration.

    Scale shape: dedup to the (user, day) grain first (the corpus-scale
    pass), then ONE user-keyed window and two user-keyed aggregations
    that all reuse the same hash partitioning — a single exchange of
    calendar-bounded rows regardless of raw event volume."""
    e = _events(spark, sf)
    du = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    g = du.select(
        "user_id",
        F.date_sub("day", F.row_number().over(w)).alias("grp"),
    )
    s = g.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("len"))
    return s.groupBy("user_id").agg(
        F.max("len").alias("best_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.sum("len").alias("active_days"),
    )


# ----------------------------------------------------------------- RFM ----

@register(
    "events_rfm",
    # RFM segmentation: recency (days since last event vs the corpus max
    # day — exact int), frequency (count), monetary (exact integer cents
    # via DECIMAL(12,2) * 100). Quartiles are NTILE(4) under TOTAL orders
    # (user_id tie-break), so the assignment is deterministic; R orders
    # ascending (recent = best), F/M descending (high = best).
    "WITH m AS (SELECT MAX(CAST(ts AS DATE)) AS maxd FROM events), "
    "u AS (SELECT user_id, "
    " DATEDIFF('day', MAX(CAST(ts AS DATE)), (SELECT maxd FROM m)) "
    "  AS recency_days, "
    " CAST(COUNT(*) AS BIGINT) AS freq, "
    " CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) "
    "  AS BIGINT) AS monetary_cents "
    " FROM events GROUP BY user_id) "
    "SELECT user_id, CAST(recency_days AS BIGINT) AS recency_days, freq, "
    "monetary_cents, "
    "CAST(NTILE(4) OVER (ORDER BY recency_days, user_id) AS BIGINT) AS r_q, "
    "CAST(NTILE(4) OVER (ORDER BY freq DESC, user_id) AS BIGINT) AS f_q, "
    "CAST(NTILE(4) OVER (ORDER BY monetary_cents DESC, user_id) AS BIGINT)"
    " AS m_q, "
    "'R' || CAST(NTILE(4) OVER (ORDER BY recency_days, user_id) AS VARCHAR)"
    " || 'F' || CAST(NTILE(4) OVER (ORDER BY freq DESC, user_id) AS VARCHAR)"
    " || 'M' || CAST(NTILE(4) OVER (ORDER BY monetary_cents DESC, user_id)"
    "  AS VARCHAR) AS segment "
    "FROM u",
)
def events_rfm(spark, sf, exact_cutoff: int | None = None):
    """RFM (recency / frequency / monetary) segmentation — the canonical
    customer-scoring rollup. Every metric is exact: recency is an integer
    day difference against the corpus's max day, frequency a count, and
    monetary an integer-cents sum (value -> DECIMAL(12,2) -> cents, so
    no float accumulation order can leak in). Quartile scores are
    NTILE(4) under total orders (user_id tie-break — the win_ntile
    determinism rule), composed into the 'R?F?M?' segment label.

    Scale shape (r6, the r5-VERDICT #2 fix): one user-keyed aggregation
    over the fact table (map-side combinable, state per user is three
    scalars), a broadcast 1-row max day (mix_weights precedent), then a
    SIZE-GATED rank step over the user-grain table. Below
    ``RFM_EXACT_CUTOFF`` (events bound users from above; the probe is
    metadata-cheap) the three exact NTILE windows run (what
    the oracle pins at test SFs) — quantile ranks are global
    statements, so those windows are unpartitioned and funnel the user
    table through one partition. ABOVE the gate that single-partition
    sort is the scale hazard (it grows with users, unlike this module's
    bounded-domain windows), so the quartile boundaries come from ONE
    approx_percentile aggregation (mergeable sketch — no row funnel)
    broadcast back as three cutoffs per metric and applied as when()
    buckets: fully parallel, boundary-tie assignment approximate by
    construction (the documented trade; the forced-path pytest pins
    schema, bucket range and near-balanced quartiles)."""
    e = _events(spark, sf)
    maxd = e.agg(F.max(F.to_date("ts")).alias("maxd"))
    u = (
        e.groupBy("user_id")
        .agg(
            F.max(F.to_date("ts")).alias("last_day"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(
                (F.col("value").cast("decimal(12,2)") * 100).cast("long")
            ).alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(maxd))
        .select(
            "user_id",
            F.datediff("maxd", "last_day").cast("long").alias("recency_days"),
            "freq",
            "monetary_cents",
        )
    )
    if exact_cutoff is None:
        exact_cutoff = RFM_EXACT_CUTOFF
    # gate probe: the EVENT count bounds the user count from above and
    # is metadata-cheap on parquet (no extra pass over the user grain)
    if e.count() <= int(exact_cutoff):
        rq = F.ntile(4).over(Window.orderBy("recency_days", "user_id"))
        fq = F.ntile(4).over(Window.orderBy(F.desc("freq"), "user_id"))
        mq = F.ntile(4).over(
            Window.orderBy(F.desc("monetary_cents"), "user_id")
        )
    else:
        cuts = u.agg(
            F.percentile_approx(
                "recency_days", [0.25, 0.5, 0.75], 10000
            ).alias("rc"),
            F.percentile_approx("freq", [0.75, 0.5, 0.25], 10000).alias(
                "fc"
            ),
            F.percentile_approx(
                "monetary_cents", [0.75, 0.5, 0.25], 10000
            ).alias("mc"),
        ).head()

        def asc_bucket(col, cs):  # quartile 1 = smallest values
            x = F.col(col)
            return (
                F.lit(1)
                + (x > F.lit(int(cs[0]))).cast("int")
                + (x > F.lit(int(cs[1]))).cast("int")
                + (x > F.lit(int(cs[2]))).cast("int")
            )

        def desc_bucket(col, cs):  # quartile 1 = largest values
            x = F.col(col)
            return (
                F.lit(1)
                + (x < F.lit(int(cs[0]))).cast("int")
                + (x < F.lit(int(cs[1]))).cast("int")
                + (x < F.lit(int(cs[2]))).cast("int")
            )

        rq = asc_bucket("recency_days", cuts["rc"])
        fq = desc_bucket("freq", cuts["fc"])
        mq = desc_bucket("monetary_cents", cuts["mc"])
    return u.select(
        "user_id",
        "recency_days",
        "freq",
        "monetary_cents",
        rq.cast("long").alias("r_q"),
        fq.cast("long").alias("f_q"),
        mq.cast("long").alias("m_q"),
        F.concat(
            F.lit("R"), rq.cast("string"),
            F.lit("F"), fq.cast("string"),
            F.lit("M"), mq.cast("string"),
        ).alias("segment"),
    )


# ------------------------------------------------------------- journeys ----

@register(
    "events_journey_paths",
    # Top-20 length-3 event-type journeys across all user timelines —
    # consecutive trigrams under the total (ts, event_id) per-user order,
    # selected by the deterministic (count DESC, path) total order.
    "WITH s AS (SELECT event_type AS e1, "
    " LEAD(event_type, 1) OVER w AS e2, LEAD(event_type, 2) OVER w AS e3 "
    " FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
    "c AS (SELECT e1 || '>' || e2 || '>' || e3 AS path, "
    " CAST(COUNT(*) AS BIGINT) AS n FROM s WHERE e3 IS NOT NULL GROUP BY 1) "
    "SELECT path, n FROM c ORDER BY n DESC, path LIMIT 20",
)
def events_journey_paths(spark, sf):
    """Top user journeys: the most frequent length-3 consecutive
    event-type paths (the product-analytics 'paths' report; also the
    order-3 generalization of ``event_transitions``' Markov edges).

    Scale shape: trigram derivation is two LEADs over the SAME user-keyed
    window (one exchange, shared sort); the count table is bounded by
    event-type³ (dimension-sized), and the top-20 is
    TakeOrderedAndProject under a total (n DESC, path) order — no global
    sort of anything fact-scale."""
    e = _events(spark, sf)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e3").isNotNull())
    c = s.groupBy(
        F.concat_ws(">", "e1", "e2", "e3").alias("path")
    ).agg(F.count(F.lit(1)).alias("n"))
    return c.orderBy(F.desc("n"), "path").limit(20)


# ------------------------------------------------------ point-in-time ----

@register(
    "join_temporal",
    # Point-in-time join: each purchase looked up against the SCD2 state
    # history — which state run was IN EFFECT when the purchase arrived
    # (the run it extended or interrupted): valid_from strictly before
    # ts, valid_to at-or-after ts (or open). Exactly one interval
    # qualifies per event except a user's very first event (no prior
    # state — inner join drops it, deterministically on both engines).
    f"WITH iv AS ({_SCD2_SQL}) "
    "SELECT e.event_id, e.user_id, iv.state AS state_at, "
    "iv.valid_from_us, CAST(epoch_us(e.ts) AS BIGINT) AS ts_us "
    "FROM events e JOIN iv ON iv.user_id = e.user_id "
    " AND iv.valid_from_us < epoch_us(e.ts) "
    " AND (iv.valid_to_us IS NULL OR iv.valid_to_us >= epoch_us(e.ts)) "
    "WHERE e.event_type = 'purchase'",
)
def join_temporal(spark, sf):
    """Point-in-time (temporal) join — the lakehouse lookup every SCD2
    table exists to serve: join facts to the dimension version that was
    current at the fact's timestamp. Here: each purchase against the
    user's state history from the SHARED SCD2 build (one definition of
    interval semantics across scd2_intervals / stream_scd2 / this key).
    Bounds are exact integer microseconds; the strict-lower / inclusive-
    upper pair makes the match unique (a run-opening purchase matches
    the run it closed, a mid-run purchase matches its own run).

    Scale shape: the join carries the user_id EQUI key — Spark plans a
    hash join co-partitioned on user_id with the interval predicate as a
    residual filter, so this is one user-keyed exchange shared with the
    history build itself, never a cross product. The history side is
    runs-per-user sized (the SCD2 compression), orders below raw
    events."""
    e = _events(spark, sf)
    iv = scd2_close(
        scd2_change_rows(
            e.select("user_id", "event_type", "ts", "event_id")
        )
    ).withColumnRenamed("user_id", "iv_user")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    return p.join(
        iv,
        (F.col("iv_user") == F.col("user_id"))
        & (F.col("valid_from_us") < F.col("ts_us"))
        & (
            F.col("valid_to_us").isNull()
            | (F.col("valid_to_us") >= F.col("ts_us"))
        ),
    ).select(
        "event_id",
        "user_id",
        F.col("state").alias("state_at"),
        "valid_from_us",
        "ts_us",
    )


# ------------------------------------------------------------ A/B test ----

@register(
    "events_ab_test",
    # Two-proportion z-test between hash-split variants. Counts are exact
    # integers; every float op (4 divisions, the pooled-variance product,
    # sqrt, final division) is spelled in the SAME fixed sequence on both
    # engines — the events_anomaly composed-IEEE-op rule. Significance is
    # tested on the ROUNDED z (half-away ties) like events_anomaly.
    "WITH u AS (SELECT user_id, user_id % 2 AS variant, "
    " CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) * 5 "
    "  > COUNT(*) THEN 1 ELSE 0 END AS conv "
    " FROM events GROUP BY user_id), "
    "g AS (SELECT "
    " CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na, "
    " CAST(SUM(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS BIGINT) AS ca, "
    " CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb, "
    " CAST(SUM(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS BIGINT) AS cb "
    " FROM u) "
    "SELECT na, ca, nb, cb, "
    "printf('%.6f', ROUND(CAST(ca AS DOUBLE) / na, 6)) AS rate_a, "
    "printf('%.6f', ROUND(CAST(cb AS DOUBLE) / nb, 6)) AS rate_b, "
    "printf('%.6f', ROUND("
    " (CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb) / "
    " SQRT((CAST(ca + cb AS DOUBLE) / (na + nb)) * "
    "  (CAST(1 AS DOUBLE) - CAST(ca + cb AS DOUBLE) / (na + nb)) * "
    "  (CAST(1 AS DOUBLE) / na + CAST(1 AS DOUBLE) / nb)), 6)) AS z, "
    "ABS(ROUND((CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb) / "
    " SQRT((CAST(ca + cb AS DOUBLE) / (na + nb)) * "
    "  (CAST(1 AS DOUBLE) - CAST(ca + cb AS DOUBLE) / (na + nb)) * "
    "  (CAST(1 AS DOUBLE) / na + CAST(1 AS DOUBLE) / nb)), 6)) >= 1.96 AS significant "
    "FROM g",
)
def events_ab_test(spark, sf):
    """Two-proportion z-test — the experimentation query every product
    analytics engine ships: users hash-split into variants (user_id
    parity — the deterministic assignment a real system derives from a
    hashed unit id, cf. split_assign), conversion = the user's purchase
    share strictly above 1/5 (an exact integer cross-multiplication,
    scale-invariant — 'any purchase' saturates to rate 1.0 on this
    corpus and degenerates the pooled variance), then
    the pooled z statistic for the rate difference. All counts are exact
    integers; the z value is a FIXED sequence of correctly-rounded IEEE
    ops (divisions, one multiply chain, sqrt) spelled identically on
    both engines, so the %.6f strings — and the significance flag tested
    on the ROUNDED z — cannot diverge.

    Scale shape: one user-keyed aggregation over facts (map-side
    combinable conditional MAX), then a single-row rollup — the
    funnel_conversion plan with a different final expression. Variant
    counts never reshuffle facts."""
    e = _events(spark, sf)
    u = e.groupBy("user_id").agg(
        F.when(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ) * 5
            > F.count(F.lit(1)),
            1,
        )
        .otherwise(0)
        .alias("conv")
    ).select((F.col("user_id") % 2).alias("variant"), "conv")
    g = u.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).cast("long").alias("na"),
        F.sum(F.when(F.col("variant") == 0, F.col("conv")).otherwise(0)).cast("long").alias("ca"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).cast("long").alias("nb"),
        F.sum(F.when(F.col("variant") == 1, F.col("conv")).otherwise(0)).cast("long").alias("cb"),
    )
    ra = F.col("ca").cast("double") / F.col("na")
    rb = F.col("cb").cast("double") / F.col("nb")
    pp = (F.col("ca") + F.col("cb")).cast("double") / (F.col("na") + F.col("nb"))
    z = F.round(
        (ra - rb)
        / F.sqrt(
            pp * (F.lit(1.0) - pp)
            * (F.lit(1.0) / F.col("na") + F.lit(1.0) / F.col("nb"))
        ),
        6,
    )
    return g.select(
        "na", "ca", "nb", "cb",
        _FMT6(ra).alias("rate_a"),
        _FMT6(rb).alias("rate_b"),
        F.format_string("%.6f", z).alias("z"),
        (F.abs(z) >= 1.96).alias("significant"),
    )


# ------------------------------------------------------------ forecast ----

@register(
    "events_forecast",
    # Seasonal-naive backtest: forecast(day) = actual(day - 7 days), per
    # event type, scored only where both sides exist (inner join on the
    # calendar-shifted key — exact date arithmetic, no row-offset LAG
    # that would slip across gap days). Counts and errors are exact
    # integers.
    "WITH d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, "
    " CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2) "
    "SELECT a.event_type, a.day, a.cnt AS actual, b.cnt AS forecast, "
    "CAST(ABS(a.cnt - b.cnt) AS BIGINT) AS abs_err "
    "FROM d a JOIN d b ON b.event_type = a.event_type "
    " AND CAST(b.day AS DATE) + INTERVAL 7 DAY = CAST(a.day AS DATE)",
)
def events_forecast(spark, sf):
    """Seasonal-naive forecast backtest — the baseline every real
    forecasting system is judged against (and at daily-ops granularity,
    often the one that ships): predict each day's volume per event type
    as the SAME WEEKDAY's volume one week earlier, scored against the
    actual. The shifted key is CALENDAR arithmetic (date + 7 days), not
    a row-offset LAG — gap days must not slide the season. Emits the
    per-day backtest table (actual, forecast, absolute error — all exact
    integers); the per-type MAE is one groupBy away and stays exact.

    Scale shape: facts collapse to the (event_type, day) grain in ONE
    map-side-combinable aggregation; the self-join runs on the
    calendar-sized daily table (types × days), co-partitioned on
    event_type — nothing fact-scale shuffles twice."""
    return forecast_rollup(daily_counts(_events(spark, sf)))


def forecast_rollup(d: DataFrame) -> DataFrame:
    """Seasonal-naive backtest join over a (event_type, day, cnt) daily
    table — the dimension-sized half of ``events_forecast``, shared with
    the ``stream_forecast`` ingest twin (daily COUNT is exactly
    sum-mergeable across micro-batches, so the twin runs this same join
    over its merged state)."""
    a = d.select(
        "event_type", "day", F.col("cnt").alias("actual"),
        F.to_date("day").alias("day_d"),
    )
    b = d.select(
        F.col("event_type").alias("b_type"),
        F.col("cnt").alias("forecast"),
        F.date_add(F.to_date("day"), 7).alias("b_day_d"),
    )
    return (
        a.join(
            b,
            (F.col("b_type") == F.col("event_type"))
            & (F.col("b_day_d") == F.col("day_d")),
        )
        .select(
            "event_type",
            "day",
            "actual",
            "forecast",
            F.abs(F.col("actual") - F.col("forecast"))
            .cast("long")
            .alias("abs_err"),
        )
    )


# -------------------------------------------------------------- trend ----

@register(
    "events_trend",
    # Per-type OLS trend of daily volume vs day index: sufficient
    # statistics (n, Σx, Σy, Σxy, Σx²) are exact integers (x = days
    # since the fixed 2024-01-01 anchor, y = daily count), slope is ONE
    # division of exact-integer doubles, intercept is the SAME fixed
    # IEEE op chain on both engines (events_anomaly precedent:
    # the float rule extends to composed chains when the expression
    # trees match exactly). Zero-variance types excluded by the same
    # integer comparison on both sides.
    "WITH d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, "
    " CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2), "
    "x AS (SELECT event_type, "
    " DATEDIFF('day', DATE '2024-01-01', CAST(day AS DATE)) AS xi, cnt "
    " FROM d), "
    "s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days, "
    " CAST(SUM(xi) AS BIGINT) AS sx, CAST(SUM(cnt) AS BIGINT) AS sy, "
    " CAST(SUM(xi * cnt) AS BIGINT) AS sxy, "
    " CAST(SUM(xi * xi) AS BIGINT) AS sxx FROM x GROUP BY 1) "
    "SELECT event_type, n_days, "
    "printf('%.6f', ROUND(CAST(n_days * sxy - sx * sy AS DOUBLE) / "
    " CAST(n_days * sxx - sx * sx AS DOUBLE), 6)) AS slope, "
    "printf('%.6f', ROUND((CAST(sy AS DOUBLE) - "
    " CAST(n_days * sxy - sx * sy AS DOUBLE) / "
    " CAST(n_days * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE)) / "
    " CAST(n_days AS DOUBLE), 6)) AS intercept "
    "FROM s WHERE n_days * sxx > sx * sx",
)
def events_trend(spark, sf):
    """Per-event-type linear trend of daily volume — the growth/decay
    diagnostic a metrics platform fits over every series it tracks
    (OLS slope per series IS the 'trending' column in ops dashboards),
    and the parametric complement of ``events_forecast``'s seasonal
    baseline. Day index is exact calendar arithmetic from a fixed
    anchor, so the fit is invariant to which days happen to have data.

    Scale shape: ONE map-side-combinable aggregation collapses facts to
    the (type, day) grain; the sufficient-statistic rollup and the
    closed-form slope/intercept algebra run on the dimension-sized
    daily table — the fit costs one pass regardless of corpus size."""
    d = daily_counts(_events(spark, sf))
    x = d.select(
        "event_type",
        F.datediff(F.to_date("day"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("xi"),
        "cnt",
    )
    s = x.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("xi").cast("long").alias("sx"),
        F.sum("cnt").cast("long").alias("sy"),
        F.sum(F.col("xi") * F.col("cnt")).cast("long").alias("sxy"),
        F.sum(F.col("xi") * F.col("xi")).cast("long").alias("sxx"),
    )
    n, sx, sy = F.col("n_days"), F.col("sx"), F.col("sy")
    num = (n * F.col("sxy") - sx * sy).cast("double")
    den = (n * F.col("sxx") - sx * sx).cast("double")
    slope = num / den
    intercept = (
        sy.cast("double") - slope * sx.cast("double")
    ) / n.cast("double")
    return s.filter(n * F.col("sxx") > sx * sx).select(
        "event_type",
        "n_days",
        _FMT6(slope).alias("slope"),
        _FMT6(intercept).alias("intercept"),
    )


# -------------------------------------------------------- seasonality ----

@register(
    "events_seasonality",
    # Weekday volume profile per event type: exact integer counts at the
    # (type, ISO weekday) grain, share-of-type as one division under the
    # %.6f rule. isodow (1=Monday..7) twins Spark's weekday()+1.
    "WITH d AS (SELECT event_type, CAST(isodow(ts) AS BIGINT) AS dow, "
    " strftime(ts, '%A') AS weekday, CAST(COUNT(*) AS BIGINT) AS cnt "
    " FROM events GROUP BY 1, 2, 3), "
    "t AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS total "
    " FROM d GROUP BY 1) "
    "SELECT d.event_type, d.dow, d.weekday, d.cnt, "
    "printf('%.6f', ROUND(CAST(d.cnt AS DOUBLE) / t.total, 6)) AS share "
    "FROM d JOIN t ON t.event_type = d.event_type",
)
def events_seasonality(spark, sf):
    """Day-of-week seasonality profile — the fraction of each event
    type's volume landing on each ISO weekday, the table behind every
    'weekend dip' chart and the seasonal prior ``events_forecast``'s
    naive baseline implicitly assumes. Counts are exact integers; the
    share is one correctly-rounded division; the weekday NAME rides
    along for display (both engines emit English day names).

    Scale shape: facts collapse to (type, weekday) — at most 7 rows per
    type — in ONE partial+final aggregation; the type-total derives from
    THAT table (never a second fact pass) and joins back broadcast-
    sized."""
    e = _events(spark, sf)
    d = e.groupBy(
        "event_type",
        (F.weekday("ts") + 1).cast("long").alias("dow"),
        F.date_format("ts", "EEEE").alias("weekday"),
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    t = d.groupBy("event_type").agg(F.sum("cnt").cast("long").alias("total"))
    return d.join(F.broadcast(t), "event_type").select(
        "event_type",
        "dow",
        "weekday",
        "cnt",
        _FMT6(F.col("cnt").cast("double") / F.col("total")).alias("share"),
    )


# --------------------------------------------------------------- gaps ----

@register(
    "events_gaps",
    # Per-user inter-arrival profile: gaps in exact integer microseconds
    # under the TOTAL (ts, event_id) order; min/max/count exact, the
    # mean is one division under the %.6f rule.
    "WITH g AS (SELECT user_id, epoch_us(ts) - lag(epoch_us(ts)) OVER ("
    " PARTITION BY user_id ORDER BY ts, event_id) AS gap FROM events) "
    "SELECT user_id, CAST(COUNT(gap) AS BIGINT) AS n_gaps, "
    "CAST(MIN(gap) AS BIGINT) AS min_gap_us, "
    "CAST(MAX(gap) AS BIGINT) AS max_gap_us, "
    # mean emitted in SECONDS: at the µs grain the mean is ~4e10 and six
    # decimals exceed double's 15.95 exactly-formattable digits (the two
    # engines' %.6f disagreed in the last digit); ÷1e6 (exact power of
    # two? no — but the same fixed op chain on both engines) brings the
    # value into the exact-formatting range.
    "printf('%.6f', ROUND(CAST(SUM(gap) AS DOUBLE) / COUNT(gap) "
    " / 1000000.0, 6)) AS avg_gap_s "
    "FROM g WHERE gap IS NOT NULL GROUP BY user_id",
)
def events_gaps(spark, sf):
    """Per-user inter-arrival time profile — the burstiness signal
    behind bot detection (impossibly small min gap), churn scoring
    (large max gap), and session-timeout calibration (the gap
    distribution is what ``win_session_batch``'s 1800 s threshold is
    fitted against). Gaps are exact integer microseconds under a TOTAL
    per-user order (event_id tie-break), so every statistic except the
    %.6f mean is exact.

    Scale shape: ONE user-keyed exchange feeds both the LAG window and
    the per-user aggregate (they co-partition); no fact-scale data
    crosses any other boundary, and the output is user-dimension
    sized."""
    e = _events(spark, sf)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    g = e.select(
        "user_id", (us - F.lag(us).over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    return g.groupBy("user_id").agg(
        F.count("gap").cast("long").alias("n_gaps"),
        F.min("gap").cast("long").alias("min_gap_us"),
        F.max("gap").cast("long").alias("max_gap_us"),
        _FMT6(
            F.sum("gap").cast("double") / F.count("gap") / F.lit(1000000.0)
        ).alias("avg_gap_s"),
    )


# ------------------------------------------------------- daily growth ----

@register(
    "events_daily_growth",
    # Day-over-day growth per event type: LAG over the dimension-sized
    # daily table (previous PRESENT day, matching how metrics tools
    # compute DoD over sparse series); counts exact, the pct change is
    # ONE division of exact-integer doubles under the %.6f rule.
    "WITH d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, "
    " CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2), "
    "g AS (SELECT event_type, day, cnt, lag(cnt) OVER ("
    " PARTITION BY event_type ORDER BY day) AS prev FROM d) "
    "SELECT event_type, day, cnt, CAST(prev AS BIGINT) AS prev, "
    "printf('%.6f', ROUND(CAST(cnt - prev AS DOUBLE) / prev, 6)) "
    " AS pct_change "
    "FROM g WHERE prev IS NOT NULL",
)
def events_daily_growth(spark, sf):
    """Day-over-day growth table — the '+12% vs yesterday' column on
    every metrics dashboard, per event type. The previous point is the
    previous PRESENT day in the series (LAG over the daily grain), the
    standard sparse-series DoD; the calendar-exact complement is
    ``events_forecast``'s shifted join. Counts exact; one
    correctly-rounded division per row.

    Scale shape: facts collapse once to the (type, day) grain; the LAG
    window runs on that dimension-sized table partitioned by type —
    nothing fact-scale is re-touched."""
    d = daily_counts(_events(spark, sf))
    w = Window.partitionBy("event_type").orderBy("day")
    g = d.select(
        "event_type",
        "day",
        "cnt",
        F.lag("cnt").over(w).cast("long").alias("prev"),
    ).filter(F.col("prev").isNotNull())
    return g.select(
        "event_type",
        "day",
        "cnt",
        "prev",
        _FMT6(
            (F.col("cnt") - F.col("prev")).cast("double") / F.col("prev")
        ).alias("pct_change"),
    )


# ------------------------------------------------- CDC / table diff ----

def cdc_user_state(e: DataFrame) -> DataFrame:
    """The per-user CDC state: last change row under the (ts, event_id)
    total order (MAX over a struct — no window sort, the agg_argminmax
    spelling) plus the change count. Both aggregates are exactly
    mergeable (max is associative, count sums), which is the property
    ``stream_cdc`` relies on to fold micro-batches into carried state.
    Shared between ``cdc_apply`` and the streaming twin. The change
    time lives in the struct as exact integer microseconds (orders the
    same as the timestamp, and survives the parquet state swap without
    the TIMESTAMP_NTZ round-trip — see NOTES)."""
    return e.groupBy("user_id").agg(
        F.max(
            F.struct(
                F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
                F.col("event_id").alias("event_id"),
                F.col("event_type").alias("event_type"),
                F.col("value").alias("value"),
            )
        ).alias("last"),
        F.count(F.lit(1)).cast("long").alias("n_changes"),
    )


def cdc_snapshot_rollup(state: DataFrame) -> DataFrame:
    """Project the merged CDC state to the live snapshot: tombstoned
    keys (last op = 'error') are absent, survivors carry their latest
    state, exact-micros change time, and lifetime change count."""
    return state.filter(F.col("last.event_type") != "error").select(
        "user_id",
        F.col("last.event_type").alias("state"),
        F.col("last.ts_us").alias("last_ts_us"),
        _FMT6(F.col("last.value")).alias("last_value"),
        "n_changes",
    )


@register(
    "cdc_apply",
    # Changelog -> snapshot materialization: events as a CDC stream on
    # user_id ('error' = tombstone/DELETE, anything else = UPSERT);
    # the snapshot is each key's last change under the (ts, event_id)
    # total order, tombstoned keys absent. Exact integer micros; value
    # under the %.6f rule.
    "WITH r AS (SELECT user_id, event_type, value, ts, event_id, "
    "ROW_NUMBER() OVER (PARTITION BY user_id "
    " ORDER BY ts DESC, event_id DESC) AS rn, "
    "COUNT(*) OVER (PARTITION BY user_id) AS n_changes FROM events) "
    "SELECT user_id, event_type AS state, "
    "CAST(epoch_us(ts) AS BIGINT) AS last_ts_us, "
    "printf('%.6f', ROUND(value, 6)) AS last_value, "
    "CAST(n_changes AS BIGINT) AS n_changes "
    "FROM r WHERE rn = 1 AND event_type <> 'error'",
)
def cdc_apply(spark, sf):
    """Apply a change-data-capture log to materialize the current
    snapshot — the Debezium/Delta CDF consumption pattern: events are
    the ordered changelog on user_id, 'error' rows are tombstones, and
    the live table is each surviving key's latest change (last-write
    wins under the (ts, event_id) total order, which is unique, so the
    result is deterministic for any arrival order).

    Scale shape: ONE user-keyed hash aggregate — the last-row pick is a
    MAX over a (ts, event_id, ...) struct, so it partial-aggregates
    map-side and never sorts (the oracle's ROW_NUMBER spelling would
    pay a per-key sort; max_by doesn't). State per key is one row:
    exactly the compaction a streaming CDC materializer keeps."""
    e = _events(spark, sf)
    return cdc_snapshot_rollup(cdc_user_state(e))


@register(
    "snapshot_diff",
    # Table diff between two snapshots of the per-(user, event_type)
    # activity profile (first week vs last week of the corpus):
    # source-only keys ADDED, target-only REMOVED, both-with-different
    # counts CHANGED; identical rows are omitted (a diff, not a copy).
    "WITH a AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) "
    " AS cnt FROM events WHERE ts >= TIMESTAMP '2024-01-01' "
    " AND ts < TIMESTAMP '2024-01-08' GROUP BY 1, 2), "
    "b AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) "
    " AS cnt FROM events WHERE ts >= TIMESTAMP '2024-01-24' "
    " AND ts < TIMESTAMP '2024-01-31' GROUP BY 1, 2) "
    "SELECT COALESCE(a.user_id, b.user_id) AS user_id, "
    "COALESCE(a.event_type, b.event_type) AS event_type, "
    "(CASE WHEN a.user_id IS NULL THEN 'ADDED' "
    " WHEN b.user_id IS NULL THEN 'REMOVED' ELSE 'CHANGED' END) "
    " AS action, a.cnt AS old_cnt, b.cnt AS new_cnt "
    "FROM a FULL OUTER JOIN b "
    "ON a.user_id = b.user_id AND a.event_type = b.event_type "
    "WHERE a.user_id IS NULL OR b.user_id IS NULL OR a.cnt <> b.cnt",
)
def snapshot_diff(spark, sf):
    """Snapshot-to-snapshot table diff — the data-reconciliation
    operator behind incremental-materialization testing and replica
    drift checks: full-outer join two snapshots on the key, classify
    every key as ADDED / REMOVED / CHANGED with old/new values,
    omit identical rows. Snapshots here are the per-(user, event_type)
    weekly activity profiles (all three classes occur at every SF —
    measured before committing the windows).

    Scale shape: both snapshot aggregates and the diff join share ONE
    (user_id, event_type) hash partitioning — the aggregate exchanges
    are the only fact-scale shuffles and the join reuses them (no
    additional exchange under AQE); the WHERE drops SAME rows before
    anything leaves the join. At 100 TB this is the shape you want:
    diff cost is bounded by the key domain, not event volume."""
    e = _events(spark, sf)

    def snap(lo: str, hi: str) -> DataFrame:
        return (
            e.filter(
                (F.col("ts") >= F.lit(lo).cast("timestamp"))
                & (F.col("ts") < F.lit(hi).cast("timestamp"))
            )
            .groupBy("user_id", "event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )

    a = snap("2024-01-01", "2024-01-08").alias("a")
    b = snap("2024-01-24", "2024-01-31").alias("b")
    j = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.event_type") == F.col("b.event_type")),
        "full_outer",
    )
    return j.filter(
        F.col("a.user_id").isNull()
        | F.col("b.user_id").isNull()
        | (F.col("a.cnt") != F.col("b.cnt"))
    ).select(
        F.coalesce(F.col("a.user_id"), F.col("b.user_id")).alias("user_id"),
        F.coalesce(F.col("a.event_type"), F.col("b.event_type")).alias(
            "event_type"
        ),
        F.when(F.col("a.user_id").isNull(), F.lit("ADDED"))
        .when(F.col("b.user_id").isNull(), F.lit("REMOVED"))
        .otherwise(F.lit("CHANGED"))
        .alias("action"),
        F.col("a.cnt").alias("old_cnt"),
        F.col("b.cnt").alias("new_cnt"),
    )


# ---------------------------------------------------- data layout ----

def _spread_bits_sql(expr: str) -> str:
    """SQL spelling of the 16-bit Morton spread (part1by1): four
    shift-or-mask rounds that move bit i of ``expr`` to bit 2i. The
    same four-step magic-mask sequence as the Spark side — generated
    from one place so the two engines cannot drift."""
    s = expr
    for shift, mask in ((8, 0x00FF00FF), (4, 0x0F0F0F0F),
                        (2, 0x33333333), (1, 0x55555555)):
        s = f"(({s} | ({s} << {shift})) & {mask})"
    return s


def _spread_bits_col(c):
    """Column spelling of the same 16-bit Morton spread."""
    for shift, mask in ((8, 0x00FF00FF), (4, 0x0F0F0F0F),
                        (2, 0x33333333), (1, 0x55555555)):
        c = (c.bitwiseOR(F.shiftleft(c, shift))).bitwiseAND(F.lit(mask))
    return c


_Z_DAY_SQL = "CAST(date_diff('day', DATE '2024-01-01', ts) AS BIGINT)"
_Z_SQL = (
    f"({_spread_bits_sql('user_id')} | ({_spread_bits_sql(_Z_DAY_SQL)} << 1))"
)


@register(
    "zorder_key",
    # Z-order (Morton) clustering key over the two dimensions event
    # scans actually filter by — user and day: interleave the low 16
    # bits of each (both domains fit), bucket = the 8 high bits of the
    # 32-bit z-value. Pure BIGINT bit algebra, identical on both
    # engines.
    f"SELECT event_id, user_id, {_Z_DAY_SQL} AS day, "
    f"{_Z_SQL} AS zval, ({_Z_SQL} >> 24) AS zbucket "
    "FROM events",
)
def zorder_key(spark, sf):
    """Z-order (Morton) clustering key — the multi-dimensional data-
    layout primitive behind Delta OPTIMIZE ZORDER BY / Iceberg sort
    orders: interleave the bits of the two filter dimensions (user_id,
    event day) so that sorting by the z-value co-locates rows close in
    BOTH dimensions, and range-partitioning by the z-value's high bits
    (``zbucket``) assigns rows to files such that a predicate on either
    dimension prunes most files.

    Scale shape: a zero-shuffle whole-stage-codegen projection — the
    16-bit spread is four shift-or-mask rounds per dimension (the
    classic part1by1 magic masks), all BIGINT algebra. At 100 TB the
    layout job is this projection + repartitionByRange(zval) + write;
    the key computation itself never exchanges. The SQL and Column
    spellings are generated from the same four-round table above, so
    the oracle is structurally the same arithmetic."""
    e = _events(spark, sf)
    day = F.datediff(
        F.col("ts").cast("date"), F.to_date(F.lit("2024-01-01"))
    ).cast("long")
    z = _spread_bits_col(F.col("user_id")).bitwiseOR(
        F.shiftleft(_spread_bits_col(day), 1)
    )
    return e.select(
        "event_id",
        "user_id",
        day.alias("day"),
        z.alias("zval"),
        F.shiftright(z, 24).alias("zbucket"),
    )


# ---------------------------------------------------- dim enrichment ----

def enrich_with_dim(e: DataFrame, dim: DataFrame) -> DataFrame:
    """Left broadcast-join events against a user dimension — shared by
    the batch key and ``stream_enrich`` (state-free, so the streaming
    twin is exact by construction). Unknown users coalesce to a
    sentinel segment rather than dropping rows (an enrichment, not a
    filter)."""
    return e.join(F.broadcast(dim), "user_id", "left").select(
        "event_id",
        "user_id",
        "event_type",
        F.coalesce(F.col("segment"), F.lit("UNKNOWN")).alias("segment"),
    )


def user_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The user dimension: market segment keyed by custkey."""
    from ..caching import cached_scan

    return cached_scan(spark, f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )


@register(
    "events_enrich",
    # Fact-stream dimension enrichment: LEFT join so unknown users keep
    # their events with a sentinel segment.
    "SELECT e.event_id, e.user_id, e.event_type, "
    "COALESCE(c.c_mktsegment, 'UNKNOWN') AS segment "
    "FROM events e LEFT JOIN customer c ON c.c_custkey = e.user_id",
)
def events_enrich(spark, sf):
    """Dimension enrichment of the event fact stream — the first join
    every analytics pipeline performs (fact → user/customer attributes)
    and the batch twin of ``stream_enrich``. LEFT join: events from
    users outside the dimension survive with segment = 'UNKNOWN'.

    Scale shape: ONE broadcast hash join, zero fact-side shuffles — the
    dimension is orders of magnitude smaller than the fact table at any
    scale where this engine runs (and if a user dim ever outgrew the
    broadcast threshold, AQE falls back to a shuffled join keyed
    user_id, co-partitioned with every other key in this module)."""
    return enrich_with_dim(_events(spark, sf), user_dim(spark, sf))


@register(
    "events_islands",
    # Gaps-and-islands: contiguous active-day runs per user, via the
    # classic day_number - row_number anchor (exact integer algebra).
    "WITH d AS (SELECT DISTINCT user_id, "
    "  date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_num "
    " FROM events), "
    "r AS (SELECT user_id, day_num, day_num - ROW_NUMBER() OVER ("
    "  PARTITION BY user_id ORDER BY day_num) AS anchor FROM d) "
    "SELECT user_id, CAST(MIN(day_num) AS BIGINT) AS start_day, "
    "CAST(MAX(day_num) AS BIGINT) AS end_day, "
    "COUNT(*) AS n_days "
    "FROM r GROUP BY user_id, anchor",
)
def events_islands(spark, sf):
    """Gaps-and-islands: collapse each user's active days into maximal
    CONTIGUOUS runs (start, end, length) — the canonical streak/uptime
    /coverage-interval report, and the textbook day_num - row_number
    trick: consecutive days share one anchor, any gap shifts it.

    Scale shape: dedup to the (user, day) grain FIRST (one user-keyed
    exchange), then the row_number window and the (user, anchor)
    rollup both reuse that same partitioning — one shuffle total.
    Day numbers are exact integer day-diffs from epoch, so anchors and
    island bounds are pure integer algebra on both engines."""
    return islands_rollup(user_days(_events(spark, sf)))


def user_days(events: DataFrame) -> DataFrame:
    """The deduped (user_id, day_num) activity grain — the ONLY
    state-bearing input of the islands family (shared with
    stream_islands; set union merges it exactly across batches)."""
    return events.select(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01"))
        .cast("long")
        .alias("day_num"),
    ).distinct()


def islands_rollup(days: DataFrame) -> DataFrame:
    """Shared islands definition over the (user_id, day_num) grain —
    one spelling of the anchor trick for the batch key and its
    streaming twin."""
    w = Window.partitionBy("user_id").orderBy("day_num")
    return (
        days.withColumn(
            "anchor", F.col("day_num") - F.row_number().over(w)
        )
        .groupBy("user_id", "anchor")
        .agg(
            F.min("day_num").cast("long").alias("start_day"),
            F.max("day_num").cast("long").alias("end_day"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .select("user_id", "start_day", "end_day", "n_days")
    )


@register(
    "events_pareto",
    # Pareto concentration: per event type, how many top users cover
    # 80% of the volume. The 80% cut is the exact integer inequality
    # cum*5 >= total*4 — no float share exists before the output.
    "WITH pu AS (SELECT event_type, user_id, COUNT(*) AS cnt "
    " FROM events GROUP BY event_type, user_id), "
    "r AS (SELECT event_type, cnt, "
    "  SUM(cnt) OVER (PARTITION BY event_type "
    "   ORDER BY cnt DESC, user_id "
    "   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, "
    "  ROW_NUMBER() OVER (PARTITION BY event_type "
    "   ORDER BY cnt DESC, user_id) AS rnk, "
    "  SUM(cnt) OVER (PARTITION BY event_type) AS total, "
    "  COUNT(*) OVER (PARTITION BY event_type) AS n_users "
    " FROM pu) "
    "SELECT event_type, CAST(MIN(rnk) AS BIGINT) AS users_to_80pct, "
    "CAST(MAX(total) AS BIGINT) AS total_events, "
    "CAST(MAX(n_users) AS BIGINT) AS n_users, "
    "printf('%.6f', ROUND(CAST(MIN(rnk) AS DOUBLE) / MAX(n_users), 6)) "
    " AS user_frac "
    "FROM r WHERE cum * 5 >= total * 4 "
    "GROUP BY event_type",
)
def events_pareto(spark, sf):
    """Pareto concentration report: per event type, the number of
    heaviest users whose combined volume first reaches 80% of that
    type's total — the workload-skew / whale-concentration metric that
    decides whether a key needs salting at scale.

    Scale shape: the per-(type, user) pre-aggregate is the only
    fact-scale exchange; the running sum + rank windows and the final
    rollup all key event_type over the already user-grained table.
    The 80% threshold is the exact integer cut cum*5 >= total*4
    (quantities are counts), so the boundary user is engine-exact;
    only the reported user fraction is a float, under ROUND + %.6f."""
    return pareto_rollup(type_user_counts(_events(spark, sf)))


def type_user_counts(df: DataFrame) -> DataFrame:
    """Per-(event_type, user) volume grain: a plain SUM-mergeable COUNT
    — the carried state that makes ``stream_pareto`` == batch a theorem
    about SUM for any micro-batch split."""
    return df.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def pareto_rollup(pu: DataFrame) -> DataFrame:
    """Fold the (event_type, user, cnt) grain into the Pareto
    concentration report — the ONE shared definition for the batch key
    and its streaming twin (the exact 80% integer cut lives here)."""
    wcum = (
        Window.partitionBy("event_type")
        .orderBy(F.desc("cnt"), F.asc("user_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    wrank = Window.partitionBy("event_type").orderBy(
        F.desc("cnt"), F.asc("user_id")
    )
    r = pu.select(
        "event_type",
        F.sum("cnt").over(wcum).alias("cum"),
        F.row_number().over(wrank).alias("rnk"),
        F.sum("cnt").over(wall).alias("total"),
        F.count(F.lit(1)).over(wall).alias("n_users"),
    ).filter(F.col("cum") * 5 >= F.col("total") * 4)
    return (
        r.groupBy("event_type")
        .agg(
            F.min("rnk").cast("long").alias("users_to_80pct"),
            F.max("total").cast("long").alias("total_events"),
            F.max("n_users").cast("long").alias("n_users"),
        )
        .select(
            "event_type",
            "users_to_80pct",
            "total_events",
            "n_users",
            _FMT6(
                F.col("users_to_80pct").cast("double") / F.col("n_users")
            ).alias("user_frac"),
        )
    )


@register(
    "events_concurrency",
    # Sweep-line concurrency: +1/-1 deltas at island starts/ends, one
    # ordered cumulative sum = number of simultaneously-active users
    # at every change point. Pure integer algebra.
    "WITH d AS (SELECT DISTINCT user_id, "
    "  date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_num "
    " FROM events), "
    "r AS (SELECT user_id, day_num, day_num - ROW_NUMBER() OVER ("
    "  PARTITION BY user_id ORDER BY day_num) AS anchor FROM d), "
    "isl AS (SELECT user_id, MIN(day_num) AS s, MAX(day_num) AS e "
    " FROM r GROUP BY user_id, anchor), "
    "delta AS (SELECT s AS day_num, 1 AS delta FROM isl "
    " UNION ALL SELECT e + 1, -1 FROM isl), "
    "g AS (SELECT day_num, SUM(delta) AS dd FROM delta GROUP BY day_num) "
    "SELECT CAST(day_num AS BIGINT) AS day_num, "
    "CAST(SUM(dd) OVER (ORDER BY day_num "
    " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
    " AS n_active FROM g",
)
def events_concurrency(spark, sf):
    """Concurrency sweep-line: how many users are simultaneously
    mid-streak at every change point — the interval-stabbing pattern
    (server sessions online, leases held, experiments running) built
    on the islands CTE: each activity run emits +1 at its start and
    -1 the day after it ends; one ordered cumulative sum is the
    active count.

    Scale shape: islands derive exactly as events_islands (one
    user-keyed exchange reused by the window and rollup); the deltas
    collapse to calendar grain BEFORE the global cumsum, so the one
    necessarily-global ordered window runs over a days-sized table —
    the sweep-line's whole point at 100 TB (never order the fact
    table, order the change points)."""
    d = (
        _events(spark, sf)
        .select(
            "user_id",
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01"))
            .cast("long")
            .alias("day_num"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day_num")
    isl = (
        d.withColumn("anchor", F.col("day_num") - F.row_number().over(w))
        .groupBy("user_id", "anchor")
        .agg(F.min("day_num").alias("s"), F.max("day_num").alias("e"))
    )
    delta = isl.select(
        F.col("s").alias("day_num"), F.lit(1).alias("delta")
    ).unionAll(
        isl.select((F.col("e") + 1).alias("day_num"), F.lit(-1).alias("delta"))
    )
    g = delta.groupBy("day_num").agg(F.sum("delta").alias("dd"))
    wcum = Window.orderBy("day_num").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return g.select(
        F.col("day_num").cast("long").alias("day_num"),
        F.sum("dd").over(wcum).cast("long").alias("n_active"),
    )


@register(
    "events_lifecycle",
    # Growth accounting: per activity week — new / retained /
    # resurrected counts, plus churned (active previous week, absent
    # this week). Weeks are exact integer epoch-week numbers; every
    # count derives from set algebra over the (user, week) grain.
    "WITH d AS (SELECT DISTINCT user_id, "
    "  CAST((dn - (dn % 7)) / 7 AS BIGINT) AS wk FROM ("
    "   SELECT user_id, date_diff('day', DATE '1970-01-01', "
    "    CAST(ts AS DATE)) AS dn FROM events)), "
    "f AS (SELECT user_id, MIN(wk) AS fw FROM d GROUP BY user_id), "
    "s AS (SELECT d.user_id, d.wk, "
    "  CASE WHEN d.wk = f.fw THEN 'new' "
    "   WHEN p.user_id IS NOT NULL THEN 'retained' "
    "   ELSE 'resurrected' END AS status "
    " FROM d JOIN f ON d.user_id = f.user_id "
    " LEFT JOIN d p ON p.user_id = d.user_id AND p.wk = d.wk - 1), "
    "act AS (SELECT wk, "
    "  SUM(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS n_new, "
    "  SUM(CASE WHEN status = 'retained' THEN 1 ELSE 0 END) AS n_retained, "
    "  SUM(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END) "
    "   AS n_resurrected FROM s GROUP BY wk), "
    "ch AS (SELECT d.wk + 1 AS wk, COUNT(*) AS n_churned "
    " FROM d LEFT JOIN d n ON n.user_id = d.user_id AND n.wk = d.wk + 1 "
    " WHERE n.user_id IS NULL GROUP BY d.wk + 1) "
    "SELECT act.wk, CAST(n_new AS BIGINT) AS n_new, "
    "CAST(n_retained AS BIGINT) AS n_retained, "
    "CAST(n_resurrected AS BIGINT) AS n_resurrected, "
    "CAST(COALESCE(ch.n_churned, 0) AS BIGINT) AS n_churned "
    "FROM act LEFT JOIN ch ON act.wk = ch.wk",
)
def events_lifecycle(spark, sf):
    """Growth accounting: the canonical user-lifecycle decomposition —
    per activity week, how many active users are NEW (first week
    ever), RETAINED (also active the previous week), RESURRECTED
    (returning after a gap), and how many CHURNED out of the previous
    week. The additive identity active(w) = new + retained +
    resurrected (and retained(w) = active(w-1) - churned(w)) is what
    every growth dashboard reconciles against; pytest pins both.

    Scale shape: everything reduces FIRST to the deduped (user, week)
    grain — one user-keyed exchange — then first-week, previous-week,
    and next-week lookups are all self-joins keyed user_id that reuse
    that partitioning; the rollups key week (weeks-sized). Weeks are
    exact integer epoch-week numbers ((dn - dn%7)/7 — the division is
    an exact multiple of 7, so the double result is exact on both
    engines); churn rows only surface on activity weeks (the
    act-driven left join), documented contract."""
    return lifecycle_rollup(user_weeks(_events(spark, sf)))


def user_weeks(df: DataFrame) -> DataFrame:
    """Deduped (user_id, epoch-week) activity grain — the ONLY
    state-bearing input of the lifecycle decomposition. Set union
    merges it exactly (distinct of unions == union of distincts),
    which is what makes ``stream_lifecycle`` == batch a theorem (the
    stream_dau / stream_islands state discipline)."""
    dn = F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01"))
    return df.select(
        "user_id",
        ((dn - dn % 7) / 7).cast("long").alias("wk"),
    ).distinct()


def lifecycle_rollup(d: DataFrame) -> DataFrame:
    """Fold the (user, week) grain into the growth-accounting table —
    the ONE SHARED definition used by the batch key and its streaming
    twin (first/previous/next-week lookups are user-keyed self-joins
    that reuse the grain's partitioning)."""
    f = d.groupBy("user_id").agg(F.min("wk").alias("fw"))
    p = d.select(F.col("user_id").alias("pu"), F.col("wk").alias("pw"))
    s = (
        d.join(f, "user_id")
        .join(
            p,
            (F.col("user_id") == F.col("pu"))
            & (F.col("pw") == F.col("wk") - 1),
            "left",
        )
        .select(
            "wk",
            F.when(F.col("wk") == F.col("fw"), "new")
            .when(F.col("pu").isNotNull(), "retained")
            .otherwise("resurrected")
            .alias("status"),
        )
    )
    act = s.groupBy("wk").agg(
        F.sum(F.when(F.col("status") == "new", 1).otherwise(0))
        .cast("long")
        .alias("n_new"),
        F.sum(F.when(F.col("status") == "retained", 1).otherwise(0))
        .cast("long")
        .alias("n_retained"),
        F.sum(F.when(F.col("status") == "resurrected", 1).otherwise(0))
        .cast("long")
        .alias("n_resurrected"),
    )
    nxt = d.select(F.col("user_id").alias("nu"), F.col("wk").alias("nw"))
    ch = (
        d.join(
            nxt,
            (F.col("user_id") == F.col("nu"))
            & (F.col("nw") == F.col("wk") + 1),
            "left_anti",
        )
        .groupBy((F.col("wk") + 1).alias("cwk"))
        .agg(F.count(F.lit(1)).alias("n_churned"))
    )
    return (
        act.join(ch, act["wk"] == ch["cwk"], "left")
        .select(
            "wk",
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce(F.col("n_churned"), F.lit(0))
            .cast("long")
            .alias("n_churned"),
        )
    )


# --------------------------------------------------------- stickiness ----

@register(
    "events_stickiness",
    # DAU/MAU stickiness per epoch-month: ratio of exact BIGINT counts
    # (sum of daily-distinct actives over monthly-distinct actives x
    # active days), ROUND(x,6)-then-%.6f per house rule — the division
    # is ONE correctly-rounded IEEE op on identical integers.
    "WITH du AS (SELECT DISTINCT user_id, "
    "  (EXTRACT(YEAR FROM ts) * 12 + EXTRACT(MONTH FROM ts) - 1) AS mo, "
    "  date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS dn "
    " FROM events), "
    "daily AS (SELECT mo, dn, CAST(COUNT(*) AS BIGINT) AS dau "
    " FROM du GROUP BY mo, dn), "
    "d AS (SELECT mo, CAST(SUM(dau) AS BIGINT) AS sum_dau, "
    "  CAST(COUNT(*) AS BIGINT) AS n_days FROM daily GROUP BY mo), "
    "m AS (SELECT mo, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau "
    " FROM du GROUP BY mo) "
    "SELECT CAST(d.mo AS BIGINT) AS mo, sum_dau, n_days, mau, "
    "printf('%.6f', ROUND(CAST(sum_dau AS DOUBLE) "
    " / CAST(n_days * mau AS DOUBLE), 6)) AS stickiness "
    "FROM d JOIN m ON d.mo = m.mo",
)
def events_stickiness(spark, sf):
    """DAU/MAU stickiness — the engagement ratio every product
    dashboard tracks: per epoch-month, average daily active users
    (over the month's ACTIVE days, documented contract) divided by
    monthly active users. 1.0 means every monthly user shows up every
    active day; the ratio is emitted as a %.6f string of the exact
    integer division (single IEEE op, identical on both engines).

    Scale shape: everything reduces FIRST to the deduped
    (user, month, day) grain — one user-keyed exchange, the stream_dau
    discipline — then both rollups (daily actives, monthly distinct
    actives) are month-keyed aggregates over that grain; output is
    months-sized. COUNT(DISTINCT user_id) partial-aggregates per month
    (Spark expands it to a two-phase exact distinct)."""
    return stickiness_rollup(user_month_days(_events(spark, sf)))


def user_month_days(df: DataFrame) -> DataFrame:
    """Deduped (user_id, epoch-month, day-number) activity grain — the
    ONLY state-bearing input of the stickiness ratio; set-union
    mergeable (the stream_dau discipline), which is what makes
    ``stream_stickiness`` == batch a theorem."""
    return df.select(
        "user_id",
        (F.year("ts") * 12 + F.month("ts") - 1).cast("long").alias("mo"),
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01")).alias(
            "dn"
        ),
    ).distinct()


def stickiness_rollup(du: DataFrame) -> DataFrame:
    """Fold the (user, month, day) grain into the per-month DAU/MAU
    table — the ONE SHARED definition used by the batch key and its
    streaming twin (the %.6f ratio contract lives here)."""
    daily = du.groupBy("mo", "dn").agg(
        F.count(F.lit(1)).cast("long").alias("dau")
    )
    d = daily.groupBy("mo").agg(
        F.sum("dau").cast("long").alias("sum_dau"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    m = du.groupBy("mo").agg(
        F.countDistinct("user_id").cast("long").alias("mau")
    )
    return d.join(m, "mo").select(
        "mo",
        "sum_dau",
        "n_days",
        "mau",
        _FMT6(
            F.col("sum_dau").cast("double")
            / (F.col("n_days") * F.col("mau")).cast("double")
        ).alias("stickiness"),
    )


# ------------------------------------------------------- changepoint ----

@register(
    "events_changepoint",
    # CUSUM structural-break location per event type, on EXACT integers:
    # the mean-centered cumulative sum S_k = sum_{i<=k}(x_i - tot/n) is
    # scaled by n so S_k = n*prefix_k - k*tot is an exact BIGINT; the
    # break is argmax |S_k| over interior positions k < n (earliest-day
    # tie-break). Only the two segment means are floats — each ONE
    # division of exact integers under ROUND-then-%.6f.
    "WITH d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, "
    " CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2), "
    "s AS (SELECT event_type, day, "
    " CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY day "
    "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pre, "
    " CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) "
    "  AS BIGINT) AS k, "
    " CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS tot, "
    " CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n "
    " FROM d), "
    "c AS (SELECT event_type, day, k, n, pre, tot, "
    " n * pre - k * tot AS s_k FROM s WHERE k < n), "
    "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type "
    " ORDER BY ABS(s_k) DESC, day) AS rn FROM c) "
    "SELECT event_type, day AS cp_day, n AS n_days, s_k AS cusum_scaled, "
    "printf('%.6f', ROUND(CAST(pre AS DOUBLE) / CAST(k AS DOUBLE), 6)) "
    " AS pre_mean, "
    "printf('%.6f', ROUND(CAST(tot - pre AS DOUBLE) "
    " / CAST(n - k AS DOUBLE), 6)) AS post_mean "
    "FROM r WHERE rn = 1",
)
def events_changepoint(spark, sf):
    """CUSUM change-point detection on each event type's daily-volume
    series — the structural-break locator behind incident attribution
    ("volume regime changed on day X"): the day k maximizing the
    absolute mean-centered cumulative sum, with the pre/post segment
    means quantifying the shift. Complements ``events_anomaly`` (which
    flags single outlier days; a level shift spreads z-scores thin but
    concentrates CUSUM at the break) and ``events_trend`` (a monotone
    drift has no single break).

    The statistic is kept EXACT: S_k = n*prefix_k - k*total is an
    integer (BIGINT-safe while days x per-type volume < 2^63 — at any
    realistic retention the day count is the small factor), so the
    argmax and its earliest-day tie-break can never be decided by a
    float; only the two reported segment means divide, each one
    correctly-rounded IEEE op under the shared ROUND/%.6f contract.
    Types with a single active day have no interior position and emit
    nothing (k < n filters all rows).

    Scale shape: facts collapse to the (event_type, day) grain in ONE
    map-side-combinable aggregation (shared ``daily_counts`` — what the
    streaming twin accumulates); both windows and the argmax rank run
    over the dimension-sized daily table (types x days), partitioned by
    event_type on one exchange."""
    return changepoint_rollup(daily_counts(_events(spark, sf)))


def changepoint_rollup(d: DataFrame) -> DataFrame:
    """Fold a (event_type, day, cnt) daily table into the one-row-per-
    type CUSUM break profile — shared by ``events_changepoint`` and its
    streaming twin (daily counts sum-merge exactly, so streaming ==
    batch is a theorem about SUM; the float contract lives here)."""
    wp = Window.partitionBy("event_type")
    wo = wp.orderBy("day")
    s = d.select(
        "event_type",
        "day",
        F.sum("cnt")
        .over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("pre"),
        F.row_number().over(wo).cast("long").alias("k"),
        F.sum("cnt").over(wp).cast("long").alias("tot"),
        F.count(F.lit(1)).over(wp).cast("long").alias("n"),
    )
    c = s.where(F.col("k") < F.col("n")).withColumn(
        "s_k", F.col("n") * F.col("pre") - F.col("k") * F.col("tot")
    )
    r = c.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(
                F.abs(F.col("s_k")).desc(), F.col("day")
            )
        ),
    )
    return r.where(F.col("rn") == 1).select(
        "event_type",
        F.col("day").alias("cp_day"),
        F.col("n").alias("n_days"),
        F.col("s_k").alias("cusum_scaled"),
        _FMT6(F.col("pre").cast("double") / F.col("k").cast("double")).alias(
            "pre_mean"
        ),
        _FMT6(
            (F.col("tot") - F.col("pre")).cast("double")
            / (F.col("n") - F.col("k")).cast("double")
        ).alias("post_mean"),
    )


# ----------------------------------------------------------- autocorr ----

@register(
    "events_autocorr",
    # Lag-1 autocorrelation of each type's daily-volume series from
    # EXACT integer moments: dev_i = n*x_i - sx is an exact BIGINT, the
    # products dev_i*dev_{i+1} and dev_i^2 are exact BIGINTs, and their
    # DECIMAL(38,0)/HUGEINT sums are exact integers both engines cast
    # to the SAME correctly-rounded double before the one division
    # under ROUND-then-%.6f.
    "WITH d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, "
    " CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2), "
    "s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
    " CAST(SUM(cnt) AS BIGINT) AS sx FROM d GROUP BY event_type), "
    "v AS (SELECT d.event_type, d.cnt * s.n - s.sx AS dev, "
    " LEAD(d.cnt * s.n - s.sx) OVER (PARTITION BY d.event_type "
    "  ORDER BY d.day) AS dev_next, s.n "
    " FROM d JOIN s ON s.event_type = d.event_type), "
    "a AS (SELECT event_type, MIN(n) AS n_days, "
    " SUM(CASE WHEN dev_next IS NOT NULL "
    "  THEN CAST(dev * dev_next AS DECIMAL(38,0)) "
    "  ELSE CAST(0 AS DECIMAL(38,0)) END) AS num, "
    " SUM(CAST(dev * dev AS DECIMAL(38,0))) AS den "
    " FROM v GROUP BY event_type) "
    "SELECT event_type, CAST(n_days AS BIGINT) AS n_days, "
    "printf('%.6f', ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6)) "
    " AS r1 FROM a WHERE den > 0 AND n_days >= 2",
)
def events_autocorr(spark, sf):
    """Lag-1 autocorrelation of each event type's daily-volume series —
    the serial-dependence diagnostic that separates momentum-driven
    series (yesterday predicts today, r1 near 1) from noise (r1 near
    0) and alternating load (r1 < 0); the statistic
    ``events_forecast``'s seasonal-naive baseline implicitly bets on.
    Standard ACF estimator: global-mean-centered products over adjacent
    observed days, normalized by the full sum of squares.

    Float discipline (the composed-op variant): deviations are scaled
    by n so dev_i = n*x_i - sx is an exact BIGINT; adjacent products
    and squares are exact BIGINTs (bounded by (days x max daily
    volume)^2 — document-scale safe), accumulated into DECIMAL(38,0)
    on Spark and HUGEINT on DuckDB — both exact integers that cast to
    the identical correctly-rounded double, so r1 is ONE IEEE division
    under the shared ROUND/%.6f contract. The n^2 scaling cancels in
    the ratio. Zero-variance or single-day types are excluded (r1
    undefined).

    Scale shape: one map-side-combinable fact collapse to the daily
    grain (shared ``daily_counts``), a broadcast join of the tiny
    per-type moment table back onto the daily table, one event_type
    window for the lag, one final dimension-sized aggregate."""
    return autocorr_rollup(daily_counts(_events(spark, sf)))


def autocorr_rollup(d: DataFrame) -> DataFrame:
    """Fold a (event_type, day, cnt) daily table into the per-type
    lag-1 autocorrelation — shared with the streaming twin (same
    sum-mergeable daily grain as ``changepoint_rollup``)."""
    s = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cnt").cast("long").alias("sx"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    v = (
        d.join(F.broadcast(s), "event_type")
        .withColumn("dev", F.col("cnt") * F.col("n") - F.col("sx"))
        .withColumn("dev_next", F.lead("dev").over(w))
    )
    a = v.groupBy("event_type").agg(
        F.min("n").alias("n_days"),
        F.sum(
            F.when(
                F.col("dev_next").isNotNull(),
                (F.col("dev") * F.col("dev_next")).cast("decimal(38,0)"),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("num"),
        F.sum((F.col("dev") * F.col("dev")).cast("decimal(38,0)")).alias(
            "den"
        ),
    )
    return a.where((F.col("den") > 0) & (F.col("n_days") >= 2)).select(
        "event_type",
        F.col("n_days").cast("long").alias("n_days"),
        _FMT6(
            F.col("num").cast("double") / F.col("den").cast("double")
        ).alias("r1"),
    )


# ---------------------------------------------------------------- srm ----

@register(
    "events_srm",
    # Sample-ratio-mismatch chi-square for the 50/50 hash split, per
    # event type: with two cells and expected t/2 each, the statistic
    # collapses to (na-nb)^2/t — ONE division of exact BIGINTs; the
    # 95% flag (chi2 > 3.841) is a pure integer cross-multiplication,
    # so no float ever decides it (3.841 is not dyadic).
    "WITH u AS (SELECT DISTINCT event_type, user_id, user_id % 2 "
    " AS variant FROM events), "
    "g AS (SELECT event_type, "
    " CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na, "
    " CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb "
    " FROM u GROUP BY event_type) "
    "SELECT event_type, na, nb, "
    "printf('%.6f', ROUND(CAST((na - nb) * (na - nb) AS DOUBLE) "
    " / CAST(na + nb AS DOUBLE), 6)) AS chi2, "
    "(na - nb) * (na - nb) * 1000 > 3841 * (na + nb) AS srm "
    "FROM g",
)
def events_srm(spark, sf):
    """Sample-ratio-mismatch guard — the validity check every
    experimentation platform runs BEFORE reading ``events_ab_test``'s
    z-test: if the 50/50 hash split's observed assignment counts differ
    more than chance allows (chi-square, 1 df), the experiment is
    corrupted and its effect estimate is meaningless. Uses the SAME
    user_id % 2 variant hash as events_ab_test, audited per event type
    (exposure counted once per distinct (type, user)).

    Float discipline: with two cells the chi-square collapses
    algebraically to (na-nb)^2/(na+nb) — numerator and denominator are
    exact BIGINTs, the reported chi2 is ONE correctly-rounded IEEE
    division under ROUND-then-%.6f, and the 95% significance flag
    avoids the non-dyadic 3.841 literal entirely via integer
    cross-multiplication ((na-nb)^2 * 1000 > 3841 * t).

    Scale shape: one distinct-reduce to the (type, user) exposure grain
    (user-keyed exchange, the module's co-partitioning), then a
    dimension-sized per-type rollup."""
    return srm_rollup(exposure_grain(_events(spark, sf)))


def exposure_grain(df: DataFrame) -> DataFrame:
    """Deduped (event_type, user_id) exposure grain — set-union
    mergeable (the stream_dau discipline), which is what makes
    ``stream_srm`` == batch a theorem."""
    return df.select("event_type", "user_id").distinct()


def srm_rollup(u: DataFrame) -> DataFrame:
    """Fold the exposure grain into the per-type SRM table — the ONE
    SHARED definition for the batch key and its streaming twin (the
    chi2/flag contract lives here)."""
    g = u.withColumn("variant", F.col("user_id") % 2).groupBy(
        "event_type"
    ).agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("long")
        .alias("na"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("long")
        .alias("nb"),
    )
    diff2 = (F.col("na") - F.col("nb")) * (F.col("na") - F.col("nb"))
    return g.select(
        "event_type",
        "na",
        "nb",
        _FMT6(
            diff2.cast("double") / (F.col("na") + F.col("nb")).cast("double")
        ).alias("chi2"),
        (diff2 * 1000 > 3841 * (F.col("na") + F.col("nb"))).alias("srm"),
    )


# -------------------------------------------------------------- cuped ----

@register(
    "events_cuped",
    # CUPED variance-reduced A/B effect: theta = cov(x,y)/var(x) from
    # EXACT pooled moments (n*sxy - sx*sy over n*sxx - sx^2, both
    # BIGINTs), pre-period covariate x and post-period metric y exact
    # per-user counts; raw and adjusted differences are FIXED IEEE op
    # chains (per-variant mean divisions, one theta multiply, one
    # subtract) spelled identically on both engines — the global-mean
    # terms cancel in the difference so no extra float enters.
    "WITH u AS (SELECT user_id, user_id % 2 AS variant, "
    " CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) "
    "  AS BIGINT) AS x, "
    " CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' "
    "  AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y "
    " FROM events GROUP BY 1), "
    "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
    " CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy, "
    " CAST(SUM(x * y) AS BIGINT) AS sxy, "
    " CAST(SUM(x * x) AS BIGINT) AS sxx FROM u), "
    "g AS (SELECT "
    " CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na, "
    " CAST(SUM(CASE WHEN variant = 0 THEN y ELSE 0 END) AS BIGINT) AS sya, "
    " CAST(SUM(CASE WHEN variant = 0 THEN x ELSE 0 END) AS BIGINT) AS sxa, "
    " CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb, "
    " CAST(SUM(CASE WHEN variant = 1 THEN y ELSE 0 END) AS BIGINT) AS syb, "
    " CAST(SUM(CASE WHEN variant = 1 THEN x ELSE 0 END) AS BIGINT) AS sxb "
    " FROM u) "
    "SELECT na, nb, "
    "printf('%.6f', ROUND(CAST(sya AS DOUBLE) / na "
    " - CAST(syb AS DOUBLE) / nb, 6)) AS raw_diff, "
    "printf('%.6f', ROUND(CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE) "
    " / CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE), 6)) AS theta, "
    "printf('%.6f', ROUND((CAST(sya AS DOUBLE) / na "
    "  - CAST(syb AS DOUBLE) / nb) "
    " - (CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE) "
    "    / CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE)) "
    "   * (CAST(sxa AS DOUBLE) / na - CAST(sxb AS DOUBLE) / nb), 6)) "
    " AS cuped_diff "
    "FROM g, m WHERE m.n * m.sxx > m.sx * m.sx",
)
def events_cuped(spark, sf):
    """CUPED variance-reduced experiment readout — the third member of
    the experimentation family (``events_ab_test`` estimates,
    ``events_srm`` validates, this key tightens): the post-period
    purchase-rate difference between hash variants, adjusted by each
    user's PRE-period activity (covariate x = events before the fixed
    Jan-16 cut; theta = cov(x,y)/var(x)). Pre-period behavior is
    unaffected by treatment, so subtracting theta*(xbar_a - xbar_b)
    removes covariate imbalance without biasing the effect — the
    Deng et al. 2013 estimator every large platform runs.

    Float discipline (composed-op variant): x, y and all five pooled
    moments are exact BIGINTs; theta is one division of exact
    integers, the raw and adjusted differences are fixed IEEE chains
    spelled identically on both engines, and the global-mean terms
    cancel algebraically in the difference so nothing else enters.
    Degenerate zero-variance covariates drop the row (exact integer
    comparison).

    Scale shape: ONE user-keyed fact aggregation to the per-user (x, y)
    grain (map-side combinable), then two one-row rollups over it and a
    1x1 join — facts are touched exactly once."""
    return cuped_rollup(user_xy(_events(spark, sf)))


def user_xy(df: DataFrame) -> DataFrame:
    """Per-user (x, y) CUPED grain: pre-period activity count and
    post-period purchase count under the fixed Jan-16 cut. Both are
    plain SUMs — exactly mergeable across micro-batches, which is what
    makes ``stream_cuped`` == batch a theorem."""
    cut = F.lit("2024-01-16").cast("timestamp")
    return df.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cut, 1).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(
            F.when(
                (F.col("ts") >= cut) & (F.col("event_type") == "purchase"),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("y"),
    )


def cuped_rollup(u0: DataFrame) -> DataFrame:
    """Fold the per-user (x, y) grain into the one-row CUPED readout —
    the ONE SHARED definition for the batch key and its streaming twin
    (the theta/diff float contract lives here)."""
    u = u0.withColumn("variant", F.col("user_id") % 2)
    # one fact pass: both one-row rollups read the checkpointed
    # user-grain table (index_inverted precedent)
    u = u.localCheckpoint()
    m = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    g = u.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("long")
        .alias("na"),
        F.sum(F.when(F.col("variant") == 0, F.col("y")).otherwise(0))
        .cast("long")
        .alias("sya"),
        F.sum(F.when(F.col("variant") == 0, F.col("x")).otherwise(0))
        .cast("long")
        .alias("sxa"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("long")
        .alias("nb"),
        F.sum(F.when(F.col("variant") == 1, F.col("y")).otherwise(0))
        .cast("long")
        .alias("syb"),
        F.sum(F.when(F.col("variant") == 1, F.col("x")).otherwise(0))
        .cast("long")
        .alias("sxb"),
    )
    j = g.crossJoin(m).where(
        F.col("n") * F.col("sxx") > F.col("sx") * F.col("sx")
    )
    raw = (
        F.col("sya").cast("double") / F.col("na")
        - F.col("syb").cast("double") / F.col("nb")
    )
    theta = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        )
    )
    xdiff = (
        F.col("sxa").cast("double") / F.col("na")
        - F.col("sxb").cast("double") / F.col("nb")
    )
    return j.select(
        "na",
        "nb",
        _FMT6(raw).alias("raw_diff"),
        _FMT6(theta).alias("theta"),
        _FMT6(raw - theta * xdiff).alias("cuped_diff"),
    )


@register(
    "events_did",
    # Difference-in-differences: variant x period cell means of exact
    # per-user purchase counts around the fixed Jan-16 cut. Every cell
    # sum and user count is an exact BIGINT; the four means are single
    # IEEE divisions and the DiD is a fixed chain of three subtractions
    # spelled identically on both engines (events_cuped discipline).
    "WITH u AS (SELECT user_id, user_id % 2 AS variant, "
    " CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' "
    "  AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS pre, "
    " CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' "
    "  AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS post "
    " FROM events GROUP BY 1, 2), "
    "g AS (SELECT "
    " CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na, "
    " CAST(SUM(CASE WHEN variant = 0 THEN pre ELSE 0 END) AS BIGINT) AS spa, "
    " CAST(SUM(CASE WHEN variant = 0 THEN post ELSE 0 END) AS BIGINT) AS sqa, "
    " CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb, "
    " CAST(SUM(CASE WHEN variant = 1 THEN pre ELSE 0 END) AS BIGINT) AS spb, "
    " CAST(SUM(CASE WHEN variant = 1 THEN post ELSE 0 END) AS BIGINT) AS sqb "
    " FROM u) "
    "SELECT na, nb, "
    "printf('%.6f', ROUND(CAST(spa AS DOUBLE) / na, 6)) AS pre_a, "
    "printf('%.6f', ROUND(CAST(sqa AS DOUBLE) / na, 6)) AS post_a, "
    "printf('%.6f', ROUND(CAST(spb AS DOUBLE) / nb, 6)) AS pre_b, "
    "printf('%.6f', ROUND(CAST(sqb AS DOUBLE) / nb, 6)) AS post_b, "
    "printf('%.6f', ROUND("
    " (CAST(sqa AS DOUBLE) / na - CAST(spa AS DOUBLE) / na) "
    " - (CAST(sqb AS DOUBLE) / nb - CAST(spb AS DOUBLE) / nb), 6)) AS did "
    "FROM g WHERE na > 0 AND nb > 0",
)
def events_did(spark, sf):
    """Difference-in-differences readout — the fourth member of the
    experimentation family (``events_ab_test`` tests, ``events_srm``
    validates the split, ``events_cuped`` tightens, this key removes
    SHARED time trends): the variant-0 post-minus-pre change in per-user
    purchase volume minus the variant-1 change around the fixed Jan-16
    cut. When both arms ride the same seasonality, the second difference
    cancels it — the standard quasi-experimental estimator for staged
    rollouts where randomization is imperfect.

    Float discipline: per-user pre/post purchase counts and all six cell
    sums are exact BIGINTs; the four means are single IEEE divisions and
    the DiD is a fixed three-subtraction chain spelled identically on
    both engines under ROUND/%.6f (events_cuped's composed-op rule).

    Scale shape: ONE user-keyed fact aggregation to the per-user
    (pre, post) grain (map-side combinable), then a one-row rollup —
    facts are touched exactly once."""
    u = user_prepost(_events(spark, sf))
    return did_rollup(u)


def user_prepost(df: DataFrame) -> DataFrame:
    """Per-user (variant, pre, post) purchase-count grain under the
    fixed Jan-16 cut. Plain SUMs — exactly mergeable across
    micro-batches (the ``stream_cuped`` state discipline), which is
    what makes a streaming twin == batch a theorem."""
    cut = F.lit("2024-01-16").cast("timestamp")
    is_p = F.col("event_type") == "purchase"
    return df.groupBy("user_id").agg(
        F.sum(F.when((F.col("ts") < cut) & is_p, 1).otherwise(0))
        .cast("long")
        .alias("pre"),
        F.sum(F.when((F.col("ts") >= cut) & is_p, 1).otherwise(0))
        .cast("long")
        .alias("post"),
    )


def did_rollup(u0: DataFrame) -> DataFrame:
    """Fold the per-user (pre, post) grain into the one-row DiD readout
    — the shared definition for the batch key and any streaming twin
    (the float contract lives here)."""
    u = u0.withColumn("variant", F.col("user_id") % 2)
    g = u.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("long")
        .alias("na"),
        F.sum(F.when(F.col("variant") == 0, F.col("pre")).otherwise(0))
        .cast("long")
        .alias("spa"),
        F.sum(F.when(F.col("variant") == 0, F.col("post")).otherwise(0))
        .cast("long")
        .alias("sqa"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("long")
        .alias("nb"),
        F.sum(F.when(F.col("variant") == 1, F.col("pre")).otherwise(0))
        .cast("long")
        .alias("spb"),
        F.sum(F.when(F.col("variant") == 1, F.col("post")).otherwise(0))
        .cast("long")
        .alias("sqb"),
    )
    mean = lambda s, n: F.col(s).cast("double") / F.col(n)  # noqa: E731
    did = (mean("sqa", "na") - mean("spa", "na")) - (
        mean("sqb", "nb") - mean("spb", "nb")
    )
    return g.where((F.col("na") > 0) & (F.col("nb") > 0)).select(
        "na",
        "nb",
        _FMT6(mean("spa", "na")).alias("pre_a"),
        _FMT6(mean("sqa", "na")).alias("post_a"),
        _FMT6(mean("spb", "nb")).alias("pre_b"),
        _FMT6(mean("sqb", "nb")).alias("post_b"),
        _FMT6(did).alias("did"),
    )


# z_{0.975} + z_{0.80}: the 5%-two-sided / 80%-power normal quantile
# sum, pinned as ONE double literal parsed identically by both engines
# (string -> double conversion is correctly rounded in both; a two-term
# literal sum would also constant-fold identically, but one literal
# removes the question).
_POWER_Z = "2.8015852181129683"


@register(
    "events_power",
    # Minimum detectable effect at 80% power / 5% two-sided for the
    # hash-split converter rates: counts are exact BIGINTs, and the MDE
    # is a fixed IEEE chain (divisions, one product, sqrt — all
    # correctly-rounded ops) spelled identically on both engines; the
    # z constant enters as one string->double cast. 'powered' compares
    # the two identically-computed doubles, so it is engine-stable.
    "WITH u AS (SELECT user_id, user_id % 2 AS variant, "
    " CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) "
    "  > 0 THEN 1 ELSE 0 END AS conv "
    " FROM events GROUP BY 1, 2), "
    "g AS (SELECT "
    " CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na, "
    " CAST(SUM(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS BIGINT) AS ca, "
    " CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb, "
    " CAST(SUM(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS BIGINT) AS cb "
    " FROM u) "
    "SELECT na, ca, nb, cb, "
    "printf('%.6f', ROUND(CAST(ca AS DOUBLE) / na "
    " - CAST(cb AS DOUBLE) / nb, 6)) AS diff, "
    f"printf('%.6f', ROUND(CAST('{_POWER_Z}' AS DOUBLE) * "
    " SQRT((CAST(ca + cb AS DOUBLE) / (na + nb)) * "
    "  (CAST(1 AS DOUBLE) - CAST(ca + cb AS DOUBLE) / (na + nb)) * "
    "  (CAST(1 AS DOUBLE) / na + CAST(1 AS DOUBLE) / nb)), 6)) AS mde, "
    f"ABS(CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb) > "
    f"CAST('{_POWER_Z}' AS DOUBLE) * "
    " SQRT((CAST(ca + cb AS DOUBLE) / (na + nb)) * "
    "  (CAST(1 AS DOUBLE) - CAST(ca + cb AS DOUBLE) / (na + nb)) * "
    "  (CAST(1 AS DOUBLE) / na + CAST(1 AS DOUBLE) / nb)) AS powered "
    "FROM g WHERE na > 0 AND nb > 0",
)
def events_power(spark, sf):
    """Power analysis for the hash-split experiment — the minimum
    detectable effect (MDE) on the ever-converted rate at 80% power and
    5% two-sided significance, next to the observed rate difference and
    a 'powered' flag (is the observed effect above what this sample
    size can reliably detect?). The design-time complement of
    ``events_ab_test``'s z-test: the z-test asks "is this difference
    real?", this key asks "could we even have seen it?" — the first
    dashboard every experimentation platform ships.

    Float discipline: all counts exact BIGINTs; MDE =
    z * sqrt(p_pool * (1 - p_pool) * (1/na + 1/nb)) where every op in
    the chain (divisions, products, SQRT) is a correctly-rounded IEEE
    operation spelled in the same order on both engines, and the z
    constant enters as one string->double cast (string conversion is
    correctly rounded in both engines; libm log/erf never appear).
    'powered' compares two identically-computed doubles.

    Scale shape: ONE user-keyed fact aggregation to the converted flag,
    then a one-row rollup — map-side combinable, facts touched once."""
    u = _events(spark, sf).groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv")
    )
    u = u.withColumn("variant", F.col("user_id") % 2)
    g = u.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("long")
        .alias("na"),
        F.sum(F.when(F.col("variant") == 0, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("long")
        .alias("nb"),
        F.sum(F.when(F.col("variant") == 1, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("cb"),
    )
    p = (F.col("ca") + F.col("cb")).cast("double") / (
        F.col("na") + F.col("nb")
    )
    diff = F.col("ca").cast("double") / F.col("na") - F.col("cb").cast(
        "double"
    ) / F.col("nb")
    z = F.lit(_POWER_Z).cast("double")
    mde = z * F.sqrt(
        p
        * (F.lit(1).cast("double") - p)
        * (
            F.lit(1).cast("double") / F.col("na")
            + F.lit(1).cast("double") / F.col("nb")
        )
    )
    return g.where((F.col("na") > 0) & (F.col("nb") > 0)).select(
        "na",
        "ca",
        "nb",
        "cb",
        _FMT6(diff).alias("diff"),
        _FMT6(mde).alias("mde"),
        (F.abs(diff) > mde).alias("powered"),
    )


# ---------------------------------------------- time-range window frame ----

@register(
    "win_frame_range_time",
    # Interval RANGE frame over a timestamp order: trailing-24h event
    # count per event, value-based (peers by ts), so the result is
    # frame-deterministic regardless of row order. Pure integer output.
    "SELECT event_id, user_id, "
    "CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts "
    " RANGE BETWEEN INTERVAL '1 day' PRECEDING AND CURRENT ROW) "
    " AS BIGINT) AS n_24h "
    "FROM events",
)
def win_frame_range_time(spark, sf):
    """Interval-bounded RANGE window frame — the time-based sibling of
    ``win_frame_range``'s numeric frame: each event's trailing-24-hour
    activity count for its user, the per-event rate-limit / burst
    signal (``events_rolling_dau`` answers the calendar-day variant at
    corpus grain; this is the exact sliding-window variant at event
    grain). RANGE frames bound by VALUE (ts - 24h), not row position,
    so ties are peer-grouped identically on both engines and the
    result is deterministic without any row-order tie-break.

    Scale shape: ONE user_id window exchange (the module's
    co-partitioning); the frame scan is the sliding two-pointer pass
    inside each ordered partition — no self-join materializes the
    window (a range self-join would square the per-user cost)."""
    return (
        _events(spark, sf)
        .select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"))
        .selectExpr(
            "event_id",
            "user_id",
            "CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 1 DAY PRECEDING AND CURRENT ROW) "
            "AS BIGINT) AS n_24h",
        )
    )


# ---------------------------------------------------------- MAD outliers ----

@register(
    "events_outlier_mad",
    # Median/MAD robust outliers on the daily-count series: integral
    # counts make the interpolated median dyadic-exact (multiples of
    # 0.5), absolute deviations dyadic, and the MAD dyadic (multiples
    # of 0.25) — every comparison including dev > 3*MAD is an EXACT
    # dyadic-double comparison, identical on both engines (the
    # agg_median integral-input rule). Zero-MAD types (over half the
    # days share the median count) flag every deviating day — the
    # documented degenerate contract.
    "WITH d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, "
    " CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2), "
    "m AS (SELECT event_type, quantile_cont(cnt, 0.5) AS med FROM d "
    " GROUP BY event_type), "
    "v AS (SELECT d.event_type, d.day, d.cnt, m.med, "
    " ABS(d.cnt - m.med) AS dev FROM d JOIN m "
    " ON m.event_type = d.event_type), "
    "s AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad FROM v "
    " GROUP BY event_type) "
    "SELECT v.event_type, v.day, v.cnt, "
    "printf('%.6f', ROUND(v.med, 6)) AS med, "
    "printf('%.6f', ROUND(s.mad, 6)) AS mad, "
    "v.dev > 3 * s.mad AS is_outlier "
    "FROM v JOIN s ON s.event_type = v.event_type",
)
def events_outlier_mad(spark, sf):
    """Median/MAD robust outlier detection on each type's daily-volume
    series — the breakdown-resistant complement of ``events_anomaly``'s
    z-score: one colossal day inflates the mean AND the standard
    deviation (masking itself and flagging normal days), while the
    median and the median-absolute-deviation ignore up to half the
    series being corrupted (50% breakdown point — why ops runbooks
    prefer MAD for burst detection). Flag: deviation > 3×MAD.

    Float discipline (the agg_median rule): integral daily counts make
    the interpolated median a dyadic-exact double (multiple of 0.5),
    deviations dyadic, the MAD dyadic (multiple of 0.25), so med/mad
    print exactly under %.6f and the 3×MAD comparison is an exact
    dyadic comparison — no rounding ever decides a flag. Zero-MAD
    types flag every deviating day (documented degenerate contract).

    Scale shape: one map-side-combinable fact collapse to the shared
    daily grain, then two dimension-sized aggregate+broadcast-join
    rounds (median, then MAD) over the types×days table."""
    return mad_rollup(daily_counts(_events(spark, sf)))


def mad_rollup(d: DataFrame) -> DataFrame:
    """Fold a (event_type, day, cnt) daily table into the median/MAD
    outlier profile — shared by ``events_outlier_mad`` and its
    streaming twin (the dyadic-exact float contract lives here)."""
    m = d.groupBy("event_type").agg(
        F.percentile("cnt", F.lit(0.5)).alias("med")
    )
    v = d.join(F.broadcast(m), "event_type").withColumn(
        "dev", F.abs(F.col("cnt") - F.col("med"))
    )
    s = v.groupBy("event_type").agg(
        F.percentile("dev", F.lit(0.5)).alias("mad")
    )
    return v.join(F.broadcast(s), "event_type").select(
        "event_type",
        "day",
        "cnt",
        F.format_string("%.6f", F.round(F.col("med"), 6)).alias("med"),
        F.format_string("%.6f", F.round(F.col("mad"), 6)).alias("mad"),
        (F.col("dev") > 3 * F.col("mad")).alias("is_outlier"),
    )


# ---------------------------------------------------------------- ewma ----

@register(
    "events_ewma",
    # Exponentially-weighted moving average with alpha = 1/2, computed
    # EXACTLY: s_1 = x_1, s_t = (x_t + s_{t-1})/2 — the identical
    # sequential op chain on both engines (Spark: ordered-array left
    # fold; oracle: a genuinely RECURSIVE CTE stepping the same
    # recurrence), so every intermediate double is bit-identical; for
    # this corpus's spans the values are exactly-representable dyadic
    # rationals, and beyond 53 fractional bits both engines round the
    # same op the same way.
    "WITH RECURSIVE d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') "
    " AS day, CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2), "
    "r AS (SELECT event_type, cnt, CAST(ROW_NUMBER() OVER ("
    " PARTITION BY event_type ORDER BY day) AS BIGINT) AS rn FROM d), "
    "e(event_type, rn, s) AS ("
    " SELECT event_type, rn, CAST(cnt AS DOUBLE) FROM r WHERE rn = 1 "
    " UNION ALL "
    " SELECT r.event_type, r.rn, (CAST(r.cnt AS DOUBLE) + e.s) / 2 "
    " FROM e JOIN r ON r.event_type = e.event_type AND r.rn = e.rn + 1), "
    "f AS (SELECT event_type, MAX(rn) AS mx FROM e GROUP BY 1) "
    "SELECT e.event_type, e.rn AS n_days, "
    "printf('%.6f', ROUND(e.s, 6)) AS ewma "
    "FROM e JOIN f ON f.event_type = e.event_type AND e.rn = f.mx",
)
def events_ewma(spark, sf):
    """Exponentially-weighted moving average of each type's daily
    volume (alpha = 1/2) — the smoothed 'current level' a monitoring
    dashboard draws and the operational complement of
    ``events_trend``'s global OLS slope (EWMA reacts to the recent
    regime; the slope averages the whole history). The recurrence is
    inherently sequential per series, and this key pins the
    DISTRIBUTED spelling of sequential-per-group: the series is
    dimension-sized (days per type), so each group's ordered values
    collapse into ONE row via sort_array(collect_list(...)) and the
    recurrence runs as a pure JVM ``aggregate`` left fold — no Python,
    no window over the global order, no driver loop. The oracle steps
    the identical recurrence in a genuinely recursive CTE, so
    agreement pins the fold order bit-for-bit.

    Float discipline: the fold executes the IDENTICAL op sequence as
    the oracle's recursion ((x + s)/2 per step), so every intermediate
    is bit-identical on both engines regardless of representability;
    on this corpus's 30-day, <=2^17-count series every intermediate is
    additionally an exactly-representable dyadic rational.

    Scale shape: one map-side-combinable fact collapse to the shared
    daily grain, one event_type exchange for the collect; the fold is
    O(days) per type — bounded by the calendar, never by facts."""
    return ewma_rollup(daily_counts(_events(spark, sf)))


def ewma_rollup(d: DataFrame) -> DataFrame:
    """Fold a (event_type, day, cnt) daily table into the per-type
    alpha=1/2 EWMA — shared by ``events_ewma`` and its streaming twin
    (the sorted-fold float contract lives here)."""
    arr = d.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "cnt"))).alias("a")
    )
    fold = F.expr(
        "aggregate(slice(a, 2, size(a) - 1), "
        "CAST(element_at(a, 1).cnt AS DOUBLE), "
        "(s, x) -> (CAST(x.cnt AS DOUBLE) + s) / 2)"
    )
    return arr.select(
        "event_type",
        F.size("a").cast("long").alias("n_days"),
        _FMT6(fold).alias("ewma"),
    )


@register(
    "macro_experiment_report",
    # One-row experiment readout composing the family's three shared
    # stages: exposure SRM guard (overall distinct users by variant),
    # the z-test estimate, and the CUPED-adjusted estimate — the same
    # exact-moments / fixed-IEEE-chain contracts as the per-key
    # oracles, composed.
    "WITH u AS (SELECT user_id, user_id % 2 AS variant, "
    " CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) "
    "  AS BIGINT) AS x, "
    " CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' "
    "  AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y, "
    " CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) "
    "  * 5 > COUNT(*) THEN 1 ELSE 0 END AS conv "
    " FROM events GROUP BY user_id), "
    "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
    " CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy, "
    " CAST(SUM(x * y) AS BIGINT) AS sxy, "
    " CAST(SUM(x * x) AS BIGINT) AS sxx FROM u), "
    "g AS (SELECT "
    " CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na, "
    " CAST(SUM(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS BIGINT) AS ca, "
    " CAST(SUM(CASE WHEN variant = 0 THEN y ELSE 0 END) AS BIGINT) AS sya, "
    " CAST(SUM(CASE WHEN variant = 0 THEN x ELSE 0 END) AS BIGINT) AS sxa, "
    " CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb, "
    " CAST(SUM(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS BIGINT) AS cb, "
    " CAST(SUM(CASE WHEN variant = 1 THEN y ELSE 0 END) AS BIGINT) AS syb, "
    " CAST(SUM(CASE WHEN variant = 1 THEN x ELSE 0 END) AS BIGINT) AS sxb "
    " FROM u) "
    "SELECT na, nb, "
    "(na - nb) * (na - nb) * 1000 > 3841 * (na + nb) AS srm, "
    "printf('%.6f', ROUND(CAST(ca AS DOUBLE) / na "
    " - CAST(cb AS DOUBLE) / nb, 6)) AS rate_diff, "
    "printf('%.6f', ROUND(CAST(sya AS DOUBLE) / na "
    " - CAST(syb AS DOUBLE) / nb, 6)) AS raw_diff, "
    "printf('%.6f', ROUND((CAST(sya AS DOUBLE) / na "
    "  - CAST(syb AS DOUBLE) / nb) "
    " - (CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE) "
    "    / CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE)) "
    "   * (CAST(sxa AS DOUBLE) / na - CAST(sxb AS DOUBLE) / nb), 6)) "
    " AS cuped_diff "
    "FROM g, m WHERE m.n * m.sxx > m.sx * m.sx",
)
def macro_experiment_report(spark, sf):
    """One-row experiment readout — the report an experimentation
    platform actually publishes, composing the family in one pass:
    the overall SRM validity flag (is the 50/50 split intact), the
    conversion-rate difference (``events_ab_test``'s estimate), and
    the CUPED variance-reduced purchase-count difference
    (``events_cuped``'s estimate) — all from ONE user-grain
    aggregation, so facts are scanned once for the whole report
    (the macro_data_prep composition discipline applied to the
    experiment family).

    Float discipline: identical to the per-key contracts — exact
    BIGINT moments, fixed IEEE division/multiply chains, the SRM flag
    as a pure integer cross-multiply. A green oracle row pins the
    COMPOSITION of the three analyses over one shared grain.

    Scale shape: one user-keyed fact aggregation (map-side
    combinable, localCheckpointed so the three rollups share it), two
    one-row aggregates, a 1x1 join."""
    cut = F.lit("2024-01-16").cast("timestamp")
    u = _events(spark, sf).groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cut, 1).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(
            F.when(
                (F.col("ts") >= cut) & (F.col("event_type") == "purchase"),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("y"),
        F.when(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            * 5
            > F.count(F.lit(1)),
            1,
        )
        .otherwise(0)
        .alias("conv"),
    ).withColumn("variant", F.col("user_id") % 2).localCheckpoint()
    m = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )

    def side(v, col):
        return (
            F.sum(F.when(F.col("variant") == v, F.col(col)).otherwise(0))
            .cast("long")
        )

    g = u.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("long")
        .alias("na"),
        side(0, "conv").alias("ca"),
        side(0, "y").alias("sya"),
        side(0, "x").alias("sxa"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("long")
        .alias("nb"),
        side(1, "conv").alias("cb"),
        side(1, "y").alias("syb"),
        side(1, "x").alias("sxb"),
    )
    j = g.crossJoin(m).where(
        F.col("n") * F.col("sxx") > F.col("sx") * F.col("sx")
    )
    diff2 = (F.col("na") - F.col("nb")) * (F.col("na") - F.col("nb"))
    rate = (
        F.col("ca").cast("double") / F.col("na")
        - F.col("cb").cast("double") / F.col("nb")
    )
    raw = (
        F.col("sya").cast("double") / F.col("na")
        - F.col("syb").cast("double") / F.col("nb")
    )
    theta = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        )
    )
    xdiff = (
        F.col("sxa").cast("double") / F.col("na")
        - F.col("sxb").cast("double") / F.col("nb")
    )
    return j.select(
        "na",
        "nb",
        (diff2 * 1000 > 3841 * (F.col("na") + F.col("nb"))).alias("srm"),
        _FMT6(rate).alias("rate_diff"),
        _FMT6(raw).alias("raw_diff"),
        _FMT6(raw - theta * xdiff).alias("cuped_diff"),
    )


# ------------------------------------------------- concentration (gini) ----

@register(
    "events_concentration",
    # Inequality/concentration profile per event type over per-user
    # volumes: Gini via the exact rank-weighted identity
    # G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) with x ascending
    # (the sum is invariant under permutations within tied x, so any
    # total order gives the same integer), and HHI = sum(x^2)/sum(x)^2.
    # Every moment is an exact BIGINT; each reported float is ONE
    # correctly-rounded IEEE division under ROUND + %.6f.
    "WITH pu AS (SELECT event_type, user_id, "
    "  CAST(COUNT(*) AS BIGINT) AS cnt "
    " FROM events GROUP BY event_type, user_id), "
    "r AS (SELECT event_type, cnt, "
    "  ROW_NUMBER() OVER (PARTITION BY event_type "
    "   ORDER BY cnt, user_id) AS i FROM pu), "
    "g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users, "
    "  CAST(SUM(cnt) AS BIGINT) AS total_events, "
    "  CAST(SUM(i * cnt) AS BIGINT) AS s_rank, "
    "  CAST(SUM(cnt * cnt) AS BIGINT) AS s_sq "
    " FROM r GROUP BY event_type) "
    "SELECT event_type, n_users, total_events, "
    "printf('%.6f', ROUND(CAST(2 * s_rank - (n_users + 1) * total_events "
    " AS DOUBLE) / CAST(n_users * total_events AS DOUBLE), 6)) AS gini, "
    "printf('%.6f', ROUND(CAST(s_sq AS DOUBLE) "
    " / CAST(total_events * total_events AS DOUBLE), 6)) AS hhi "
    "FROM g",
)
def events_concentration(spark, sf):
    """Volume-concentration profile per event type: the Gini
    coefficient and Herfindahl-Hirschman index of per-user event
    volumes — the two standard inequality readouts a platform tracks
    next to ``events_pareto``'s whale cut (Gini summarizes the whole
    Lorenz curve the Pareto key samples at 80%; HHI is the
    market-concentration view). Reuses the SAME sum-mergeable
    (type, user, cnt) grain as the Pareto/stream keys.

    Float discipline: Gini uses the rank-weighted identity
    (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over ascending x — the
    rank sum is PERMUTATION-INVARIANT within tied volumes, so the
    (cnt, user_id) tie-break pins determinism without affecting the
    value; all four moments are exact BIGINTs and each output float is
    one IEEE division under ROUND + %.6f. (At 100 TB the squared and
    rank-weighted sums move to DECIMAL(38,0) — i*x_i here is bounded
    by users x max-volume, far inside BIGINT.)

    Scale shape: ONE fact-scale exchange to the (type, user) grain,
    a rank window and rollup over the user-grained table keyed
    event_type — same co-partitioning as the rest of the module."""
    pu = type_user_counts(_events(spark, sf))
    wrank = Window.partitionBy("event_type").orderBy(
        F.asc("cnt"), F.asc("user_id")
    )
    r = pu.select(
        "event_type",
        "cnt",
        F.row_number().over(wrank).cast("long").alias("i"),
    )
    g = r.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("cnt").cast("long").alias("total_events"),
        F.sum(F.col("i") * F.col("cnt")).cast("long").alias("s_rank"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("s_sq"),
    )
    gini = (
        (2 * F.col("s_rank") - (F.col("n_users") + 1) * F.col("total_events"))
        .cast("double")
        / (F.col("n_users") * F.col("total_events")).cast("double")
    )
    hhi = F.col("s_sq").cast("double") / (
        F.col("total_events") * F.col("total_events")
    ).cast("double")
    return g.select(
        "event_type",
        "n_users",
        "total_events",
        _FMT6(gini).alias("gini"),
        _FMT6(hhi).alias("hhi"),
    )


# ------------------------------------------- two-sample tests (KS, MWU) ----

def value_counts_by_variant(df: DataFrame) -> DataFrame:
    """Per-(cents, variant) purchase-amount counts — the shared grain
    for the two-sample distribution tests (``events_ks_test``,
    ``events_mann_whitney``). Amounts bin to exact integer cents via
    floor(value*100) — one IEEE multiply + exact floor on the same
    parquet doubles, so both engines bin identically. Counts are plain
    SUMs: exactly mergeable across micro-batches, which is what makes
    streaming twins of these tests theorems about SUM."""
    p = df.filter(F.col("event_type") == "purchase")
    return (
        p.select(
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
            (F.col("user_id") % 2).alias("variant"),
        )
        .groupBy("cents")
        .agg(
            F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
            .cast("long")
            .alias("c0"),
            F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
            .cast("long")
            .alias("c1"),
        )
    )


_VC_SQL = (
    "SELECT CAST(FLOOR(value * 100) AS BIGINT) AS cents, "
    " CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0, "
    " CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1 "
    "FROM events WHERE event_type = 'purchase' GROUP BY 1"
)


@register(
    "events_ks_test",
    # Two-sample Kolmogorov-Smirnov on purchase amounts between the
    # hash variants: D = max |F0 - F1| computed ENTIRELY in integers
    # (|cum0*n1 - cum1*n0| over the binned-value grain), one final
    # division; the 95% flag cross-multiplies against the squared
    # Smirnov critical value 1.358 in HUGEINT/DECIMAL(38,0) so the
    # non-dyadic constant never decides through a float.
    f"WITH vc AS ({_VC_SQL}), "
    "t AS (SELECT CAST(SUM(c0) AS BIGINT) AS n0, "
    " CAST(SUM(c1) AS BIGINT) AS n1 FROM vc), "
    "c AS (SELECT cents, "
    "  SUM(c0) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING "
    "   AND CURRENT ROW) AS cum0, "
    "  SUM(c1) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING "
    "   AND CURRENT ROW) AS cum1 FROM vc), "
    "d AS (SELECT c.cents, ABS(cum0 * n1 - cum1 * n0) AS dnum "
    " FROM c, t), "
    "m AS (SELECT CAST(MIN(cents) AS BIGINT) AS at_cents, "
    "  CAST(MAX(dm) AS BIGINT) AS d_num FROM "
    "  (SELECT cents, dnum, MAX(dnum) OVER () AS dm FROM d) "
    "  WHERE dnum = dm) "
    "SELECT n0, n1, d_num, at_cents, "
    "printf('%.6f', ROUND(CAST(d_num AS DOUBLE) "
    " / CAST(n0 * n1 AS DOUBLE), 6)) AS ks_d, "
    "CAST(d_num AS HUGEINT) * d_num * 1000000 > "
    " CAST(1844164 AS HUGEINT) * (n0 + n1) * n0 * n1 AS significant_95 "
    "FROM m, t",
)
def events_ks_test(spark, sf):
    """Two-sample Kolmogorov-Smirnov test: does the purchase-amount
    DISTRIBUTION differ between the 50/50 hash variants? Complements
    the mean-difference keys (``events_ab_test`` tests the mean,
    ``events_cuped`` tightens it): KS detects variance/shape shifts a
    t-test misses. D = max over binned amounts of |ECDF0 - ECDF1|,
    with the argmax bin reported (smallest bin on ties).

    Float discipline: the ECDF difference is the exact integer
    |cum0*n1 - cum1*n0| (cross-multiplied to the common n0*n1
    denominator), its max and argmax are integer comparisons, the
    reported D is ONE IEEE division under ROUND + %.6f, and the
    alpha=0.05 flag squares the Smirnov critical value
    c(0.05)=1.358 into the integer inequality
    d_num^2 * 10^6 > 1358^2 * (n0+n1) * n0 * n1 evaluated in
    DECIMAL(38,0)/HUGEINT — the non-dyadic constant never meets a
    float.

    Scale shape: one fact-scale aggregation to the bounded
    cents-grain (price-domain sized, the events_concurrency
    discipline), one ordered cumsum window over that dimension table,
    a one-row max and a 1x1 join."""
    vc = value_counts_by_variant(_events(spark, sf)).localCheckpoint()
    return ks_rollup(vc)


def ks_rollup(vc: DataFrame) -> DataFrame:
    """Fold the (cents, c0, c1) grain into the one-row KS readout —
    shared by ``events_ks_test`` and its streaming twin (the grain is
    plain SUMs, so the twin is a theorem about SUM)."""
    t = vc.agg(
        F.sum("c0").cast("long").alias("n0"),
        F.sum("c1").cast("long").alias("n1"),
    )
    wcum = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = vc.select(
        "cents",
        F.sum("c0").over(wcum).alias("cum0"),
        F.sum("c1").over(wcum).alias("cum1"),
    )
    d = c.crossJoin(t.select("n0", "n1")).select(
        "cents",
        F.abs(
            F.col("cum0") * F.col("n1") - F.col("cum1") * F.col("n0")
        ).alias("dnum"),
    )
    m = (
        d.withColumn("dm", F.max("dnum").over(Window.partitionBy()))
        .filter(F.col("dnum") == F.col("dm"))
        .agg(
            F.min("cents").cast("long").alias("at_cents"),
            F.max("dm").cast("long").alias("d_num"),
        )
    )
    big = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    out = m.crossJoin(t)
    return out.select(
        "n0",
        "n1",
        "d_num",
        "at_cents",
        _FMT6(
            F.col("d_num").cast("double")
            / (F.col("n0") * F.col("n1")).cast("double")
        ).alias("ks_d"),
        (
            big(F.col("d_num")) * F.col("d_num") * F.lit(1000000)
            > big(F.lit(1844164))
            * (F.col("n0") + F.col("n1"))
            * F.col("n0")
            * F.col("n1")
        ).alias("significant_95"),
    )


@register(
    "events_mann_whitney",
    # Mann-Whitney U (rank-sum) on purchase amounts between the hash
    # variants, with midrank tie handling: 2*R0 = sum over bins of
    # c0*(2*B + c + 1) is an exact BIGINT (B = bins-before cumsum,
    # c = bin total), so U0 = (2R0 - n0(n0+1))/2 is exact dyadic; the
    # AUC effect size is one division of exact integers, and the
    # tie-corrected normal z is a FIXED IEEE chain spelled identically
    # on both engines.
    f"WITH vc AS ({_VC_SQL}), "
    "t AS (SELECT CAST(SUM(c0) AS BIGINT) AS n0, "
    " CAST(SUM(c1) AS BIGINT) AS n1, "
    " CAST(SUM((c0 + c1) * (c0 + c1) * (c0 + c1) - (c0 + c1)) AS BIGINT) "
    "  AS tie3 FROM vc), "
    "c AS (SELECT cents, c0, c0 + c1 AS c, "
    "  COALESCE(SUM(c0 + c1) OVER (ORDER BY cents "
    "   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b "
    "  FROM vc), "
    "r AS (SELECT CAST(SUM(c0 * (2 * b + c + 1)) AS BIGINT) AS r0x2 FROM c) "
    "SELECT n0, n1, "
    "CAST(r0x2 - n0 * (n0 + 1) AS BIGINT) AS u0_x2, "
    "CAST(2 * n0 * n1 - (r0x2 - n0 * (n0 + 1)) AS BIGINT) AS u1_x2, "
    "printf('%.6f', ROUND(CAST(r0x2 - n0 * (n0 + 1) AS DOUBLE) "
    " / CAST(2 * n0 * n1 AS DOUBLE), 6)) AS auc, "
    "printf('%.6f', ROUND("
    " (CAST(r0x2 - n0 * (n0 + 1) AS DOUBLE) / 2.0 "
    "  - CAST(n0 * n1 AS DOUBLE) / 2.0) "
    " / sqrt(CAST(n0 * n1 AS DOUBLE) / 12.0 "
    "   * (CAST(n0 + n1 + 1 AS DOUBLE) - CAST(tie3 AS DOUBLE) "
    "      / CAST((n0 + n1) * (n0 + n1 - 1) AS DOUBLE))), 6)) AS z "
    "FROM r, t",
)
def events_mann_whitney(spark, sf):
    """Mann-Whitney U rank-sum test on purchase amounts between the
    hash variants — the NONPARAMETRIC counterpart of
    ``events_ab_test``'s z-test (robust to the heavy-tailed amounts a
    mean-based test is hostage to), with midrank tie handling over the
    binned-cents grain and the AUC / common-language effect size
    (P(amount_A > amount_B) + 0.5*P(=)).

    Float discipline: with B = count of values in earlier bins and
    c = bin size, the midrank of a bin is B + (c+1)/2, so
    2*R0 = sum(c0*(2B+c+1)) is an exact BIGINT; u0_x2/u1_x2 are exact
    integers (doubled to stay integral), AUC = u0_x2/(2*n0*n1) is one
    IEEE division, and the tie-corrected z spells ONE fixed
    chain — (U0 - n0*n1/2) / sqrt(n0*n1/12 * ((n+1) - tie3/(n(n-1))))
    — identically on both engines (divisions and sqrt are all
    correctly-rounded, so identical op trees give identical bits).
    (At 100 TB the rank-weighted sums move to DECIMAL(38,0).)

    Scale shape: same bounded cents-grain as ``events_ks_test`` (one
    fact-scale aggregation, sum-mergeable), one ordered window over
    the dimension-sized grain, two one-row rollups."""
    vc = value_counts_by_variant(_events(spark, sf)).localCheckpoint()
    return mwu_rollup(vc)


def mwu_rollup(vc: DataFrame) -> DataFrame:
    """Fold the (cents, c0, c1) grain into the one-row Mann-Whitney
    readout — shared by ``events_mann_whitney`` and its streaming twin
    (the grain is plain SUMs, so the twin is a theorem about SUM)."""
    t = vc.agg(
        F.sum("c0").cast("long").alias("n0"),
        F.sum("c1").cast("long").alias("n1"),
        F.sum(
            (F.col("c0") + F.col("c1"))
            * (F.col("c0") + F.col("c1"))
            * (F.col("c0") + F.col("c1"))
            - (F.col("c0") + F.col("c1"))
        )
        .cast("long")
        .alias("tie3"),
    )
    wprev = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, -1
    )
    c = vc.select(
        "c0",
        (F.col("c0") + F.col("c1")).alias("c"),
        F.coalesce(
            F.sum(F.col("c0") + F.col("c1")).over(wprev), F.lit(0)
        ).alias("b"),
    )
    r = c.agg(
        F.sum(F.col("c0") * (2 * F.col("b") + F.col("c") + 1))
        .cast("long")
        .alias("r0x2")
    )
    j = r.crossJoin(t)
    u0x2 = F.col("r0x2") - F.col("n0") * (F.col("n0") + 1)
    half = lambda col: col.cast("double") / F.lit(2.0)  # noqa: E731
    var = (F.col("n0") * F.col("n1")).cast("double") / F.lit(12.0) * (
        (F.col("n0") + F.col("n1") + 1).cast("double")
        - F.col("tie3").cast("double")
        / (
            (F.col("n0") + F.col("n1"))
            * (F.col("n0") + F.col("n1") - 1)
        ).cast("double")
    )
    z = (half(u0x2) - half(F.col("n0") * F.col("n1"))) / F.sqrt(var)
    return j.select(
        "n0",
        "n1",
        u0x2.cast("long").alias("u0_x2"),
        (2 * F.col("n0") * F.col("n1") - u0x2).cast("long").alias("u1_x2"),
        _FMT6(
            u0x2.cast("double")
            / (2 * F.col("n0") * F.col("n1")).cast("double")
        ).alias("auc"),
        _FMT6(z).alias("z"),
    )


# ------------------------------------------------ Kaplan-Meier survival ----

def conversion_spans(df: DataFrame) -> DataFrame:
    """Per-user (first_event_ts, first_purchase_ts) — the shared grain
    for ``events_survival``. Both are plain MINs, so the state is
    exactly mergeable across micro-batches (the stream_funnel
    first-touch discipline applied to time-to-convert)."""
    return df.groupBy("user_id").agg(
        F.min("ts").alias("fe"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "pt"
        ),
    )


def survival_steps(u: DataFrame, horizon_hours: int = 48) -> DataFrame:
    """Per-duration (dur, d, n) event-time steps under the shared
    censoring rule — the common front half of ``km_rollup`` (product
    fold) and ``na_rollup`` (additive fold): administrative cutoff,
    exact integer-hour durations, deaths, and the at-risk reverse
    cumulative sum."""
    mn = u.agg(F.min("fe").alias("t0")).select(
        (F.col("t0") + F.expr(f"INTERVAL {horizon_hours} HOURS")).alias("cut")
    )
    death = F.col("pt").isNotNull() & (F.col("pt") <= F.col("cut"))
    dur = F.when(
        death,
        F.expr("(unix_micros(CAST(pt AS TIMESTAMP)) - unix_micros(CAST(fe AS TIMESTAMP))) div 3600000000"),
    ).otherwise(
        F.expr("(unix_micros(CAST(cut AS TIMESTAMP)) - unix_micros(CAST(fe AS TIMESTAMP))) div 3600000000")
    )
    spans = (
        u.crossJoin(F.broadcast(mn))
        .filter(F.col("fe") <= F.col("cut"))
        .select(dur.cast("long").alias("dur"), death.alias("death"))
    )
    g = spans.groupBy("dur").agg(
        F.sum(F.when(F.col("death"), 1).otherwise(0)).cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("dc"),
    )
    wrev = Window.orderBy(F.desc("dur")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return g.select(
        "dur", "d", F.sum("dc").over(wrev).cast("long").alias("n")
    ).filter(F.col("d") > 0)


def km_rollup(u: DataFrame, horizon_hours: int = 48) -> DataFrame:
    """Fold a per-user (fe, pt) conversion-span table into the
    Kaplan-Meier time-to-first-purchase curve under an administrative
    cutoff ``horizon_hours`` after the corpus start — the censoring
    rule, the at-risk reverse cumsum, and the exact sequential product
    fold all live here (shared with any streaming twin)."""
    steps = survival_steps(u, horizon_hours)
    arr = steps.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("dur"), F.col("n"), F.col("d")))
        ).alias("a")
    )
    folded = arr.select(
        F.expr(
            "slice(aggregate(a, "
            "array(named_struct('dur', CAST(-1 AS BIGINT), "
            " 'n', CAST(0 AS BIGINT), 'd', CAST(0 AS BIGINT), "
            " 's', CAST(1.0 AS DOUBLE))), "
            "(acc, x) -> acc || array(named_struct("
            " 'dur', x.dur, 'n', x.n, 'd', x.d, "
            " 's', element_at(acc, -1).s "
            "      * (CAST(x.n - x.d AS DOUBLE) / CAST(x.n AS DOUBLE))"
            "))), 2, size(a))"
        ).alias("k")
    )
    r = folded.select(F.explode("k").alias("r"))
    return r.select(
        F.col("r.dur").alias("dur_hours"),
        F.col("r.n").alias("at_risk"),
        F.col("r.d").alias("deaths"),
        _FMT6(F.col("r.s")).alias("survival"),
    )


@register(
    "events_survival",
    # Kaplan-Meier time-to-first-purchase with administrative right
    # censoring at 48 hours after corpus start (users not yet
    # converted by the cutoff are censored at it — real censoring at
    # BOTH test SFs). Durations are exact integer hour buckets from
    # microsecond integers (floor-div on non-negative diffs, never a
    # float epoch); deaths and at-risk counts exact (at-risk = a
    # REVERSE cumsum, no total-row join); the survival product
    # S_i = S_{i-1} * ((n_i - d_i)/n_i) runs as the events_ewma
    # sorted-array JVM fold, oracled by a recursive CTE stepping the
    # IDENTICAL op chain (1.0 * x == x exactly, so the base case
    # elides the seed multiply on both engines).
    "WITH RECURSIVE u AS (SELECT user_id, MIN(ts) AS fe, "
    "  MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS pt "
    " FROM events GROUP BY user_id), "
    "c AS (SELECT MIN(fe) + INTERVAL 48 HOUR AS cut FROM u), "
    "sp AS (SELECT CASE WHEN pt IS NOT NULL AND pt <= cut "
    "   THEN (epoch_us(pt) - epoch_us(fe)) // 3600000000 "
    "   ELSE (epoch_us(cut) - epoch_us(fe)) // 3600000000 END AS dur, "
    "  (pt IS NOT NULL AND pt <= cut) AS death "
    " FROM u, c WHERE fe <= cut), "
    "g AS (SELECT CAST(dur AS BIGINT) AS dur, "
    "  CAST(SUM(CASE WHEN death THEN 1 ELSE 0 END) AS BIGINT) AS d, "
    "  CAST(COUNT(*) AS BIGINT) AS dc FROM sp GROUP BY 1), "
    "r0 AS (SELECT dur, d, CAST(SUM(dc) OVER (ORDER BY dur DESC "
    "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n "
    " FROM g), "
    "r AS (SELECT dur, n, d, CAST(ROW_NUMBER() OVER (ORDER BY dur) "
    "  AS BIGINT) AS rn FROM r0 WHERE d > 0), "
    "k(rn, dur, n, d, s) AS ("
    " SELECT rn, dur, n, d, "
    "  (CAST(n - d AS DOUBLE) / CAST(n AS DOUBLE)) FROM r WHERE rn = 1 "
    " UNION ALL "
    " SELECT r.rn, r.dur, r.n, r.d, "
    "  k.s * (CAST(r.n - r.d AS DOUBLE) / CAST(r.n AS DOUBLE)) "
    " FROM k JOIN r ON r.rn = k.rn + 1) "
    "SELECT dur AS dur_hours, n AS at_risk, d AS deaths, "
    "printf('%.6f', ROUND(s, 6)) AS survival FROM k",
)
def events_survival(spark, sf):
    """Kaplan-Meier survival curve for time-to-first-purchase: hours
    from a user's first event to their first purchase, right-censored
    for users not yet converted at the administrative cutoff (48 hours
    after the corpus's first event). THE standard way to read
    conversion latency without the 'drop the non-converters' bias a
    naive latency histogram bakes in — censored users keep
    contributing to the at-risk denominators up to their observed
    span. Complements ``events_funnel_window``'s fixed-window rates
    with the full time-resolved curve.

    Float discipline: durations are exact integer hour buckets
    computed by floor-dividing microsecond-integer differences
    (non-negative, so floor == truncate on both engines — never a
    float epoch); deaths / at-risk are exact integers (at-risk is a
    REVERSE cumulative sum ordered by duration descending); each
    survival step multiplies the previous value by one exact-cast
    integer ratio — the identical (cast, cast, divide, multiply) op
    chain on both engines via the events_ewma fold-vs-recursive-CTE
    pattern, so every intermediate double is bit-identical (the seed
    1.0 multiply is elided on both sides since 1.0*x == x in
    IEEE-754).

    Scale shape: one map-side-combinable fact collapse to the user
    grain (two MINs — exactly mergeable), a broadcast one-row cutoff,
    a duration-grain rollup (horizon-bounded: <= 48 rows), one window
    and one single-row fold over that dimension table — facts are
    touched once."""
    return km_rollup(conversion_spans(_events(spark, sf)))


# ---------------------------------------------- Spearman rank correlation --

@register(
    "events_spearman",
    # Spearman rank correlation between per-user view and purchase
    # volumes, with midrank tie handling computed EXACTLY: the doubled
    # midrank of every user sharing value v is 2*cum(v) - cnt(v) + 1
    # (an integer), so all five moments are exact BIGINTs and rho is
    # the fixed IEEE chain cast/sqrt/sqrt/multiply/divide — sqrt is
    # correctly rounded by IEEE-754, so both engines agree bit-for-bit.
    "WITH pu AS (SELECT user_id, "
    "  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) "
    "   AS BIGINT) AS a, "
    "  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) "
    "   AS BIGINT) AS b FROM events GROUP BY user_id), "
    "ga AS (SELECT a, 2 * SUM(COUNT(*)) OVER (ORDER BY a "
    "   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
    "  - COUNT(*) + 1 AS ra FROM pu GROUP BY a), "
    "gb AS (SELECT b, 2 * SUM(COUNT(*)) OVER (ORDER BY b "
    "   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
    "  - COUNT(*) + 1 AS rb FROM pu GROUP BY b), "
    "j AS (SELECT CAST(ra AS BIGINT) AS ra, CAST(rb AS BIGINT) AS rb "
    " FROM pu JOIN ga USING (a) JOIN gb USING (b)), "
    "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
    "  CAST(SUM(ra) AS BIGINT) AS sra, CAST(SUM(rb) AS BIGINT) AS srb, "
    "  CAST(SUM(ra * ra) AS BIGINT) AS sraa, "
    "  CAST(SUM(rb * rb) AS BIGINT) AS srbb, "
    "  CAST(SUM(ra * rb) AS BIGINT) AS srab FROM j) "
    "SELECT n AS n_users, "
    "printf('%.6f', ROUND(CAST(n * srab - sra * srb AS DOUBLE) "
    " / (SQRT(CAST(n * sraa - sra * sra AS DOUBLE)) "
    "    * SQRT(CAST(n * srbb - srb * srb AS DOUBLE))), 6)) AS spearman_rho "
    "FROM m WHERE n * sraa > sra * sra AND n * srbb > srb * srb",
)
def events_spearman(spark, sf):
    """Spearman rank correlation between per-user view volume and
    per-user purchase volume — the monotone-association complement of
    ``agg_stats_corr``'s Pearson (Spearman is outlier-robust and
    detects any monotone relation, which is what a growth team
    actually asks: 'do heavier browsers buy more, in rank terms?').
    Midrank tie handling is exact: Spearman == Pearson on midranks,
    and over a counts grain the DOUBLED midrank of every user sharing
    value v is the integer 2*cum(v) - cnt(v) + 1, so no float ranks
    ever exist.

    Float discipline: all five doubled-midrank moments are exact
    BIGINTs (at 100 TB the squared sums move to DECIMAL(38,0) — the
    events_concentration note); rho is ONE fixed IEEE chain — two
    exact int->double casts, two CORRECTLY-ROUNDED square roots (the
    one transcendental IEEE-754 pins bit-exactly, unlike ln/exp), a
    multiply and a divide — identical on both engines. Scaling by 2
    cancels between numerator and denominator, so doubled midranks
    give the same rho as midranks. Degenerate zero-variance sides are
    filtered on both engines (rho undefined).

    Scale shape: one map-side-combinable fact collapse to the user
    grain, two dimension-sized rank tables (distinct volumes)
    broadcast back, one five-moment rollup to a single row."""
    return spearman_rollup(user_ab(_events(spark, sf)))


def user_ab(df: DataFrame) -> DataFrame:
    """Per-user (view count, purchase count) — the shared grain for
    ``events_spearman`` and its streaming twin. Both are plain SUMs,
    exactly mergeable across micro-batches."""
    return df.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("b"),
    )


def spearman_rollup(pu: DataFrame) -> DataFrame:
    """Fold a per-user (a, b) volume table into the one-row Spearman
    readout — shared by ``events_spearman`` and its streaming twin
    (the doubled-midrank integer contract lives here)."""
    def ranks(col: str, out: str) -> DataFrame:
        w = Window.orderBy(col).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        g = pu.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        return g.select(
            col,
            (2 * F.sum("cnt").over(w) - F.col("cnt") + 1)
            .cast("long")
            .alias(out),
        )

    j = pu.join(F.broadcast(ranks("a", "ra")), "a").join(
        F.broadcast(ranks("b", "rb")), "b"
    )
    m = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("ra").cast("long").alias("sra"),
        F.sum("rb").cast("long").alias("srb"),
        F.sum(F.col("ra") * F.col("ra")).cast("long").alias("sraa"),
        F.sum(F.col("rb") * F.col("rb")).cast("long").alias("srbb"),
        F.sum(F.col("ra") * F.col("rb")).cast("long").alias("srab"),
    )
    num = (F.col("n") * F.col("srab") - F.col("sra") * F.col("srb")).cast(
        "double"
    )
    vx = F.col("n") * F.col("sraa") - F.col("sra") * F.col("sra")
    vy = F.col("n") * F.col("srbb") - F.col("srb") * F.col("srb")
    return (
        m.filter((vx > 0) & (vy > 0))
        .select(
            F.col("n").alias("n_users"),
            _FMT6(
                num / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double")))
            ).alias("spearman_rho"),
        )
    )


# ---------------------------------------------- Kendall rank correlation --

@register(
    "events_kendall",
    # Kendall tau-b between per-user view and purchase volumes: the
    # concordant/discordant pair counts are computed EXACTLY over the
    # dimension-sized distinct-(a,b) cell table (pairs of CELLS, never
    # pairs of users — n1*n2 per cell pair), the tie corrections from
    # the two marginals, and tau-b is the fixed spearman-shape IEEE
    # chain cast / sqrt / sqrt / multiply / divide over exact BIGINTs
    # (doubled pair counts n(n-1) avoid the /2 halving entirely —
    # the factor 2 cancels through the sqrt product against the
    # doubled numerator).
    "WITH pu AS (SELECT user_id, "
    "  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) "
    "   AS BIGINT) AS a, "
    "  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) "
    "   AS BIGINT) AS b FROM events GROUP BY user_id), "
    "cells AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n "
    " FROM pu GROUP BY a, b), "
    "cd AS (SELECT "
    "  CAST(COALESCE(SUM(CASE WHEN c1.b < c2.b THEN c1.n * c2.n END), 0) "
    "   AS BIGINT) AS c, "
    "  CAST(COALESCE(SUM(CASE WHEN c1.b > c2.b THEN c1.n * c2.n END), 0) "
    "   AS BIGINT) AS d "
    " FROM cells c1 JOIN cells c2 ON c1.a < c2.a), "
    "ta AS (SELECT CAST(SUM(t * (t - 1)) AS BIGINT) AS ta "
    " FROM (SELECT CAST(SUM(n) AS BIGINT) AS t FROM cells GROUP BY a)), "
    "tb AS (SELECT CAST(SUM(t * (t - 1)) AS BIGINT) AS tb "
    " FROM (SELECT CAST(SUM(n) AS BIGINT) AS t FROM cells GROUP BY b)), "
    "m AS (SELECT CAST(SUM(n) AS BIGINT) AS n FROM cells) "
    "SELECT n AS n_users, c AS concordant, d AS discordant, "
    "printf('%.6f', ROUND(CAST(2 * (c - d) AS DOUBLE) "
    " / (SQRT(CAST(n * (n - 1) - ta AS DOUBLE)) "
    "    * SQRT(CAST(n * (n - 1) - tb AS DOUBLE))), 6)) AS tau_b "
    "FROM m, cd, ta, tb "
    "WHERE n * (n - 1) > ta AND n * (n - 1) > tb",
)
def events_kendall(spark, sf):
    """Kendall tau-b rank correlation between per-user view volume and
    per-user purchase volume — the pair-concordance complement of
    ``events_spearman`` (same monotone-association question, but tau's
    pair-counting semantics are what A/B analysts reach for when the
    counts grain is heavily tied: tau-b's tie correction is exact
    where Spearman's midranks merely average). Reuses the SAME
    sum-mergeable ``user_ab`` grain.

    The quadratic pair count never materializes user pairs: users
    collapse to the distinct-(view count, purchase count) CELL table
    first (dimension-sized — bounded by the volume domain, not the
    user count), and every cell pair with a1 < a2 contributes n1*n2
    concordant or discordant pairs in one shot. Tie corrections come
    from the two marginals: with doubled pair counts P = n(n-1),
    TA = sum ta(ta-1), TB = sum tb(tb-1),
    tau_b = 2(C-D) / (sqrt(P-TA) * sqrt(P-TB)) — the doubling cancels
    through the sqrt product, so no /2 halving ever happens.

    Float discipline: C, D, P, TA, TB are exact BIGINTs (at 100 TB the
    pair products move to DECIMAL(38,0) — the events_spearman note);
    tau-b is ONE fixed IEEE chain — an exact int->double cast, two
    correctly-rounded square roots, a multiply and a divide —
    identical on both engines. Degenerate all-tied sides are filtered
    on both engines (tau undefined).

    Scale shape: one map-side-combinable fact collapse to the user
    grain, one further collapse to the distinct-cell grain, a
    broadcast cell self-join (dimension² pairs, not user² pairs), two
    marginal rollups, one single-row readout."""
    return kendall_rollup(user_ab(_events(spark, sf)))


def kendall_rollup(pu: DataFrame) -> DataFrame:
    """Fold a per-user (a, b) volume table into the one-row Kendall
    tau-b readout — shared by ``events_kendall`` and its streaming
    twin (the cell-pair / doubled-pair-count contract lives here)."""
    cells = pu.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    c1 = cells.select(
        F.col("a").alias("a1"), F.col("b").alias("b1"),
        F.col("n").alias("n1"),
    )
    c2 = cells.select(
        F.col("a").alias("a2"), F.col("b").alias("b2"),
        F.col("n").alias("n2"),
    )
    cd = c1.join(F.broadcast(c2), F.col("a1") < F.col("a2")).agg(
        F.coalesce(
            F.sum(
                F.when(F.col("b1") < F.col("b2"), F.col("n1") * F.col("n2"))
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("c"),
        F.coalesce(
            F.sum(
                F.when(F.col("b1") > F.col("b2"), F.col("n1") * F.col("n2"))
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("d"),
    )
    ta = (
        cells.groupBy("a")
        .agg(F.sum("n").cast("long").alias("t"))
        .agg(F.sum(F.col("t") * (F.col("t") - 1)).cast("long").alias("ta"))
    )
    tb = (
        cells.groupBy("b")
        .agg(F.sum("n").cast("long").alias("t"))
        .agg(F.sum(F.col("t") * (F.col("t") - 1)).cast("long").alias("tb"))
    )
    m = cells.agg(F.sum("n").cast("long").alias("n"))
    j = m.crossJoin(cd).crossJoin(ta).crossJoin(tb)
    p = F.col("n") * (F.col("n") - 1)
    num = (2 * (F.col("c") - F.col("d"))).cast("double")
    return (
        j.filter((p > F.col("ta")) & (p > F.col("tb")))
        .select(
            F.col("n").alias("n_users"),
            F.col("c").alias("concordant"),
            F.col("d").alias("discordant"),
            _FMT6(
                num
                / (
                    F.sqrt((p - F.col("ta")).cast("double"))
                    * F.sqrt((p - F.col("tb")).cast("double"))
                )
            ).alias("tau_b"),
        )
    )


# ------------------------------------------- chi-square independence test --

_CHI2_TYPES = ("click", "error", "purchase", "signup", "view")


def _chi2_sql() -> str:
    """Build the events_chi2 oracle: one conditional-aggregation scan
    producing the 2x5 contingency table, then the chi-square statistic
    as an EXPLICIT left-associated sum of ten per-cell terms — the
    identical fixed-order float chain the Spark side evaluates (the
    retrieval_ndcg-style 'fixed expression beats an unordered SUM'
    discipline), each term one HUGEINT-exact numerator/denominator
    pair and one IEEE division."""
    cells = [
        f"CAST(SUM(CASE WHEN user_id % 2 = {v} AND event_type = '{t}' "
        f"THEN 1 ELSE 0 END) AS BIGINT) AS o{v}_{t}"
        for v in (0, 1)
        for t in _CHI2_TYPES
    ]
    rows = " + ".join(f"o0_{t}" for t in _CHI2_TYPES)
    rows1 = " + ".join(f"o1_{t}" for t in _CHI2_TYPES)
    cols = ", ".join(
        f"(o0_{t} + o1_{t}) AS c_{t}" for t in _CHI2_TYPES
    )
    terms = " + ".join(
        f"(CASE WHEN r{v} * c_{t} = 0 THEN CAST(0 AS DOUBLE) ELSE "
        f"CAST(CAST(o{v}_{t} * t - r{v} * c_{t} AS HUGEINT) "
        f" * (o{v}_{t} * t - r{v} * c_{t}) AS DOUBLE) "
        f"/ CAST(CAST(t AS HUGEINT) * r{v} * c_{t} AS DOUBLE) END)"
        for v in (0, 1)
        for t in _CHI2_TYPES
    )
    in_list = ", ".join(f"'{t}'" for t in _CHI2_TYPES)
    return (
        f"WITH o AS (SELECT {', '.join(cells)}, "
        f"CAST(COUNT(*) AS BIGINT) AS t FROM events "
        f"WHERE event_type IN ({in_list})), "
        f"r AS (SELECT *, ({rows}) AS r0, ({rows1}) AS r1, {cols} FROM o) "
        f"SELECT t AS n_events, "
        f"printf('%.6f', ROUND({terms}, 6)) AS chi2, "
        f"({terms}) > 9.488 AS significant_95 FROM r"
    )


@register("events_chi2", _chi2_sql())
def events_chi2(spark, sf):
    """Chi-square test of independence between the 50/50 hash variant
    and the event-type mix — the categorical-outcome guardrail an
    experimentation platform runs next to ``events_srm`` (SRM checks
    exposure balance; this checks whether the BEHAVIOR mix shifted:
    did variant 1 error more, buy less?). 2x5 contingency over the
    five known event types; the alpha=0.05 flag compares against the
    conventional df=4 critical value 9.488.

    Float discipline: all observed counts, row/column totals, and the
    per-cell (O*T - R*C) deltas are exact integers; each cell's term
    squares its delta in HUGEINT/DECIMAL(38,0) (exact), casts the
    exact numerator and the exact T*R*C denominator to double (two
    correctly-rounded casts), and performs ONE IEEE division; the ten
    terms then sum in an EXPLICIT left-associated expression written
    identically on both engines — never an unordered SUM over rows —
    so the statistic is bit-identical and the 9.488 comparison (both
    engines parse the literal to the same double) decides identically.
    Empty rows/columns contribute an exact 0 term (documented
    degenerate contract; df is not adjusted).

    Scale shape: ONE map-side-combinable conditional-aggregation scan
    collapses the fact table straight to a single row — no shuffle
    wider than the 10-cell aggregate state, the cheapest possible
    shape for a 100 TB fact table."""
    return chi2_rollup(variant_type_counts(_events(spark, sf)))


def variant_type_counts(df: DataFrame) -> DataFrame:
    """Per-(variant, event_type) cell counts — the shared contingency
    grain for ``events_chi2`` and its streaming twin. Plain SUM-able
    counts: exactly mergeable across micro-batches."""
    return (
        df.filter(F.col("event_type").isin(*_CHI2_TYPES))
        .select((F.col("user_id") % 2).alias("variant"), "event_type")
        .groupBy("variant", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _chi2_exprs():
    """events_chi2's ten conditional aggregates, row/column sums, and
    fixed left-associated chi2 chain as reusable Column trees (the
    events_cramers_v construction-cost finding, same 2x5 shape)."""
    import functools
    import operator

    aggs = [
        F.sum(
            F.when(
                (F.col("variant") == v) & (F.col("event_type") == t),
                F.col("cnt"),
            ).otherwise(0)
        )
        .cast("long")
        .alias(f"o{v}_{t}")
        for v in (0, 1)
        for t in _CHI2_TYPES
    ]
    rowcol = [
        functools.reduce(
            operator.add, [F.col(f"o0_{t}") for t in _CHI2_TYPES]
        ).alias("r0"),
        functools.reduce(
            operator.add, [F.col(f"o1_{t}") for t in _CHI2_TYPES]
        ).alias("r1"),
        *[
            (F.col(f"o0_{t}") + F.col(f"o1_{t}")).alias(f"c_{t}")
            for t in _CHI2_TYPES
        ],
    ]

    def term(v: int, t: str):
        delta = F.col(f"o{v}_{t}") * F.col("t") - F.col(f"r{v}") * F.col(
            f"c_{t}"
        )
        num = (delta.cast("decimal(38,0)") * delta).cast("double")
        den = (
            F.col("t").cast("decimal(38,0)") * F.col(f"r{v}") * F.col(f"c_{t}")
        ).cast("double")
        return F.when(
            F.col(f"r{v}") * F.col(f"c_{t}") == 0, F.lit(0.0)
        ).otherwise(num / den)

    chi2 = functools.reduce(
        operator.add, [term(v, t) for v in (0, 1) for t in _CHI2_TYPES]
    )
    out = [
        F.col("t").alias("n_events"),
        _FMT6(chi2).alias("chi2"),
        (chi2 > 9.488).alias("significant_95"),
    ]
    return aggs, rowcol, out


def chi2_rollup(cells: DataFrame) -> DataFrame:
    """Fold a (variant, event_type, cnt) contingency grain into the
    one-row chi-square readout — shared by ``events_chi2`` and its
    streaming twin (the fixed left-associated ten-term float chain
    lives in ``_chi2_exprs``, built once per process — value-identical,
    the construction-time cut is pure py4j/analysis overhead)."""
    from ..caching import cached_exprs

    aggs, rowcol, out = cached_exprs("events_chi2", _chi2_exprs)
    o = cells.agg(*aggs, F.sum("cnt").cast("long").alias("t"))
    return o.select("*", *rowcol).select(*out)


# ---------------------------------------------------- Theil-Sen trend ----

@register(
    "events_theil_sen",
    # Theil-Sen robust trend per event type: the LOWER MEDIAN of all
    # pairwise daily-volume slopes. Each slope is ONE IEEE division of
    # exact integers (bit-identical both engines), the median is a
    # RANK SELECTION (rn = (n+1) div 2 under the total (slope, day1,
    # day2) order) — never an interpolated midpoint, so no engine-
    # specific interpolation formula can ever differ by an ulp (the
    # agg_median dyadic rule generalized to non-dyadic values by
    # replacing interpolation with selection).
    "WITH d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, "
    " CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2), "
    "p AS (SELECT a.event_type, "
    "  CAST(b.cnt - a.cnt AS DOUBLE) "
    "   / CAST(DATEDIFF('day', CAST(a.day AS DATE), CAST(b.day AS DATE)) "
    "     AS DOUBLE) AS slope, a.day AS d1, b.day AS d2 "
    " FROM d a JOIN d b ON b.event_type = a.event_type AND b.day > a.day), "
    "r AS (SELECT event_type, slope, "
    "  CAST(ROW_NUMBER() OVER (PARTITION BY event_type "
    "   ORDER BY slope, d1, d2) AS BIGINT) AS rn, "
    "  CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n "
    " FROM p) "
    "SELECT event_type, n AS n_pairs, "
    "printf('%.6f', ROUND(slope, 6)) AS ts_slope "
    "FROM r WHERE rn = (n + 1) // 2",
)
def events_theil_sen(spark, sf):
    """Theil-Sen robust trend estimate per event type: the median of
    all pairwise slopes between daily-volume points — the
    breakdown-resistant complement of ``events_trend``'s OLS slope
    (one colossal day drags OLS arbitrarily; Theil-Sen tolerates ~29%
    corrupted days) and the trend-side sibling of
    ``events_outlier_mad``'s robust dispersion.

    Float discipline: each pairwise slope is ONE correctly-rounded
    IEEE division of exact integers (count delta over day delta), so
    all slopes are bit-identical across engines; the median is the
    LOWER median by RANK SELECTION — row (n+1) div 2 under the total
    (slope, day1, day2) order — never an interpolated midpoint,
    because midpoint interpolation formulas (a+b)/2 vs a+(b-a)*0.5
    differ by an ulp between engines on non-dyadic inputs; selection
    sidesteps the whole class (the agg_median dyadic-input rule
    generalized to arbitrary values).

    Scale shape: one map-side-combinable fact collapse to the shared
    daily grain; the pair self-join is calendar-bounded (days²/2 per
    type — dimension-sized, never fact-sized) and keys event_type
    first; one rank window per type finishes it."""
    return theil_sen_rollup(daily_counts(_events(spark, sf)))


def theil_sen_rollup(d: DataFrame) -> DataFrame:
    """Fold a (event_type, day, cnt) daily table into the per-type
    lower-median pairwise slope — shared by ``events_theil_sen`` and
    its streaming twin (the rank-selection float contract lives
    here)."""
    a = d.select(
        "event_type", F.col("day").alias("d1"), F.col("cnt").alias("c1")
    )
    b = d.select(
        F.col("event_type").alias("et2"),
        F.col("day").alias("d2"),
        F.col("cnt").alias("c2"),
    )
    p = a.join(
        b,
        (F.col("et2") == F.col("event_type")) & (F.col("d2") > F.col("d1")),
    ).select(
        "event_type",
        (
            (F.col("c2") - F.col("c1")).cast("double")
            / F.datediff(
                F.to_date("d2"), F.to_date("d1")
            ).cast("double")
        ).alias("slope"),
        "d1",
        "d2",
    )
    w = Window.partitionBy("event_type").orderBy("slope", "d1", "d2")
    wn = Window.partitionBy("event_type")
    r = p.select(
        "event_type",
        "slope",
        F.row_number().over(w).cast("long").alias("rn"),
        F.count(F.lit(1)).over(wn).cast("long").alias("n"),
    )
    return r.filter(F.col("rn") == F.expr("(n + 1) div 2")).select(
        "event_type",
        F.col("n").alias("n_pairs"),
        _FMT6(F.col("slope")).alias("ts_slope"),
    )


# -------------------------------------------------- winsorized mean ----

@register(
    "events_winsorized_mean",
    # Winsorized mean of purchase amounts: clamp to the exact
    # rank-selected p5/p95 cents (rank ceil(q*n) under the total cents
    # order — SELECTION, never interpolation, the events_theil_sen
    # rule), then ONE IEEE division of the exact clamped-cents sum by
    # 100*n. The thresholds come from an ordered cumsum over the
    # bounded cents grain, so no per-row rank window ever runs.
    "WITH c AS (SELECT CAST(FLOOR(value * 100) AS BIGINT) AS cents "
    " FROM events WHERE event_type = 'purchase'), "
    "g AS (SELECT cents, CAST(COUNT(*) AS BIGINT) AS cnt FROM c "
    " GROUP BY cents), "
    "cu AS (SELECT cents, cnt, CAST(SUM(cnt) OVER (ORDER BY cents "
    " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum "
    " FROM g), "
    "t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM g), "
    "lo AS (SELECT MIN(cents) AS lo_cents FROM cu, t "
    " WHERE cum * 100 >= n * 5), "
    "hi AS (SELECT MIN(cents) AS hi_cents FROM cu, t "
    " WHERE cum * 100 >= n * 95), "
    "s AS (SELECT CAST(SUM(LEAST(GREATEST(g.cents, lo_cents), hi_cents) "
    "  * cnt) AS BIGINT) AS wsum, CAST(SUM(g.cents * cnt) AS BIGINT) "
    "  AS rsum FROM g, lo, hi) "
    "SELECT n, lo_cents, hi_cents, "
    "printf('%.6f', ROUND(CAST(wsum AS DOUBLE) / (100 * n), 6)) "
    " AS winsorized_mean, "
    "printf('%.6f', ROUND(CAST(rsum AS DOUBLE) / (100 * n), 6)) "
    " AS raw_mean FROM s, t, lo, hi",
)
def events_winsorized_mean(spark, sf):
    """Winsorized mean of purchase amounts (5%/95%) — the robust
    location estimate a revenue dashboard shows next to the raw mean
    (one whale purchase drags the mean; clamping to the p5/p95 values
    bounds any single observation's influence), completing the robust
    trio with ``events_outlier_mad`` (dispersion) and
    ``events_theil_sen`` (trend).

    Float discipline: amounts bin to exact integer cents
    (floor(value*100) — one IEEE multiply + exact floor, identical
    both engines); the p5/p95 thresholds are RANK-SELECTED via exact
    integer cross-multiplies over the cents-grain cumsum
    (cum*100 >= n*q — never an interpolated quantile, never a float
    threshold); the clamped and raw sums are exact BIGINTs (at 100 TB:
    DECIMAL(38,0)); each reported mean is ONE correctly-rounded IEEE
    division under ROUND + %.6f.

    Scale shape: one map-side-combinable fact collapse to the bounded
    cents grain (price-domain sized — the events_ks_test discipline),
    one ordered cumsum window over that dimension table, two one-row
    threshold selections, one dimension-grain clamp-and-sum."""
    return winsor_rollup(purchase_cents_counts(_events(spark, sf)))


def purchase_cents_counts(df: DataFrame) -> DataFrame:
    """Per-cents purchase counts — the shared grain for
    ``events_winsorized_mean`` and its streaming twin (plain SUM-able
    counts, exactly mergeable across micro-batches — the
    value_counts_by_variant discipline without the variant split)."""
    c = (
        df.filter(F.col("event_type") == "purchase")
        .select(F.floor(F.col("value") * 100).cast("long").alias("cents"))
    )
    return c.groupBy("cents").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def winsor_rollup(g: DataFrame) -> DataFrame:
    """Fold a (cents, cnt) grain into the one-row winsorized-mean
    readout — shared by ``events_winsorized_mean`` and its streaming
    twin (the rank-selection clamp contract lives here)."""
    wcum = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cu = g.select(
        "cents", "cnt", F.sum("cnt").over(wcum).cast("long").alias("cum")
    )
    t = g.agg(F.sum("cnt").cast("long").alias("n"))
    cut = lambda q, name: (  # noqa: E731
        cu.crossJoin(F.broadcast(t))
        .filter(F.col("cum") * 100 >= F.col("n") * q)
        .agg(F.min("cents").alias(name))
    )
    lo, hi = cut(5, "lo_cents"), cut(95, "hi_cents")
    s = (
        g.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .agg(
            F.sum(
                F.least(
                    F.greatest(F.col("cents"), F.col("lo_cents")),
                    F.col("hi_cents"),
                )
                * F.col("cnt")
            )
            .cast("long")
            .alias("wsum"),
            F.sum(F.col("cents") * F.col("cnt")).cast("long").alias("rsum"),
            F.min("lo_cents").alias("lo_cents"),
            F.min("hi_cents").alias("hi_cents"),
        )
    )
    return s.crossJoin(F.broadcast(t)).select(
        "n",
        "lo_cents",
        "hi_cents",
        _FMT6(F.col("wsum").cast("double") / (100 * F.col("n"))).alias(
            "winsorized_mean"
        ),
        _FMT6(F.col("rsum").cast("double") / (100 * F.col("n"))).alias(
            "raw_mean"
        ),
    )


# ------------------------------------------------- series profile macro ----

@register(
    "macro_series_profile",
    # One-row-per-type daily-series health profile composing the
    # family's four shared contracts over ONE daily grain: median/MAD
    # (dyadic-exact interpolation on integral counts), the alpha=1/2
    # EWMA (recursive fold — bit-identical sequential chain), the
    # Theil-Sen lower-median slope (rank selection, never
    # interpolation), and the CUSUM break (exact-integer argmax).
    # A green row pins the COMPOSITION of all four float disciplines
    # (the macro_graph_health rule applied to the series family).
    "WITH RECURSIVE d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') "
    " AS day, CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2), "
    "m AS (SELECT event_type, quantile_cont(cnt, 0.5) AS med FROM d "
    " GROUP BY event_type), "
    "v AS (SELECT d.event_type, ABS(d.cnt - m.med) AS dev FROM d JOIN m "
    " ON m.event_type = d.event_type), "
    "s2 AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad FROM v "
    " GROUP BY event_type), "
    "r0 AS (SELECT event_type, cnt, CAST(ROW_NUMBER() OVER ("
    " PARTITION BY event_type ORDER BY day) AS BIGINT) AS rn FROM d), "
    "e(event_type, rn, s) AS ("
    " SELECT event_type, rn, CAST(cnt AS DOUBLE) FROM r0 WHERE rn = 1 "
    " UNION ALL "
    " SELECT r0.event_type, r0.rn, (CAST(r0.cnt AS DOUBLE) + e.s) / 2 "
    " FROM e JOIN r0 ON r0.event_type = e.event_type AND r0.rn = e.rn + 1), "
    "f AS (SELECT event_type, MAX(rn) AS mx FROM e GROUP BY 1), "
    "ew AS (SELECT e.event_type, e.rn AS n_days, e.s AS ewma FROM e "
    " JOIN f ON f.event_type = e.event_type AND e.rn = f.mx), "
    "p AS (SELECT a.event_type, CAST(b.cnt - a.cnt AS DOUBLE) "
    "  / CAST(DATEDIFF('day', CAST(a.day AS DATE), CAST(b.day AS DATE)) "
    "    AS DOUBLE) AS slope, a.day AS d1, b.day AS d2 "
    " FROM d a JOIN d b ON b.event_type = a.event_type AND b.day > a.day), "
    "rr AS (SELECT event_type, slope, CAST(ROW_NUMBER() OVER ("
    " PARTITION BY event_type ORDER BY slope, d1, d2) AS BIGINT) AS rn, "
    " CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n FROM p), "
    "ts AS (SELECT event_type, slope FROM rr WHERE rn = (n + 1) // 2), "
    "s3 AS (SELECT event_type, day, "
    " CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY day "
    "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pre, "
    " CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) "
    "  AS BIGINT) AS k, "
    " CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS tot, "
    " CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n "
    " FROM d), "
    "c AS (SELECT event_type, day, n * pre - k * tot AS s_k FROM s3 "
    " WHERE k < n), "
    "r2 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type "
    " ORDER BY ABS(s_k) DESC, day) AS rn FROM c), "
    "cp AS (SELECT event_type, day AS cp_day, s_k FROM r2 WHERE rn = 1), "
    "t AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS total_events "
    " FROM d GROUP BY 1) "
    "SELECT ew.event_type, ew.n_days, t.total_events, "
    "printf('%.6f', ROUND(m.med, 6)) AS med, "
    "printf('%.6f', ROUND(s2.mad, 6)) AS mad, "
    "printf('%.6f', ROUND(ew.ewma, 6)) AS ewma, "
    "printf('%.6f', ROUND(ts.slope, 6)) AS ts_slope, "
    "cp.cp_day, CAST(cp.s_k AS BIGINT) AS cusum_scaled "
    "FROM ew JOIN m ON m.event_type = ew.event_type "
    "JOIN s2 ON s2.event_type = ew.event_type "
    "JOIN ts ON ts.event_type = ew.event_type "
    "JOIN cp ON cp.event_type = ew.event_type "
    "JOIN t ON t.event_type = ew.event_type",
)
def macro_series_profile(spark, sf):
    """Per-event-type time-series health profile — the one-row-per-
    series summary an observability dashboard renders, composing the
    daily-series family over ONE shared grain: current level (EWMA),
    robust center/dispersion (median/MAD), robust trend (Theil-Sen
    lower-median slope), and the structural break (CUSUM argmax day +
    scaled statistic). Facts are scanned ONCE into the daily grain
    (localCheckpoint'ed), and each column is produced by the SAME
    shared rollup its per-key sibling uses (``mad_rollup``,
    ``ewma_rollup``, ``theil_sen_rollup``) — so a green oracle row
    pins the COMPOSITION of all four float disciplines at once (the
    macro_graph_health rule applied to the series family). Types with
    a single active day have no pair slopes or interior break and are
    excluded by the inner joins on both engines.

    Scale shape: one map-side-combinable fact collapse, then four
    dimension-sized rollups over the SAME checkpointed daily table
    (types x days), joined on event_type — no second fact pass
    anywhere."""
    d = daily_counts(_events(spark, sf)).localCheckpoint()
    mm = mad_rollup(d).groupBy("event_type").agg(
        F.min("med").alias("med"), F.min("mad").alias("mad")
    )
    ew = ewma_rollup(d)
    ts = theil_sen_rollup(d).select("event_type", "ts_slope")
    wpre = Window.partitionBy("event_type").orderBy("day")
    wall = Window.partitionBy("event_type")
    s3 = d.select(
        "event_type",
        "day",
        F.sum("cnt")
        .over(wpre.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("pre"),
        F.row_number().over(wpre).cast("long").alias("k"),
        F.sum("cnt").over(wall).cast("long").alias("tot"),
        F.count(F.lit(1)).over(wall).cast("long").alias("n"),
    )
    c = s3.filter(F.col("k") < F.col("n")).select(
        "event_type",
        "day",
        (F.col("n") * F.col("pre") - F.col("k") * F.col("tot")).alias("s_k"),
    )
    wcp = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("s_k")).desc(), F.asc("day")
    )
    cp = (
        c.withColumn("rn", F.row_number().over(wcp))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").alias("cp_day"),
            F.col("s_k").cast("long").alias("cusum_scaled"),
        )
    )
    t = d.groupBy("event_type").agg(
        F.sum("cnt").cast("long").alias("total_events")
    )
    return (
        ew.join(t, "event_type")
        .join(mm, "event_type")
        .join(ts, "event_type")
        .join(cp, "event_type")
        .select(
            "event_type",
            "n_days",
            "total_events",
            "med",
            "mad",
            "ewma",
            "ts_slope",
            "cp_day",
            "cusum_scaled",
        )
    )


# ------------------------------------------ Holt double exponential -------

@register(
    "events_holt",
    # Holt linear (double-exponential) smoothing with alpha = beta = 1/2
    # per event type: l_1 = y_1, b_1 = 0; l_t = (y_t + (l + b)) / 2,
    # b_t = ((l_t - l) + b) / 2 — the identical sequential op chain on
    # both engines (Spark: ordered-array left fold over a struct
    # accumulator; oracle: a genuinely RECURSIVE CTE stepping the same
    # recurrence, the l_t subexpression textually repeated inside b_t so
    # the op sequence matches token-for-token), so every intermediate
    # double is bit-identical regardless of representability.
    "WITH RECURSIVE d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') "
    " AS day, CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2), "
    "r AS (SELECT event_type, cnt, CAST(ROW_NUMBER() OVER ("
    " PARTITION BY event_type ORDER BY day) AS BIGINT) AS rn FROM d), "
    "e(event_type, rn, l, b) AS ("
    " SELECT event_type, rn, CAST(cnt AS DOUBLE), CAST(0 AS DOUBLE) "
    " FROM r WHERE rn = 1 "
    " UNION ALL "
    " SELECT r.event_type, r.rn, "
    " (CAST(r.cnt AS DOUBLE) + (e.l + e.b)) / 2, "
    " (((CAST(r.cnt AS DOUBLE) + (e.l + e.b)) / 2 - e.l) + e.b) / 2 "
    " FROM e JOIN r ON r.event_type = e.event_type AND r.rn = e.rn + 1), "
    "f AS (SELECT event_type, MAX(rn) AS mx FROM e GROUP BY 1) "
    "SELECT e.event_type, e.rn AS n_days, "
    "printf('%.6f', ROUND(e.l, 6)) AS level, "
    "printf('%.6f', ROUND(e.b, 6)) AS trend, "
    "printf('%.6f', ROUND(e.l + e.b, 6)) AS forecast_1 "
    "FROM e JOIN f ON f.event_type = e.event_type AND e.rn = f.mx",
)
def events_holt(spark, sf):
    """Holt linear trend smoothing (alpha = beta = 1/2) of each type's
    daily volume — the level-plus-trend upgrade of ``events_ewma``
    (EWMA tracks only the level and lags any sustained ramp; Holt's
    second recurrence tracks the ramp itself, and level + trend is the
    one-step forecast an alerting threshold actually wants). Emits the
    final smoothed level, trend, and one-step forecast per type.

    Float discipline: the coupled recurrence runs as the events_ewma
    fold-vs-recursive-CTE contract — the identical op sequence spelled
    on both engines, including a textual REPEAT of the l_t expression
    inside b_t (IEEE ops are pure, so recomputing beats introducing an
    engine-specific lateral alias); with dyadic alpha = beta = 1/2
    every step is two exact halvings over sums, bit-identical by
    construction.

    Scale shape: one map-side-combinable fact collapse to the shared
    ``daily_counts`` grain, one event_type exchange for the collect;
    the fold is O(days) per type — calendar-bounded, never
    fact-bounded."""
    return holt_rollup(daily_counts(_events(spark, sf)))


def holt_rollup(d: DataFrame) -> DataFrame:
    """Fold a (event_type, day, cnt) daily table into the per-type Holt
    (level, trend, one-step forecast) readout — shared by
    ``events_holt`` and its streaming twin (the struct-accumulator
    sorted-fold float contract lives here)."""
    arr = d.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "cnt"))).alias("a")
    )
    fold = F.expr(
        "aggregate(slice(a, 2, size(a) - 1), "
        "named_struct('l', CAST(element_at(a, 1).cnt AS DOUBLE), "
        " 'b', CAST(0 AS DOUBLE)), "
        "(s, x) -> named_struct("
        "'l', (CAST(x.cnt AS DOUBLE) + (s.l + s.b)) / 2, "
        "'b', (((CAST(x.cnt AS DOUBLE) + (s.l + s.b)) / 2 - s.l) + s.b) / 2))"
    )
    return arr.select(
        "event_type",
        F.size("a").cast("long").alias("n_days"),
        fold.alias("s"),
    ).select(
        "event_type",
        "n_days",
        _FMT6(F.col("s.l")).alias("level"),
        _FMT6(F.col("s.b")).alias("trend"),
        _FMT6(F.col("s.l") + F.col("s.b")).alias("forecast_1"),
    )


# ---------------------------------------------- Cramér's V effect size ----

def _cram_dows() -> tuple[int, ...]:
    return tuple(range(7))


def _cramers_sql() -> str:
    """Build the events_cramers_v oracle: the events_chi2 explicit-chain
    discipline over a 7x5 (weekday x event type) contingency — 35 exact
    per-cell terms summed in a fixed left-associated chain, then
    Cramér's V as ONE division by the exact 4*T (min(r-1, c-1) = 4) and
    ONE correctly-rounded sqrt. Weekday is epoch-anchored calendar
    arithmetic ((date - 2024-01-01) % 7), identical on both engines —
    never the engines' dayofweek builtins, whose week origins differ."""
    cells = [
        f"CAST(SUM(CASE WHEN dow = {d} AND event_type = '{t}' "
        f"THEN 1 ELSE 0 END) AS BIGINT) AS o{d}_{t}"
        for d in _cram_dows()
        for t in _CHI2_TYPES
    ]
    rows = {
        d: " + ".join(f"o{d}_{t}" for t in _CHI2_TYPES) for d in _cram_dows()
    }
    cols = ", ".join(
        "(" + " + ".join(f"o{d}_{t}" for d in _cram_dows()) + f") AS c_{t}"
        for t in _CHI2_TYPES
    )
    terms = " + ".join(
        f"(CASE WHEN r{d} * c_{t} = 0 THEN CAST(0 AS DOUBLE) ELSE "
        f"CAST(CAST(o{d}_{t} * t - r{d} * c_{t} AS HUGEINT) "
        f" * (o{d}_{t} * t - r{d} * c_{t}) AS DOUBLE) "
        f"/ CAST(CAST(t AS HUGEINT) * r{d} * c_{t} AS DOUBLE) END)"
        for d in _cram_dows()
        for t in _CHI2_TYPES
    )
    in_list = ", ".join(f"'{t}'" for t in _CHI2_TYPES)
    row_aliases = ", ".join(f"({rows[d]}) AS r{d}" for d in _cram_dows())
    return (
        f"WITH e AS (SELECT (CAST(ts AS DATE) - DATE '2024-01-01') % 7 "
        f" AS dow, event_type FROM events "
        f" WHERE event_type IN ({in_list})), "
        f"o AS (SELECT {', '.join(cells)}, "
        f"CAST(COUNT(*) AS BIGINT) AS t FROM e), "
        f"r AS (SELECT *, {row_aliases}, {cols} FROM o), "
        f"x AS (SELECT t, ({terms}) AS chi2raw FROM r) "
        f"SELECT t AS n_events, "
        f"printf('%.6f', ROUND(chi2raw, 6)) AS chi2, "
        f"printf('%.6f', ROUND(SQRT(chi2raw / CAST(4 * t AS DOUBLE)), 6)) "
        f" AS cramers_v FROM x"
    )


@register("events_cramers_v", _cramers_sql())
def events_cramers_v(spark, sf):
    """Cramér's V effect size for weekday x event-type association —
    the magnitude readout a chi-square test needs next to it (at fact
    scale EVERYTHING is 'significant'; V in [0, 1] says whether the
    weekly behavioral mix shift is worth acting on). 7x5 contingency
    of epoch-anchored weekday against the five known event types.

    Float discipline: the events_chi2 contract extended — 35 exact
    per-cell terms (delta squared in DECIMAL(38,0)/HUGEINT, one IEEE
    division each) summed in an EXPLICIT left-associated chain, then
    V = sqrt(chi2 / (4T)) is one exact-int cast, one IEEE division and
    one CORRECTLY-ROUNDED sqrt — bit-identical on both engines.
    Weekday is (days since 2024-01-01) % 7 spelled as calendar
    arithmetic on both sides — the engines' dayofweek() builtins
    disagree on week origin and are never used.

    Scale shape: ONE map-side-combinable conditional-aggregation scan
    collapses facts straight to a single 36-column row — no shuffle
    wider than the aggregate state."""
    return cramers_rollup(dow_type_counts(_events(spark, sf)))


def dow_type_counts(df: DataFrame) -> DataFrame:
    """Per-(weekday, event_type) cell counts — the shared contingency
    grain for ``events_cramers_v`` and its streaming twin (plain
    SUM-able counts, exactly mergeable across micro-batches)."""
    return (
        df.filter(F.col("event_type").isin(*_CHI2_TYPES))
        .select(
            F.pmod(
                F.datediff(
                    F.to_date("ts"), F.lit("2024-01-01").cast("date")
                ),
                F.lit(7),
            )
            .cast("long")
            .alias("dow"),
            "event_type",
        )
        .groupBy("dow", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


_CRAMERS_EXPRS: tuple | None = None  # (ctx_id, aggs, rowcol_sums, chi2)


def _cramers_exprs():
    """The 35-cell conditional aggregates, row/column sums, and the
    fixed left-associated 35-term chi2 chain as REUSABLE unresolved
    Column trees. Building them costs ~1.2 s of py4j round-trips +
    decimal type-propagation PER CALL while the actual execution is
    0.4 s — and Column expressions reference column names only, so one
    build serves every invocation (keyed on the live SparkContext: a
    restarted JVM gateway invalidates the cached py4j refs)."""
    import functools
    import operator

    from pyspark import SparkContext

    global _CRAMERS_EXPRS
    key = id(SparkContext._active_spark_context)
    if _CRAMERS_EXPRS is not None and _CRAMERS_EXPRS[0] == key:
        return _CRAMERS_EXPRS[1:]

    aggs = [
        F.sum(
            F.when(
                (F.col("dow") == d) & (F.col("event_type") == t),
                F.col("cnt"),
            ).otherwise(0)
        )
        .cast("long")
        .alias(f"o{d}_{t}")
        for d in _cram_dows()
        for t in _CHI2_TYPES
    ]
    rowcol = [
        *[
            functools.reduce(
                operator.add, [F.col(f"o{d}_{t}") for t in _CHI2_TYPES]
            ).alias(f"r{d}")
            for d in _cram_dows()
        ],
        *[
            functools.reduce(
                operator.add, [F.col(f"o{d}_{t}") for d in _cram_dows()]
            ).alias(f"c_{t}")
            for t in _CHI2_TYPES
        ],
    ]

    def term(d: int, t: str):
        delta = F.col(f"o{d}_{t}") * F.col("t") - F.col(f"r{d}") * F.col(
            f"c_{t}"
        )
        num = (delta.cast("decimal(38,0)") * delta).cast("double")
        den = (
            F.col("t").cast("decimal(38,0)")
            * F.col(f"r{d}")
            * F.col(f"c_{t}")
        ).cast("double")
        return F.when(
            F.col(f"r{d}") * F.col(f"c_{t}") == 0, F.lit(0.0)
        ).otherwise(num / den)

    chi2 = functools.reduce(
        operator.add,
        [term(d, t) for d in _cram_dows() for t in _CHI2_TYPES],
    )
    _CRAMERS_EXPRS = (key, aggs, rowcol, chi2)
    return aggs, rowcol, chi2


def cramers_rollup(cells: DataFrame) -> DataFrame:
    """Fold a (dow, event_type, cnt) contingency grain into the one-row
    chi2 + Cramér's V readout — shared by ``events_cramers_v`` and its
    streaming twin (the fixed 35-term left-associated chain lives in
    ``_cramers_exprs``, built once per process — value-identical, the
    construction-time cut is pure py4j/analysis overhead)."""
    aggs, rowcol, chi2 = _cramers_exprs()
    o = cells.agg(*aggs, F.sum("cnt").cast("long").alias("t"))
    r = o.select("*", *rowcol)
    x = r.select(F.col("t").alias("n_events"), chi2.alias("chi2raw"))
    return x.select(
        "n_events",
        _FMT6(F.col("chi2raw")).alias("chi2"),
        _FMT6(
            F.sqrt(
                F.col("chi2raw") / (4 * F.col("n_events")).cast("double")
            )
        ).alias("cramers_v"),
    )


# ---------------------------------------------- Wald–Wolfowitz runs test --

@register(
    "events_runs_test",
    # Runs test for randomness of the daily total-volume series: days
    # classify as above/below the RANK-SELECTED lower median (equal days
    # excluded — the standard treatment), runs count as 1 + sign
    # changes under the total day order, and z is one fixed IEEE chain
    # over exact BIGINT pair counts.
    "WITH dt AS (SELECT strftime(ts, '%Y-%m-%d') AS day, "
    " CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1), "
    "g AS (SELECT cnt, CAST(COUNT(*) AS BIGINT) AS k FROM dt GROUP BY cnt), "
    "cu AS (SELECT cnt, CAST(SUM(k) OVER (ORDER BY cnt "
    " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum "
    " FROM g), "
    "t AS (SELECT CAST(SUM(k) AS BIGINT) AS n FROM g), "
    "med AS (SELECT MIN(cnt) AS med FROM cu, t WHERE cum >= (n + 1) // 2), "
    "s AS (SELECT day, CASE WHEN cnt > med THEN 1 ELSE -1 END AS sgn "
    " FROM dt, med WHERE cnt <> med), "
    "r AS (SELECT sgn, LAG(sgn) OVER (ORDER BY day) AS prev FROM s), "
    "m AS (SELECT "
    " CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1, "
    " CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n2, "
    " CAST(1 + SUM(CASE WHEN prev IS NOT NULL AND sgn <> prev "
    "  THEN 1 ELSE 0 END) AS BIGINT) AS runs FROM r) "
    "SELECT n1 AS n_above, n2 AS n_below, runs AS n_runs, "
    "printf('%.6f', ROUND((CAST(runs AS DOUBLE) "
    " - (1.0 + CAST(2 * n1 * n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))) "
    " / SQRT(CAST(2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) AS DOUBLE) "
    "   / CAST((n1 + n2) * (n1 + n2) * (n1 + n2 - 1) AS DOUBLE)), 6)) AS z "
    "FROM m WHERE n1 > 0 AND n2 > 0 AND 2 * n1 * n2 > n1 + n2",
)
def events_runs_test(spark, sf):
    """Wald–Wolfowitz runs test on the daily total-volume series — the
    randomness guardrail behind every daily-series readout in this
    family (trend/changepoint/autocorr all PRESUPPOSE the series isn't
    i.i.d. noise; the runs test is the nonparametric check that it
    actually isn't: too few runs means clustering/regime behavior, too
    many means oscillation). Days at the median are excluded per the
    standard treatment.

    Float discipline: the median is RANK-SELECTED (lower median at
    position (n+1) div 2 — integer division per the events_theil_sen
    rule, never interpolation); n_above/n_below/n_runs are exact
    BIGINTs; z is ONE fixed IEEE chain — exact-int casts, one division
    for the mean, one for the variance, one correctly-rounded sqrt,
    one subtract, one divide — spelled identically on both engines.
    Degenerate cases (one-sided series, zero variance) are filtered by
    exact integer guards on both sides.

    Scale shape: one map-side-combinable fact collapse to the calendar
    day grain; everything after is dimension-sized (a cumsum over
    distinct volumes, a lag window over <= days rows) — the
    events_concurrency single-ordered-pass discipline."""
    return runs_rollup(day_totals(_events(spark, sf)))


def day_totals(df: DataFrame) -> DataFrame:
    """Per-day total event counts — the shared grain for
    ``events_runs_test`` and its streaming twin (plain SUM-able counts,
    exactly mergeable across micro-batches)."""
    return df.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))


def runs_rollup(dt: DataFrame) -> DataFrame:
    """Fold a (day, cnt) daily-totals table into the one-row runs-test
    readout — shared by ``events_runs_test`` and its streaming twin
    (the rank-selected median + fixed z chain live here)."""
    g = dt.groupBy("cnt").agg(F.count(F.lit(1)).cast("long").alias("k"))
    wcum = Window.orderBy("cnt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cu = g.select("cnt", F.sum("k").over(wcum).cast("long").alias("cum"))
    t = g.agg(F.sum("k").cast("long").alias("n"))
    med = (
        cu.crossJoin(F.broadcast(t))
        .filter(F.col("cum") >= F.expr("(n + 1) div 2"))
        .agg(F.min("cnt").alias("med"))
    )
    s = (
        dt.crossJoin(F.broadcast(med))
        .filter(F.col("cnt") != F.col("med"))
        .select(
            "day",
            F.when(F.col("cnt") > F.col("med"), 1).otherwise(-1).alias("sgn"),
        )
    )
    w = Window.orderBy("day")
    r = s.select("sgn", F.lag("sgn").over(w).alias("prev"))
    m = r.agg(
        F.sum(F.when(F.col("sgn") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("sgn") == -1, 1).otherwise(0))
        .cast("long")
        .alias("n2"),
        (
            F.lit(1)
            + F.sum(
                F.when(
                    F.col("prev").isNotNull()
                    & (F.col("sgn") != F.col("prev")),
                    1,
                ).otherwise(0)
            )
        )
        .cast("long")
        .alias("runs"),
    )
    n1, n2, runs = F.col("n1"), F.col("n2"), F.col("runs")
    tot = n1 + n2
    mu = F.lit(1.0) + (2 * n1 * n2).cast("double") / tot.cast("double")
    var = (2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)).cast("double") / (
        tot * tot * (tot - 1)
    ).cast("double")
    z = (runs.cast("double") - mu) / F.sqrt(var)
    return (
        m.filter((n1 > 0) & (n2 > 0) & (2 * n1 * n2 > tot))
        .select(
            n1.alias("n_above"),
            n2.alias("n_below"),
            runs.alias("n_runs"),
            _FMT6(z).alias("z"),
        )
    )


# ---------------------------------------------- jackknife standard error --

@register(
    "events_jackknife",
    # Leave-one-day-out jackknife SE of the mean daily volume, collapsed
    # to exact integers: m_i - mean = (S - n*x_i)/(n(n-1)), so
    # SE^2 = sum(S - n*x_i)^2 / (n^3 (n-1)) — one exact HUGEINT sum of
    # squares, one exact denominator, one IEEE division and one
    # correctly-rounded sqrt.
    "WITH dt AS (SELECT strftime(ts, '%Y-%m-%d') AS day, "
    " CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1), "
    "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
    " CAST(SUM(cnt) AS BIGINT) AS s FROM dt), "
    "t AS (SELECT CAST(SUM(CAST(s - n * cnt AS HUGEINT) "
    " * (s - n * cnt)) AS HUGEINT) AS q FROM dt, m) "
    "SELECT n AS n_days, s AS total_events, "
    "printf('%.6f', ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6)) "
    " AS mean_daily, "
    "printf('%.6f', ROUND(SQRT(CAST(q AS DOUBLE) "
    " / CAST(CAST(n AS HUGEINT) * n * n * (n - 1) AS DOUBLE)), 6)) "
    " AS jackknife_se "
    "FROM m, t WHERE n > 1",
)
def events_jackknife(spark, sf):
    """Leave-one-out jackknife standard error of the mean daily volume
    — the resampling-school uncertainty readout next to the
    events_anomaly z-scores (same question — 'how far can this mean
    drift?' — answered by the Quenouille/Tukey estimator every metrics
    platform quotes as its error bar; for the mean it provably equals
    the classical s/sqrt(n), which makes it the perfect exact-integer
    pin of the whole jackknife recipe).

    Float discipline: m_i - mean collapses to (S - n*x_i)/(n(n-1)), so
    SE^2 = sum over days of (S - n*x_i)^2 / (n^3(n-1)) — the sum of
    squares is an exact DECIMAL(38,0)/HUGEINT, the denominator an
    exact integer product, and SE is ONE IEEE division + ONE
    correctly-rounded sqrt under ROUND + %.6f (the events_spearman
    chain); the mean is one further exact-int division. Degenerate
    n <= 1 filtered by integer guards on both sides.

    Scale shape: one map-side-combinable fact collapse to the calendar
    day grain, one 2-integer rollup, one dimension-sized sum of
    squares — the events_anomaly shape with a different tail."""
    dt = day_totals(_events(spark, sf))
    m = dt.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cnt").cast("long").alias("s"),
    )
    t = (
        dt.crossJoin(F.broadcast(m))
        .select(
            (
                (F.col("s") - F.col("n") * F.col("cnt")).cast("decimal(38,0)")
                * (F.col("s") - F.col("n") * F.col("cnt"))
            ).alias("sq")
        )
        .agg(F.sum("sq").cast("decimal(38,0)").alias("q"))
    )
    den = (
        F.col("n").cast("decimal(38,0)")
        * F.col("n")
        * F.col("n")
        * (F.col("n") - 1)
    ).cast("double")
    return (
        m.crossJoin(F.broadcast(t))
        .filter(F.col("n") > 1)
        .select(
            F.col("n").alias("n_days"),
            F.col("s").alias("total_events"),
            _FMT6(F.col("s").cast("double") / F.col("n").cast("double")).alias(
                "mean_daily"
            ),
            _FMT6(F.sqrt(F.col("q").cast("double") / den)).alias(
                "jackknife_se"
            ),
        )
    )


# ------------------------------------------------ purchase-amount deciles --

@register(
    "events_deciles",
    # Exact rank-selected deciles of purchase amounts over the bounded
    # cents grain: decile q = MIN cents with cum*10 >= n*q (integer
    # cross-multiply — the events_winsorized_mean selection rule, never
    # interpolation). No floats anywhere but the display division
    # by 100.
    "WITH c AS (SELECT CAST(FLOOR(value * 100) AS BIGINT) AS cents "
    " FROM events WHERE event_type = 'purchase'), "
    "g AS (SELECT cents, CAST(COUNT(*) AS BIGINT) AS cnt FROM c "
    " GROUP BY cents), "
    "cu AS (SELECT cents, CAST(SUM(cnt) OVER (ORDER BY cents "
    " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum "
    " FROM g), "
    "t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM g), "
    "d AS (SELECT unnest(generate_series(1, 9)) AS decile) "
    "SELECT decile, MIN(cents) AS cents, "
    "printf('%.6f', ROUND(CAST(MIN(cents) AS DOUBLE) / 100, 6)) AS amount "
    "FROM cu, t, d WHERE cum * 10 >= n * decile "
    "GROUP BY decile",
)
def events_deciles(spark, sf):
    """Exact purchase-amount deciles — the distribution readout a
    revenue dashboard draws as its box/violin summary, completing the
    robust family's selection rule (``agg_median`` interpolates the
    exact middle; ``events_winsorized_mean`` selects p5/p95; this key
    selects all nine interior deciles in one pass).

    Float discipline: amounts bin to exact integer cents; each decile
    is RANK-SELECTED via the exact integer cross-multiply
    cum*10 >= n*q over the cents-grain cumsum (never an interpolated
    quantile); the display amount is one exact-int division by 100
    under ROUND + %.6f.

    Scale shape: one map-side-combinable fact collapse to the bounded
    cents grain, one ordered cumsum window over that dimension table,
    one 9-row selection join — the events_winsorized_mean shape with a
    decile dimension instead of two cuts."""
    return deciles_rollup(purchase_cents_counts(_events(spark, sf)))


def deciles_rollup(g: DataFrame) -> DataFrame:
    """Fold a (cents, cnt) grain into the nine rank-selected deciles —
    shared by ``events_deciles`` and its streaming twin."""
    spark = g.sparkSession
    wcum = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cu = g.select(
        "cents", F.sum("cnt").over(wcum).cast("long").alias("cum")
    )
    t = g.agg(F.sum("cnt").cast("long").alias("n"))
    d = spark.range(1, 10).select(F.col("id").cast("long").alias("decile"))
    return (
        cu.crossJoin(F.broadcast(t))
        .crossJoin(F.broadcast(d))
        .filter(F.col("cum") * 10 >= F.col("n") * F.col("decile"))
        .groupBy("decile")
        .agg(F.min("cents").alias("cents"))
        .select(
            "decile",
            "cents",
            _FMT6(F.col("cents").cast("double") / 100).alias("amount"),
        )
    )


# ------------------------------------------------ one-way ANOVA (weekday) --

def _anova_sql() -> str:
    """Build the events_anova oracle: daily totals bucketed by the
    epoch-anchored weekday, per-group exact moments (n, S, Q), then SSW
    and SSB as EXPLICIT left-associated 7-term chains of single exact
    divisions (the events_chi2 discipline) and F as two more fixed
    divisions."""
    gs = range(7)
    cells = ", ".join(
        f"CAST(SUM(CASE WHEN dow = {g} THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS n{g}, "
        f"CAST(SUM(CASE WHEN dow = {g} THEN cnt ELSE 0 END) AS BIGINT) "
        f"AS s{g}, "
        f"CAST(SUM(CASE WHEN dow = {g} THEN cnt * cnt ELSE 0 END) "
        f"AS BIGINT) AS q{g}"
        for g in gs
    )
    ssw = " + ".join(
        f"(CAST(n{g} * q{g} - s{g} * s{g} AS DOUBLE) / CAST(n{g} AS DOUBLE))"
        for g in gs
    )
    ssb_terms = " + ".join(
        f"(CAST(s{g} * s{g} AS DOUBLE) / CAST(n{g} AS DOUBLE))" for g in gs
    )
    ssb = f"({ssb_terms}) - CAST(s * s AS DOUBLE) / CAST(n AS DOUBLE)"
    guards = " AND ".join(f"n{g} > 0" for g in gs)
    return (
        "WITH dt AS (SELECT strftime(ts, '%Y-%m-%d') AS day, "
        " CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1), "
        "dd AS (SELECT cnt, (CAST(day AS DATE) - DATE '2024-01-01') % 7 "
        " AS dow FROM dt), "
        f"o AS (SELECT {cells}, CAST(COUNT(*) AS BIGINT) AS n, "
        " CAST(SUM(cnt) AS BIGINT) AS s FROM dd), "
        f"x AS (SELECT n, ({ssw}) AS ssw, ({ssb}) AS ssb FROM o "
        f" WHERE {guards} AND n > 7) "
        "SELECT n AS n_days, "
        "printf('%.6f', ROUND(ssb, 6)) AS ss_between, "
        "printf('%.6f', ROUND(ssw, 6)) AS ss_within, "
        "printf('%.6f', ROUND((ssb / CAST(6 AS DOUBLE)) "
        " / (ssw / CAST(n - 7 AS DOUBLE)), 6)) AS f_stat "
        "FROM x WHERE ssw > 0"
    )


@register("events_anova", _anova_sql())
def events_anova(spark, sf):
    """One-way ANOVA of daily volume across the seven weekdays — the
    continuous-outcome complement of ``events_cramers_v`` (Cramér tests
    whether the TYPE MIX shifts by weekday; ANOVA tests whether the
    VOLUME LEVEL does — 'is there a weekday effect?' is the first
    seasonality question, and F is its classical answer next to
    ``events_seasonality``'s descriptive profile).

    Float discipline: per-weekday moments (n, S, Q = sum of squares)
    are exact BIGINTs from one conditional-aggregation pass; SSW and
    SSB are EXPLICIT left-associated 7-term chains — each term ONE
    exact-integer division ((nQ - S^2)/n and S^2/n respectively, the
    events_chi2 per-cell shape) — and F is two further fixed divisions;
    everything spelled identically on both engines. Contract: all
    seven weekday groups nonempty and n > 7 (integer guards both
    sides; df fixed at 6 / n-7).

    Scale shape: one map-side-combinable fact collapse to the calendar
    day grain, one conditional-aggregation collapse to a single
    22-integer row — the events_chi2 shape over the weekday split."""
    dt = day_totals(_events(spark, sf))
    dd = dt.select(
        "cnt",
        F.pmod(
            F.datediff(F.to_date("day"), F.lit("2024-01-01").cast("date")),
            F.lit(7),
        )
        .cast("long")
        .alias("dow"),
    )
    import functools
    import operator

    gs = range(7)
    aggs = []
    for g in gs:
        aggs += [
            F.sum(F.when(F.col("dow") == g, 1).otherwise(0))
            .cast("long")
            .alias(f"n{g}"),
            F.sum(F.when(F.col("dow") == g, F.col("cnt")).otherwise(0))
            .cast("long")
            .alias(f"s{g}"),
            F.sum(
                F.when(F.col("dow") == g, F.col("cnt") * F.col("cnt"))
                .otherwise(0)
            )
            .cast("long")
            .alias(f"q{g}"),
        ]
    o = dd.agg(
        *aggs,
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cnt").cast("long").alias("s"),
    )
    ssw = functools.reduce(
        operator.add,
        [
            (
                F.col(f"n{g}") * F.col(f"q{g}")
                - F.col(f"s{g}") * F.col(f"s{g}")
            ).cast("double")
            / F.col(f"n{g}").cast("double")
            for g in gs
        ],
    )
    ssb = functools.reduce(
        operator.add,
        [
            (F.col(f"s{g}") * F.col(f"s{g}")).cast("double")
            / F.col(f"n{g}").cast("double")
            for g in gs
        ],
    ) - (F.col("s") * F.col("s")).cast("double") / F.col("n").cast("double")
    guard = functools.reduce(
        operator.and_, [F.col(f"n{g}") > 0 for g in gs]
    ) & (F.col("n") > 7)
    x = o.filter(guard).select(
        "n", ssw.alias("ssw"), ssb.alias("ssb")
    )
    return x.filter(F.col("ssw") > 0).select(
        F.col("n").alias("n_days"),
        _FMT6(F.col("ssb")).alias("ss_between"),
        _FMT6(F.col("ssw")).alias("ss_within"),
        _FMT6(
            (F.col("ssb") / F.lit(6).cast("double"))
            / (F.col("ssw") / (F.col("n") - 7).cast("double"))
        ).alias("f_stat"),
    )


# ------------------------------------------------------- Tukey fences ----

@register(
    "events_tukey_fences",
    # Tukey boxplot outlier fences on purchase cents: Q1/Q3 are
    # RANK-SELECTED (cum*4 >= n / cum*4 >= 3n over the cents-grain
    # cumsum); the 1.5*IQR fences are decided by exact integer
    # cross-multiplies (2*cents vs 2*Q1 - 3*IQR) so no float ever
    # gates a count; the only division is the display ratio.
    "WITH c AS (SELECT CAST(FLOOR(value * 100) AS BIGINT) AS cents "
    " FROM events WHERE event_type = 'purchase'), "
    "g AS (SELECT cents, CAST(COUNT(*) AS BIGINT) AS cnt FROM c "
    " GROUP BY cents), "
    "cu AS (SELECT cents, cnt, CAST(SUM(cnt) OVER (ORDER BY cents "
    " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum "
    " FROM g), "
    "t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM g), "
    "q1 AS (SELECT MIN(cents) AS q1 FROM cu, t WHERE cum * 4 >= n), "
    "q3 AS (SELECT MIN(cents) AS q3 FROM cu, t WHERE cum * 4 >= 3 * n), "
    "s AS (SELECT "
    " CAST(SUM(CASE WHEN 2 * g.cents < 2 * q1 - 3 * (q3 - q1) "
    "  THEN cnt ELSE 0 END) AS BIGINT) AS n_low, "
    " CAST(SUM(CASE WHEN 2 * g.cents > 2 * q3 + 3 * (q3 - q1) "
    "  THEN cnt ELSE 0 END) AS BIGINT) AS n_high "
    " FROM g, q1, q3) "
    "SELECT n, q1 AS q1_cents, q3 AS q3_cents, n_low, n_high, "
    "printf('%.6f', ROUND(CAST(n_low + n_high AS DOUBLE) / n, 6)) "
    " AS outlier_ratio "
    "FROM s, t, q1, q3 WHERE n > 0",
)
def events_tukey_fences(spark, sf):
    """Tukey boxplot outlier fences over purchase amounts — the IQR
    outlier rule every BI boxplot draws, completing the robust outlier
    family (``events_outlier_mad`` flags by median absolute deviation;
    Tukey's 1.5*IQR fences are the quartile-school counterpart and the
    one analysts eyeball first).

    Float discipline: amounts bin to exact integer cents; Q1/Q3 are
    RANK-SELECTED via integer cross-multiplies over the cents-grain
    cumsum (the events_winsorized_mean rule); the fences are decided
    entirely by the exact comparisons 2*cents < 2*Q1 - 3*IQR and
    2*cents > 2*Q3 + 3*IQR — the halves scale away, so no float ever
    gates a count; the outlier ratio is ONE division under
    ROUND + %.6f.

    Scale shape: one map-side-combinable fact collapse to the bounded
    cents grain, one ordered cumsum window over that dimension table,
    two one-row selections, one dimension-grain conditional sum."""
    return tukey_rollup(purchase_cents_counts(_events(spark, sf)))


def tukey_rollup(g: DataFrame) -> DataFrame:
    """Fold a (cents, cnt) grain into the one-row Tukey-fence readout —
    shared by ``events_tukey_fences`` and its streaming twin."""
    wcum = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cu = g.select(
        "cents", "cnt", F.sum("cnt").over(wcum).cast("long").alias("cum")
    )
    t = g.agg(F.sum("cnt").cast("long").alias("n"))
    q1 = (
        cu.crossJoin(F.broadcast(t))
        .filter(F.col("cum") * 4 >= F.col("n"))
        .agg(F.min("cents").alias("q1"))
    )
    q3 = (
        cu.crossJoin(F.broadcast(t))
        .filter(F.col("cum") * 4 >= 3 * F.col("n"))
        .agg(F.min("cents").alias("q3"))
    )
    iqr = F.col("q3") - F.col("q1")
    s = (
        g.crossJoin(F.broadcast(q1))
        .crossJoin(F.broadcast(q3))
        .agg(
            F.sum(
                F.when(
                    2 * F.col("cents") < 2 * F.col("q1") - 3 * iqr,
                    F.col("cnt"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_low"),
            F.sum(
                F.when(
                    2 * F.col("cents") > 2 * F.col("q3") + 3 * iqr,
                    F.col("cnt"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_high"),
            F.min("q1").alias("q1_cents"),
            F.min("q3").alias("q3_cents"),
        )
    )
    return (
        s.crossJoin(F.broadcast(t))
        .filter(F.col("n") > 0)
        .select(
            "n",
            "q1_cents",
            "q3_cents",
            "n_low",
            "n_high",
            _FMT6(
                (F.col("n_low") + F.col("n_high")).cast("double")
                / F.col("n")
            ).alias("outlier_ratio"),
        )
    )


# ------------------------------------------------ Fisher dispersion index --

@register(
    "events_dispersion",
    # Fisher dispersion index of daily volume (variance-to-mean ratio —
    # the Poisson test): D = s^2/mean collapses to ONE division of
    # exact BIGINTs, (n*Q - S^2) / ((n-1)*S); the overdispersed flag is
    # the equivalent integer cross-multiply, so no float ever decides.
    "WITH dt AS (SELECT strftime(ts, '%Y-%m-%d') AS day, "
    " CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1), "
    "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
    " CAST(SUM(cnt) AS BIGINT) AS s, "
    " CAST(SUM(cnt * cnt) AS BIGINT) AS q FROM dt) "
    "SELECT n AS n_days, s AS total_events, "
    "printf('%.6f', ROUND(CAST(n * q - s * s AS DOUBLE) "
    " / CAST((n - 1) * s AS DOUBLE), 6)) AS dispersion, "
    "n * q - s * s > (n - 1) * s AS overdispersed "
    "FROM m WHERE n > 1 AND s > 0",
)
def events_dispersion(spark, sf):
    """Fisher dispersion index of daily volume — the variance-to-mean
    ratio that tests the Poisson null (D ~ 1 for independent arrivals;
    D >> 1 means bursty/clustered traffic — the regime question
    ``events_runs_test`` asks about signs, answered here about
    magnitudes; under the null (n-1)*D is chi-square, so D is also the
    textbook overdispersion gate before fitting any count model).

    Float discipline: s^2/mean over the daily grain collapses to
    (n*Q - S^2)/((n-1)*S) — ONE correctly-rounded IEEE division of
    exact BIGINTs (at 100 TB: DECIMAL(38,0), the agg_weighted_stats
    note) under ROUND + %.6f; the overdispersed flag is the EXACT
    integer cross-multiply n*Q - S^2 > (n-1)*S, so the boundary never
    touches a float.

    Scale shape: one map-side-combinable fact collapse to the calendar
    day grain, one 3-integer rollup — the cheapest possible test."""
    dt = day_totals(_events(spark, sf))
    m = dt.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cnt").cast("long").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("q"),
    )
    n, s, q = F.col("n"), F.col("s"), F.col("q")
    return m.filter((n > 1) & (s > 0)).select(
        n.alias("n_days"),
        s.alias("total_events"),
        _FMT6(
            (n * q - s * s).cast("double") / ((n - 1) * s).cast("double")
        ).alias("dispersion"),
        (n * q - s * s > (n - 1) * s).alias("overdispersed"),
    )


# ------------------------------------------------ Bowley quartile skew ----

@register(
    "events_bowley_skew",
    # Bowley's quartile skewness of purchase cents: (Q3 + Q1 - 2*Q2)
    # / (Q3 - Q1) with all three quartiles RANK-SELECTED — ONE division
    # of exact integers.
    "WITH c AS (SELECT CAST(FLOOR(value * 100) AS BIGINT) AS cents "
    " FROM events WHERE event_type = 'purchase'), "
    "g AS (SELECT cents, CAST(COUNT(*) AS BIGINT) AS cnt FROM c "
    " GROUP BY cents), "
    "cu AS (SELECT cents, CAST(SUM(cnt) OVER (ORDER BY cents "
    " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum "
    " FROM g), "
    "t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM g), "
    "q1 AS (SELECT MIN(cents) AS q1 FROM cu, t WHERE cum * 4 >= n), "
    "q2 AS (SELECT MIN(cents) AS q2 FROM cu, t WHERE cum * 4 >= 2 * n), "
    "q3 AS (SELECT MIN(cents) AS q3 FROM cu, t WHERE cum * 4 >= 3 * n) "
    "SELECT n AS n_purchases, q1 AS q1_cents, q2 AS q2_cents, "
    "q3 AS q3_cents, "
    "printf('%.6f', ROUND(CAST(q3 + q1 - 2 * q2 AS DOUBLE) "
    " / CAST(q3 - q1 AS DOUBLE), 6)) AS bowley_skew "
    "FROM t, q1, q2, q3 WHERE q3 > q1",
)
def events_bowley_skew(spark, sf):
    """Bowley's quartile skewness of purchase amounts — the robust,
    bounded [-1, 1] skewness a revenue dashboard shows next to the
    boxplot (``agg_moments``' third moment is whale-dominated; Bowley's
    coefficient reads asymmetry from the quartiles alone and pairs
    naturally with ``events_tukey_fences``, whose Q1/Q3 it shares).

    Float discipline: all three quartiles are RANK-SELECTED exact
    integer cents (the events_winsorized_mean cross-multiply rule);
    the coefficient is ONE correctly-rounded IEEE division of exact
    integers under ROUND + %.6f; the degenerate zero-IQR corpus is
    filtered by the exact guard q3 > q1 on both engines.

    Scale shape: the events_tukey_fences shape — one fact collapse to
    the bounded cents grain, one cumsum window, three one-row
    selections."""
    return bowley_rollup(purchase_cents_counts(_events(spark, sf)))


def bowley_rollup(g: DataFrame) -> DataFrame:
    """Fold a (cents, cnt) grain into the one-row Bowley-skew readout —
    shared by ``events_bowley_skew`` and its streaming twin."""
    wcum = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cu = g.select(
        "cents", F.sum("cnt").over(wcum).cast("long").alias("cum")
    )
    t = g.agg(F.sum("cnt").cast("long").alias("n"))
    sel = lambda k, name: (  # noqa: E731
        cu.crossJoin(F.broadcast(t))
        .filter(F.col("cum") * 4 >= k * F.col("n"))
        .agg(F.min("cents").alias(name))
    )
    q1, q2, q3 = sel(1, "q1"), sel(2, "q2"), sel(3, "q3")
    return (
        t.crossJoin(F.broadcast(q1))
        .crossJoin(F.broadcast(q2))
        .crossJoin(F.broadcast(q3))
        .filter(F.col("q3") > F.col("q1"))
        .select(
            F.col("n").alias("n_purchases"),
            F.col("q1").alias("q1_cents"),
            F.col("q2").alias("q2_cents"),
            F.col("q3").alias("q3_cents"),
            _FMT6(
                (F.col("q3") + F.col("q1") - 2 * F.col("q2")).cast("double")
                / (F.col("q3") - F.col("q1")).cast("double")
            ).alias("bowley_skew"),
        )
    )


# ------------------------------------------------------- Lorenz curve ----

@register(
    "events_lorenz",
    # Lorenz curve of user activity at nine user-count deciles: order
    # users by (volume, user_id), cut at rank ceil(k*n/10) via the
    # exact cross-multiply, and report the bottom share — ONE division
    # of exact BIGINTs per point.
    "WITH u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt "
    " FROM events GROUP BY user_id), "
    "r AS (SELECT cnt, CAST(ROW_NUMBER() OVER (ORDER BY cnt, user_id) "
    " AS BIGINT) AS rn, CAST(SUM(cnt) OVER (ORDER BY cnt, user_id "
    " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
    " AS cum FROM u), "
    "t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
    " CAST(SUM(cnt) AS BIGINT) AS s FROM u), "
    "ks AS (SELECT unnest(generate_series(1, 9)) AS decile), "
    "p AS (SELECT decile, MIN(rn) AS rk FROM r, t, ks "
    " WHERE rn * 10 >= n * decile GROUP BY decile) "
    "SELECT CAST(p.decile AS BIGINT) AS decile, p.rk AS n_users, "
    "r.cum AS cum_events, "
    "printf('%.6f', ROUND(CAST(r.cum AS DOUBLE) / t.s, 6)) AS share "
    "FROM p JOIN r ON r.rn = p.rk, t",
)
def events_lorenz(spark, sf):
    """Lorenz curve of user activity — the cumulative share of events
    held by the bottom k/10 of users, the curve ``events_concentration``
    integrates into its Gini (the Gini is one number; the curve shows
    WHERE the inequality lives, which is what a capacity planner or
    abuse team actually reads) and the head-count complement of
    ``events_pareto``'s tail question.

    Float discipline: users order totally by (volume, user_id); each
    decile cut is RANK-SELECTED via the exact cross-multiply
    rn*10 >= n*k; the cumulative volume at the cut is an exact BIGINT
    from the ordered cumsum, and each share is ONE division under
    ROUND + %.6f.

    Scale shape: one map-side-combinable fact collapse to the user
    grain; the rank/cumsum window runs over users (at 100 TB: swap for
    the volume-binned cumsum — the events_winsorized_mean discipline —
    since volumes are small integers); the decile join is 9 rows."""
    return lorenz_rollup(user_counts(_events(spark, sf)))


def user_counts(df: DataFrame) -> DataFrame:
    """(user_id, cnt) activity grain — shared by ``events_lorenz`` and
    its streaming twin (plain SUM-able counts)."""
    return df.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def lorenz_rollup(u: DataFrame) -> DataFrame:
    """Nine-decile Lorenz rollup over a (user_id, cnt) grain — shared
    by the batch key and its streaming twin."""
    spark = u.sparkSession
    w = Window.orderBy("cnt", "user_id")
    r = u.select(
        "cnt",
        F.row_number().over(w).cast("long").alias("rn"),
        F.sum("cnt")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("cum"),
    ).localCheckpoint()
    t = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cnt").cast("long").alias("s"),
    )
    ks = spark.range(1, 10).select(F.col("id").cast("long").alias("decile"))
    p = (
        r.crossJoin(F.broadcast(t))
        .crossJoin(F.broadcast(ks))
        .filter(F.col("rn") * 10 >= F.col("n") * F.col("decile"))
        .groupBy("decile")
        .agg(F.min("rn").alias("rk"))
    )
    return (
        p.join(r, p["rk"] == r["rn"])
        .crossJoin(F.broadcast(t))
        .select(
            "decile",
            F.col("rk").alias("n_users"),
            F.col("cum").alias("cum_events"),
            _FMT6(F.col("cum").cast("double") / F.col("s")).alias("share"),
        )
    )


# ------------------------------------------------ daily-health macro ----

@register(
    "macro_daily_health",
    # One-row daily-series health report composing the family's newest
    # contracts over ONE day-totals grain: exact mean + jackknife SE,
    # the Fisher dispersion index, the runs-test z, and the Holt
    # one-step forecast of the total series (the recursion composed in
    # the same WITH RECURSIVE — the macro_series_profile discipline).
    "WITH RECURSIVE dt AS (SELECT strftime(ts, '%Y-%m-%d') AS day, "
    " CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1), "
    "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
    " CAST(SUM(cnt) AS BIGINT) AS s, "
    " CAST(SUM(cnt * cnt) AS BIGINT) AS q FROM dt), "
    "jk AS (SELECT CAST(SUM(CAST(s - n * cnt AS HUGEINT) "
    " * (s - n * cnt)) AS HUGEINT) AS jq FROM dt, m), "
    "g AS (SELECT cnt, CAST(COUNT(*) AS BIGINT) AS k FROM dt GROUP BY cnt), "
    "cu AS (SELECT cnt, CAST(SUM(k) OVER (ORDER BY cnt "
    " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum "
    " FROM g), "
    "med AS (SELECT MIN(cnt) AS med FROM cu, m WHERE cum >= (n + 1) // 2), "
    "sg AS (SELECT day, CASE WHEN cnt > med THEN 1 ELSE -1 END AS sgn "
    " FROM dt, med WHERE cnt <> med), "
    "rr AS (SELECT sgn, LAG(sgn) OVER (ORDER BY day) AS prev FROM sg), "
    "rm AS (SELECT "
    " CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1, "
    " CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n2, "
    " CAST(1 + SUM(CASE WHEN prev IS NOT NULL AND sgn <> prev "
    "  THEN 1 ELSE 0 END) AS BIGINT) AS runs FROM rr), "
    "r AS (SELECT cnt, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) "
    " AS rn FROM dt), "
    "e(rn, l, b) AS ("
    " SELECT rn, CAST(cnt AS DOUBLE), CAST(0 AS DOUBLE) FROM r "
    " WHERE rn = 1 "
    " UNION ALL "
    " SELECT r.rn, (CAST(r.cnt AS DOUBLE) + (e.l + e.b)) / 2, "
    " (((CAST(r.cnt AS DOUBLE) + (e.l + e.b)) / 2 - e.l) + e.b) / 2 "
    " FROM e JOIN r ON r.rn = e.rn + 1), "
    "hf AS (SELECT l, b FROM e, m WHERE e.rn = m.n) "
    "SELECT n AS n_days, s AS total_events, "
    "printf('%.6f', ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6)) "
    " AS mean_daily, "
    "printf('%.6f', ROUND(SQRT(CAST(jq AS DOUBLE) "
    " / CAST(CAST(n AS HUGEINT) * n * n * (n - 1) AS DOUBLE)), 6)) "
    " AS jackknife_se, "
    "printf('%.6f', ROUND(CAST(n * q - s * s AS DOUBLE) "
    " / CAST((n - 1) * s AS DOUBLE), 6)) AS dispersion, "
    "printf('%.6f', ROUND((CAST(runs AS DOUBLE) "
    " - (1.0 + CAST(2 * n1 * n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))) "
    " / SQRT(CAST(2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) AS DOUBLE) "
    "   / CAST((n1 + n2) * (n1 + n2) * (n1 + n2 - 1) AS DOUBLE)), 6)) "
    " AS runs_z, "
    "printf('%.6f', ROUND(l + b, 6)) AS holt_forecast "
    "FROM m, jk, rm, hf WHERE n > 1 AND s > 0 "
    "AND n1 > 0 AND n2 > 0 AND 2 * n1 * n2 > n1 + n2",
)
def macro_daily_health(spark, sf):
    """One-row daily-series health report — the monitoring summary an
    ops dashboard publishes each morning, composing the newest
    daily-grain contracts over ONE shared ``day_totals`` grain: the
    exact mean with its jackknife error bar, the Fisher dispersion
    index (burstiness), the runs-test z (regime behavior), and the
    Holt one-step forecast of total volume. Green here pins the
    COMPOSITION (the macro_series_profile rationale — the oracle
    composes the Holt recursion inside the same WITH RECURSIVE).

    Float discipline: each readout keeps its per-key contract exactly
    (single divisions of exact integers, the fixed runs z chain, the
    fold-vs-recursion Holt); nothing new is introduced by composition.

    Scale shape: one map-side-combinable fact collapse to the calendar
    day grain; every downstream stage is dimension-sized and shares
    that one grain — facts are touched once."""
    return daily_health_rollup(day_totals(_events(spark, sf)))


def daily_health_rollup(dt: DataFrame) -> DataFrame:
    """Fold a (day, cnt) daily-totals grain into the one-row health
    report — shared by ``macro_daily_health`` and its streaming twin
    (composes the shared ``runs_rollup`` and ``holt_rollup``)."""
    dt = dt.localCheckpoint()
    m = dt.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cnt").cast("long").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("q"),
    )
    jk = (
        dt.crossJoin(F.broadcast(m))
        .select(
            (
                (F.col("s") - F.col("n") * F.col("cnt")).cast("decimal(38,0)")
                * (F.col("s") - F.col("n") * F.col("cnt"))
            ).alias("sq")
        )
        .agg(F.sum("sq").cast("decimal(38,0)").alias("jq"))
    )
    runs = runs_rollup(dt).select(F.col("z").alias("runs_z"))
    holt = holt_rollup(
        dt.withColumn("event_type", F.lit("__all__"))
    ).select(F.col("forecast_1").alias("holt_forecast"))
    n, s, q = F.col("n"), F.col("s"), F.col("q")
    den = (
        n.cast("decimal(38,0)") * n * n * (n - 1)
    ).cast("double")
    return (
        m.crossJoin(F.broadcast(jk))
        .crossJoin(F.broadcast(runs))
        .crossJoin(F.broadcast(holt))
        .filter((n > 1) & (s > 0))
        .select(
            n.alias("n_days"),
            s.alias("total_events"),
            _FMT6(s.cast("double") / n.cast("double")).alias("mean_daily"),
            _FMT6(F.sqrt(F.col("jq").cast("double") / den)).alias(
                "jackknife_se"
            ),
            _FMT6(
                (n * q - s * s).cast("double") / ((n - 1) * s).cast("double")
            ).alias("dispersion"),
            "runs_z",
            "holt_forecast",
        )
    )


# ----------------------------------------- Wilcoxon signed-rank / sign ----

def paired_prepost(df: DataFrame) -> DataFrame:
    """Per-user (x, y) total activity counts under the fixed Jan-16
    cut — the shared PAIRED-sample grain for ``events_wilcoxon`` and
    ``events_sign_test`` (plain SUMs, exactly mergeable across
    micro-batches; the symmetric-activity sibling of ``user_xy``'s
    CUPED grain). NOT named user_prepost: that is the DiD family's
    purchase-restricted (pre, post) grain earlier in this module, and
    a same-name redefinition silently shadows it module-wide (the
    events_did regression this rename fixed)."""
    cut = F.lit("2024-01-16").cast("timestamp")
    return df.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cut, 1).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(F.when(F.col("ts") >= cut, 1).otherwise(0))
        .cast("long")
        .alias("y"),
    )


@register(
    "events_wilcoxon",
    # Wilcoxon signed-rank test on per-user pre/post activity: doubled
    # midranks of |diff| over the diff-magnitude grain are exact
    # integers (the events_spearman trick), the tie correction comes
    # from the same grain, and z is one fixed chain — the factor-4
    # scaling of numerator and variance cancels exactly.
    "WITH u AS (SELECT user_id, "
    " CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) "
    "  AS BIGINT) AS x, "
    " CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) "
    "  AS BIGINT) AS y FROM events GROUP BY user_id), "
    "d AS (SELECT y - x AS d, ABS(y - x) AS a FROM u WHERE y <> x), "
    "g AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS t FROM d GROUP BY a), "
    "r AS (SELECT a, CAST(2 * SUM(t) OVER (ORDER BY a "
    " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t + 1 "
    " AS BIGINT) AS dr FROM g), "
    "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
    " CAST(SUM(CASE WHEN d.d > 0 THEN r.dr ELSE 0 END) AS BIGINT) AS dw "
    " FROM d JOIN r ON r.a = d.a), "
    "tt AS (SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tcorr FROM g) "
    "SELECT n AS n_pairs, dw AS w_plus_doubled, "
    "printf('%.6f', ROUND(CAST(2 * dw - n * (n + 1) AS DOUBLE) "
    " / SQRT(CAST(2 * n * (n + 1) * (2 * n + 1) - tcorr AS DOUBLE) "
    "  / CAST(3 AS DOUBLE)), 6)) AS z "
    "FROM m, tt WHERE 2 * n * (n + 1) * (2 * n + 1) > tcorr",
)
def events_wilcoxon(spark, sf):
    """Wilcoxon signed-rank test on per-user pre/post activity — the
    nonparametric PAIRED test (did the same users move?) completing
    the test family: ``events_mann_whitney`` compares two independent
    groups, ``events_ab_test`` assumes normality; the signed-rank test
    is what an analyst runs when the pairing is real and the counts
    are skewed. Zero diffs are excluded per the standard treatment;
    normal approximation with exact tie correction.

    Float discipline: doubled midranks of |diff| over the bounded
    diff-magnitude grain are exact INTEGERS (2*cum - t + 1 — the
    events_spearman trick), so W+ doubles to an exact BIGINT; the tie
    correction sum(t^3 - t) is exact; and z is ONE fixed chain —
    z = (2*DW - n(n+1)) / sqrt((2n(n+1)(2n+1) - T)/3), the factor-4
    numerator/variance scaling cancelling exactly — spelled identically
    on both engines. Degenerate all-tied corpora are filtered by the
    exact integer variance guard.

    Scale shape: one map-side-combinable fact collapse to the user
    grain, one bounded magnitude-grain rank table broadcast back, one
    three-integer rollup — the events_spearman shape for paired data."""
    return wilcoxon_rollup(paired_prepost(_events(spark, sf)))


def wilcoxon_rollup(u: DataFrame) -> DataFrame:
    """Fold a per-user (x, y) paired grain into the one-row signed-rank
    readout — shared by ``events_wilcoxon`` and any streaming twin
    (the doubled-midrank integer contract lives here)."""
    d = u.filter(F.col("y") != F.col("x")).select(
        (F.col("y") - F.col("x")).alias("d"),
        F.abs(F.col("y") - F.col("x")).alias("a"),
    )
    g = d.groupBy("a").agg(F.count(F.lit(1)).cast("long").alias("t"))
    wcum = Window.orderBy("a").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = g.select(
        "a",
        (2 * F.sum("t").over(wcum) - F.col("t") + 1)
        .cast("long")
        .alias("dr"),
    )
    m = d.join(F.broadcast(r), "a").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("d") > 0, F.col("dr")).otherwise(0))
        .cast("long")
        .alias("dw"),
    )
    tt = g.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long")
        .alias("tcorr")
    )
    n, dw, tc = F.col("n"), F.col("dw"), F.col("tcorr")
    var16x3 = 2 * n * (n + 1) * (2 * n + 1) - tc
    return (
        m.crossJoin(F.broadcast(tt))
        .filter(var16x3 > 0)
        .select(
            n.alias("n_pairs"),
            dw.alias("w_plus_doubled"),
            _FMT6(
                (2 * dw - n * (n + 1)).cast("double")
                / F.sqrt(var16x3.cast("double") / F.lit(3).cast("double"))
            ).alias("z"),
        )
    )


@register(
    "events_sign_test",
    # Sign test on the same paired grain: direction counts only, z =
    # (n_pos - n_neg)/sqrt(n) — exact integers, one cast, one sqrt,
    # one division.
    "WITH u AS (SELECT user_id, "
    " CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) "
    "  AS BIGINT) AS x, "
    " CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) "
    "  AS BIGINT) AS y FROM events GROUP BY user_id), "
    "m AS (SELECT "
    " CAST(SUM(CASE WHEN y > x THEN 1 ELSE 0 END) AS BIGINT) AS np, "
    " CAST(SUM(CASE WHEN y < x THEN 1 ELSE 0 END) AS BIGINT) AS nn "
    " FROM u) "
    "SELECT np AS n_pos, nn AS n_neg, "
    "printf('%.6f', ROUND(CAST(np - nn AS DOUBLE) "
    " / SQRT(CAST(np + nn AS DOUBLE)), 6)) AS z "
    "FROM m WHERE np + nn > 0",
)
def events_sign_test(spark, sf):
    """Sign test on per-user pre/post activity — the
    assumption-free floor of the paired-test family (``events_wilcoxon``
    uses rank magnitudes; the sign test uses direction only, so it
    survives ANY distributional pathology and is the sanity row next
    to the signed-rank z on a test report). Ties excluded per the
    standard treatment; normal approximation of the binomial null.

    Float discipline: direction counts are exact BIGINTs; z =
    (n_pos - n_neg)/sqrt(n_pos + n_neg) is one exact cast, one
    correctly-rounded sqrt, one IEEE division under ROUND + %.6f.

    Scale shape: one map-side-combinable fact collapse to the shared
    ``paired_prepost`` grain, one two-integer rollup — the cheapest
    paired test that exists."""
    u = paired_prepost(_events(spark, sf))
    m = u.agg(
        F.sum(F.when(F.col("y") > F.col("x"), 1).otherwise(0))
        .cast("long")
        .alias("np"),
        F.sum(F.when(F.col("y") < F.col("x"), 1).otherwise(0))
        .cast("long")
        .alias("nn"),
    )
    np_, nn_ = F.col("np"), F.col("nn")
    return m.filter(np_ + nn_ > 0).select(
        np_.alias("n_pos"),
        nn_.alias("n_neg"),
        _FMT6(
            (np_ - nn_).cast("double") / F.sqrt((np_ + nn_).cast("double"))
        ).alias("z"),
    )


# ------------------------------------------------ hour-of-day profile ----

@register(
    "events_hourly_profile",
    # Hour-of-day volume histogram with the exact-integer peak flag:
    # hour extraction is identical on both engines under the UTC
    # session; the share is one division per row.
    "WITH h AS (SELECT CAST(hour(ts) AS BIGINT) AS hour_of_day, "
    " CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1), "
    "t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total, "
    " CAST(MAX(cnt) AS BIGINT) AS mx FROM h) "
    "SELECT hour_of_day, cnt, "
    "printf('%.6f', ROUND(CAST(cnt AS DOUBLE) / total, 6)) AS share, "
    "cnt = mx AS is_peak FROM h, t",
)
def events_hourly_profile(spark, sf):
    """Hour-of-day volume profile — the intraday seasonality histogram
    every ops dashboard draws (the weekday family — cramers/anova —
    reads the WEEKLY cycle; this reads the DAILY one, which is what
    capacity autoscaling is actually keyed to). 24 rows with each
    hour's share and an exact peak flag.

    Float discipline: counts are exact BIGINTs; hour extraction is
    identical on both engines under the pinned UTC session (the
    TIMESTAMP_NTZ events.ts carries no zone — the events_attribution
    precedent); each share is ONE division under ROUND + %.6f and the
    peak flag is an exact integer comparison.

    Scale shape: one map-side-combinable fact collapse onto the 24-row
    hour domain plus a broadcast 1-row total — the cheapest profile
    shape."""
    return hourly_rollup(hour_counts(_events(spark, sf)))


def hour_counts(df: DataFrame) -> DataFrame:
    """(hour_of_day, cnt) grain — shared by ``events_hourly_profile``
    and its streaming twin (plain SUM-able counts)."""
    return df.groupBy(
        F.hour("ts").cast("long").alias("hour_of_day")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))


def hourly_rollup(h: DataFrame) -> DataFrame:
    """Share/peak rollup over an (hour_of_day, cnt) grain — shared by
    the batch key and its streaming twin."""
    t = h.agg(
        F.sum("cnt").cast("long").alias("total"),
        F.max("cnt").cast("long").alias("mx"),
    )
    return h.crossJoin(F.broadcast(t)).select(
        "hour_of_day",
        "cnt",
        _FMT6(F.col("cnt").cast("double") / F.col("total")).alias("share"),
        (F.col("cnt") == F.col("mx")).alias("is_peak"),
    )


# ------------------------------------------------ amount-profile macro ----

@register(
    "macro_amount_profile",
    # One-row purchase-amount distribution report composing the cents
    # family over ONE grain: rank-selected quartiles, Tukey outlier
    # counts, winsorized/raw means, and Bowley skew — every contract
    # exactly as its per-key oracle spells it.
    "WITH c AS (SELECT CAST(FLOOR(value * 100) AS BIGINT) AS cents "
    " FROM events WHERE event_type = 'purchase'), "
    "g AS (SELECT cents, CAST(COUNT(*) AS BIGINT) AS cnt FROM c "
    " GROUP BY cents), "
    "cu AS (SELECT cents, cnt, CAST(SUM(cnt) OVER (ORDER BY cents "
    " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum "
    " FROM g), "
    "t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM g), "
    "q1 AS (SELECT MIN(cents) AS q1 FROM cu, t WHERE cum * 4 >= n), "
    "q2 AS (SELECT MIN(cents) AS q2 FROM cu, t WHERE cum * 4 >= 2 * n), "
    "q3 AS (SELECT MIN(cents) AS q3 FROM cu, t WHERE cum * 4 >= 3 * n), "
    "lo AS (SELECT MIN(cents) AS lo_cents FROM cu, t "
    " WHERE cum * 100 >= n * 5), "
    "hi AS (SELECT MIN(cents) AS hi_cents FROM cu, t "
    " WHERE cum * 100 >= n * 95), "
    "s AS (SELECT CAST(SUM(LEAST(GREATEST(g.cents, lo_cents), hi_cents) "
    "  * cnt) AS BIGINT) AS wsum, CAST(SUM(g.cents * cnt) AS BIGINT) "
    "  AS rsum FROM g, lo, hi), "
    "f AS (SELECT "
    " CAST(SUM(CASE WHEN 2 * g.cents < 2 * q1 - 3 * (q3 - q1) "
    "  THEN cnt ELSE 0 END) AS BIGINT) AS n_low, "
    " CAST(SUM(CASE WHEN 2 * g.cents > 2 * q3 + 3 * (q3 - q1) "
    "  THEN cnt ELSE 0 END) AS BIGINT) AS n_high FROM g, q1, q3) "
    "SELECT n AS n_purchases, q1 AS q1_cents, q2 AS q2_cents, "
    "q3 AS q3_cents, f.n_low + f.n_high AS n_outliers, "
    "printf('%.6f', ROUND(CAST(wsum AS DOUBLE) / (100 * n), 6)) "
    " AS winsorized_mean, "
    "printf('%.6f', ROUND(CAST(rsum AS DOUBLE) / (100 * n), 6)) "
    " AS raw_mean, "
    "printf('%.6f', ROUND(CAST(q3 + q1 - 2 * q2 AS DOUBLE) "
    " / CAST(q3 - q1 AS DOUBLE), 6)) AS bowley_skew "
    "FROM t, q1, q2, q3, s, f WHERE n > 0 AND q3 > q1",
)
def macro_amount_profile(spark, sf):
    """One-row purchase-amount distribution report — the revenue-
    distribution summary a finance dashboard publishes, composing the
    cents family's contracts over ONE grain: rank-selected quartiles,
    Tukey outlier counts, winsorized vs raw mean, and Bowley skew.
    Green here pins the COMPOSITION (the macro_daily_health rationale
    for the amount axis); pytest additionally reconciles every column
    against its per-key output.

    Float discipline: unchanged from the per-keys — rank selection by
    exact cross-multiplies, fences decided by exact integers, each
    reported float ONE division under ROUND + %.6f.

    Scale shape: one map-side-combinable fact collapse to the bounded
    cents grain; one cumsum window over that dimension table feeds
    every selection; five 1-row selections and two dimension-grain
    conditional sums finish it — facts touched once."""
    return amount_profile_rollup(purchase_cents_counts(_events(spark, sf)))


def amount_profile_rollup(g: DataFrame) -> DataFrame:
    """Fold a (cents, cnt) grain into the one-row amount profile —
    shared by ``macro_amount_profile`` and its streaming twin
    (composes the family's selection contracts over one cumsum)."""
    g = g.localCheckpoint()
    wcum = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cu = g.select(
        "cents", F.sum("cnt").over(wcum).cast("long").alias("cum")
    )
    t = g.agg(F.sum("cnt").cast("long").alias("n"))
    sel = lambda mul, k, name: (  # noqa: E731
        cu.crossJoin(F.broadcast(t))
        .filter(F.col("cum") * mul >= k * F.col("n"))
        .agg(F.min("cents").alias(name))
    )
    q1, q2, q3 = sel(4, 1, "q1"), sel(4, 2, "q2"), sel(4, 3, "q3")
    lo, hi = sel(100, 5, "lo_cents"), sel(100, 95, "hi_cents")
    s = (
        g.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .agg(
            F.sum(
                F.least(
                    F.greatest(F.col("cents"), F.col("lo_cents")),
                    F.col("hi_cents"),
                )
                * F.col("cnt")
            )
            .cast("long")
            .alias("wsum"),
            F.sum(F.col("cents") * F.col("cnt")).cast("long").alias("rsum"),
        )
    )
    iqr = F.col("q3") - F.col("q1")
    f = (
        g.crossJoin(F.broadcast(q1))
        .crossJoin(F.broadcast(q3))
        .agg(
            F.sum(
                F.when(
                    2 * F.col("cents") < 2 * F.col("q1") - 3 * iqr,
                    F.col("cnt"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_low"),
            F.sum(
                F.when(
                    2 * F.col("cents") > 2 * F.col("q3") + 3 * iqr,
                    F.col("cnt"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_high"),
        )
    )
    n = F.col("n")
    return (
        t.crossJoin(F.broadcast(q1))
        .crossJoin(F.broadcast(q2))
        .crossJoin(F.broadcast(q3))
        .crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(f))
        .filter((n > 0) & (F.col("q3") > F.col("q1")))
        .select(
            n.alias("n_purchases"),
            F.col("q1").alias("q1_cents"),
            F.col("q2").alias("q2_cents"),
            F.col("q3").alias("q3_cents"),
            (F.col("n_low") + F.col("n_high")).alias("n_outliers"),
            _FMT6(F.col("wsum").cast("double") / (100 * n)).alias(
                "winsorized_mean"
            ),
            _FMT6(F.col("rsum").cast("double") / (100 * n)).alias(
                "raw_mean"
            ),
            _FMT6(
                (F.col("q3") + F.col("q1") - 2 * F.col("q2")).cast("double")
                / (F.col("q3") - F.col("q1")).cast("double")
            ).alias("bowley_skew"),
        )
    )


# ------------------------------------------- Mann-Kendall trend test ----

def _mann_kendall_sql() -> str:
    """Build the events_mann_kendall oracle: per-type day pairs give the
    exact-integer S statistic, per-value tie counts give the exact
    tie-corrected variance numerator, and z is ONE fixed IEEE chain
    ((S -+ 1) / sqrt(var_num / 18.0) — a division, a correctly-rounded
    sqrt, a division) spelled identically on both engines."""
    return (
        "WITH d AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, "
        " CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2), "
        "p AS (SELECT a.event_type, CAST(SUM(CASE "
        "  WHEN b.cnt > a.cnt THEN 1 WHEN b.cnt < a.cnt THEN -1 "
        "  ELSE 0 END) AS BIGINT) AS s "
        " FROM d a JOIN d b ON a.event_type = b.event_type "
        "  AND a.day < b.day GROUP BY 1), "
        "t AS (SELECT event_type, CAST(SUM(t * (t - 1) * (2 * t + 5)) "
        "  AS BIGINT) AS tie_term FROM (SELECT event_type, cnt, "
        "  CAST(COUNT(*) AS BIGINT) AS t FROM d GROUP BY 1, 2) "
        " GROUP BY 1), "
        "n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n "
        " FROM d GROUP BY 1), "
        "x AS (SELECT p.event_type, n.n, p.s, "
        "  n.n * (n.n - 1) * (2 * n.n + 5) - t.tie_term AS var_num "
        " FROM p JOIN t ON p.event_type = t.event_type "
        " JOIN n ON p.event_type = n.event_type) "
        "SELECT event_type, n AS n_days, s AS s_stat, var_num, "
        "printf('%.6f', ROUND(CASE "
        " WHEN s > 0 THEN CAST(s - 1 AS DOUBLE) / "
        "  sqrt(CAST(var_num AS DOUBLE) / 18.0) "
        " WHEN s < 0 THEN CAST(s + 1 AS DOUBLE) / "
        "  sqrt(CAST(var_num AS DOUBLE) / 18.0) "
        " ELSE 0.0 END, 6)) AS z "
        "FROM x WHERE n >= 10 AND var_num > 0 ORDER BY event_type"
    )


@register("events_mann_kendall", _mann_kendall_sql())
def events_mann_kendall(spark, sf):
    """Mann-Kendall monotone-trend test per event type — the
    NONPARAMETRIC complement of ``events_trend``'s OLS slope (rank
    concordance over day pairs is robust to the heavy-tailed daily
    volumes OLS is not) and of ``events_theil_sen``'s robust slope
    (Theil-Sen estimates the magnitude; Mann-Kendall tests whether a
    trend exists at all — the pairing every trend-analysis text
    prescribes).

    Float discipline: S = sum of sign(cnt_j - cnt_i) over chronologically
    ordered day pairs is an exact BIGINT (sign is an integer comparison);
    the tie-corrected variance numerator n(n-1)(2n+5) - sum t(t-1)(2t+5)
    is exact BIGINT arithmetic (n = days per type, so n^3 is tiny); z is
    the continuity-corrected (S -+ 1) / sqrt(var_num / 18.0) — one
    correctly-rounded int->double division, one correctly-rounded sqrt,
    one final division — the identical fixed chain on both engines
    under ROUND + %.6f.

    Scale shape: facts collapse once to the (type, day) grain
    (map-side combinable); the pair self-join is bounded by
    types x days^2 — days are CALENDAR-bounded, independent of corpus
    size, so the quadratic term never touches fact scale. All shuffles
    key event_type."""
    return mk_rollup(daily_counts(_events(spark, sf)))


def mk_rollup(d: DataFrame) -> DataFrame:
    """Fold a (event_type, day, cnt) daily-count table into the
    Mann-Kendall readout — shared by ``events_mann_kendall`` and its
    streaming twin (the exact-S / tie-corrected-variance / fixed z
    chain lives here)."""
    a = d.select(
        F.col("event_type"), F.col("day").alias("day_a"),
        F.col("cnt").alias("cnt_a"),
    )
    b = d.select(
        F.col("event_type"), F.col("day").alias("day_b"),
        F.col("cnt").alias("cnt_b"),
    )
    p = (
        a.join(b, ["event_type"])
        .filter(F.col("day_a") < F.col("day_b"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("cnt_b") > F.col("cnt_a"), 1)
                .when(F.col("cnt_b") < F.col("cnt_a"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s")
        )
    )
    t = (
        d.groupBy("event_type", "cnt")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    n = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    x = p.join(t, ["event_type"]).join(n, ["event_type"]).select(
        "event_type",
        "n",
        "s",
        (
            F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
            - F.col("tie_term")
        ).alias("var_num"),
    )
    sd = F.sqrt(F.col("var_num").cast("double") / F.lit(18.0))
    z = (
        F.when(F.col("s") > 0, (F.col("s") - 1).cast("double") / sd)
        .when(F.col("s") < 0, (F.col("s") + 1).cast("double") / sd)
        .otherwise(F.lit(0.0))
    )
    return (
        x.filter((F.col("n") >= 10) & (F.col("var_num") > 0))
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            F.col("s").alias("s_stat"),
            "var_num",
            _FMT6(z).alias("z"),
        )
        .orderBy("event_type")
    )


# --------------------------------------- Kruskal-Wallis H (weekday) ----

def _kruskal_sql() -> str:
    """Build the events_kruskal oracle: doubled midranks of pooled daily
    totals are exact integers (the events_spearman discipline), per-
    weekday doubled-rank sums Dj give R_j^2/n_j as the ONE exact-integer
    division Dj^2 / (4*nj) per term, H is an explicit left-associated
    7-term chain (the events_anova discipline), and the tie correction
    is one further exact-int division."""
    gs = range(7)
    cells = ", ".join(
        f"CAST(SUM(CASE WHEN dow = {g} THEN dr ELSE 0 END) AS BIGINT) "
        f"AS d{g}, "
        f"CAST(SUM(CASE WHEN dow = {g} THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS n{g}"
        for g in gs
    )
    chain = " + ".join(
        f"(CAST(d{g} * d{g} AS DOUBLE) / CAST(4 * n{g} AS DOUBLE))"
        for g in gs
    )
    guards = " AND ".join(f"n{g} > 0" for g in gs)
    return (
        "WITH dt AS (SELECT strftime(ts, '%Y-%m-%d') AS day, "
        " CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1), "
        "dd AS (SELECT day, cnt, (CAST(day AS DATE) - DATE '2024-01-01') "
        " % 7 AS dow FROM dt), "
        "g AS (SELECT cnt, CAST(COUNT(*) AS BIGINT) AS t FROM dt "
        " GROUP BY 1), "
        "r AS (SELECT cnt, 2 * CAST(SUM(t) OVER (ORDER BY cnt "
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
        " - t + 1 AS dr, t FROM g), "
        "j AS (SELECT dd.dow, r.dr FROM dd JOIN r ON dd.cnt = r.cnt), "
        f"o AS (SELECT {cells} FROM j), "
        "m2 AS (SELECT CAST(SUM(t) AS BIGINT) AS n, "
        " CAST(SUM(t * t * t - t) AS BIGINT) AS tie_sum FROM g), "
        f"x AS (SELECT m2.n, m2.tie_sum, ({chain}) AS chain "
        f" FROM o, m2 WHERE {guards} AND m2.n > 7) "
        "SELECT n AS n_days, "
        "printf('%.6f', ROUND(12.0 * chain / CAST(n * (n + 1) AS DOUBLE) "
        " - CAST(3 * (n + 1) AS DOUBLE), 6)) AS h_stat, "
        "printf('%.6f', ROUND((12.0 * chain / CAST(n * (n + 1) AS DOUBLE) "
        " - CAST(3 * (n + 1) AS DOUBLE)) / "
        " (CAST(n * n * n - n - tie_sum AS DOUBLE) / "
        "  CAST(n * n * n - n AS DOUBLE)), 6)) AS h_adj "
        "FROM x WHERE n * n * n - n > tie_sum"
    )


@register("events_kruskal", _kruskal_sql())
def events_kruskal(spark, sf):
    """Kruskal-Wallis H across the seven weekdays — the RANK-based
    complement of ``events_anova`` (same 'is there a weekday effect?'
    question, robust to the non-normal daily-volume distribution ANOVA
    assumes away; the nonparametric k-group extension of
    ``events_mann_whitney``'s two-group U).

    Float discipline: doubled midranks of the pooled daily totals are
    exact integers (2*cum - t + 1, the events_spearman discipline);
    per-weekday doubled-rank sums D_j are exact BIGINTs; each
    R_j^2/n_j term is the ONE exact-integer division D_j^2/(4*n_j)
    (doubling squares to the 4); the 7-term sum is an EXPLICIT
    left-associated chain (events_anova discipline); H and the
    tie-corrected H_adj are fixed chains of correctly-rounded ops
    spelled identically on both engines; the tie-correction guard
    n^3 - n > tie_sum is an integer comparison.

    Scale shape: one fact collapse to the calendar-day grain, one
    value-grain rank table (days-sized), one broadcast-scale join, one
    conditional aggregation to a single 14-integer row."""
    return kruskal_rollup(day_totals(_events(spark, sf)))


def kruskal_rollup(dt: DataFrame) -> DataFrame:
    """Fold a (day, cnt) daily-totals table into the one-row
    Kruskal-Wallis readout — shared by ``events_kruskal`` and its
    streaming twin (the doubled-midrank / 7-term-chain / tie-correction
    float contract lives here)."""
    dd = dt.select(
        "cnt",
        F.pmod(
            F.datediff(F.to_date("day"), F.lit("2024-01-01").cast("date")),
            F.lit(7),
        )
        .cast("long")
        .alias("dow"),
    )
    g = dt.groupBy("cnt").agg(F.count(F.lit(1)).cast("long").alias("t"))
    wcum = Window.orderBy("cnt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = g.select(
        "cnt",
        (
            2 * F.sum("t").over(wcum).cast("long") - F.col("t") + 1
        ).alias("dr"),
    )
    j = dd.join(F.broadcast(r), ["cnt"])
    import functools
    import operator

    gs = range(7)
    aggs = []
    for k in gs:
        aggs += [
            F.sum(F.when(F.col("dow") == k, F.col("dr")).otherwise(0))
            .cast("long")
            .alias(f"d{k}"),
            F.sum(F.when(F.col("dow") == k, 1).otherwise(0))
            .cast("long")
            .alias(f"n{k}"),
        ]
    o = j.agg(*aggs)
    m2 = g.agg(
        F.sum("t").cast("long").alias("n"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long")
        .alias("tie_sum"),
    )
    chain = functools.reduce(
        operator.add,
        [
            (F.col(f"d{k}") * F.col(f"d{k}")).cast("double")
            / (4 * F.col(f"n{k}")).cast("double")
            for k in gs
        ],
    )
    guard = functools.reduce(
        operator.and_, [F.col(f"n{k}") > 0 for k in gs]
    )
    n = F.col("n")
    h = F.lit(12.0) * F.col("chain") / (n * (n + 1)).cast("double") - (
        3 * (n + 1)
    ).cast("double")
    c = (n * n * n - n - F.col("tie_sum")).cast("double") / (
        n * n * n - n
    ).cast("double")
    x = (
        o.crossJoin(F.broadcast(m2))
        .filter(guard & (n > 7))
        .select("n", "tie_sum", chain.alias("chain"))
    )
    return x.filter(n * n * n - n > F.col("tie_sum")).select(
        n.alias("n_days"),
        _FMT6(h).alias("h_stat"),
        _FMT6(h / c).alias("h_adj"),
    )


# --------------------------------- Brown-Forsythe / Levene (weekday) ----

def _levene_sql() -> str:
    """Build the events_levene oracle: per-weekday LOWER medians by rank
    selection (the events_theil_sen discipline — interpolation never
    enters), absolute deviations are exact integers, and the one-way
    ANOVA on deviations reuses the events_anova 7-term chain shape."""
    gs = range(7)
    cells = ", ".join(
        f"CAST(SUM(CASE WHEN dow = {g} THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS n{g}, "
        f"CAST(SUM(CASE WHEN dow = {g} THEN z ELSE 0 END) AS BIGINT) "
        f"AS s{g}, "
        f"CAST(SUM(CASE WHEN dow = {g} THEN z * z ELSE 0 END) "
        f"AS BIGINT) AS q{g}"
        for g in gs
    )
    ssw = " + ".join(
        f"(CAST(n{g} * q{g} - s{g} * s{g} AS DOUBLE) / CAST(n{g} AS DOUBLE))"
        for g in gs
    )
    ssb_terms = " + ".join(
        f"(CAST(s{g} * s{g} AS DOUBLE) / CAST(n{g} AS DOUBLE))" for g in gs
    )
    ssb = f"({ssb_terms}) - CAST(s * s AS DOUBLE) / CAST(n AS DOUBLE)"
    guards = " AND ".join(f"n{g} > 0" for g in gs)
    return (
        "WITH dt AS (SELECT strftime(ts, '%Y-%m-%d') AS day, "
        " CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1), "
        "dd AS (SELECT day, cnt, (CAST(day AS DATE) - DATE '2024-01-01') "
        " % 7 AS dow FROM dt), "
        "g AS (SELECT dow, cnt, CAST(COUNT(*) AS BIGINT) AS k FROM dd "
        " GROUP BY 1, 2), "
        "cu AS (SELECT dow, cnt, CAST(SUM(k) OVER (PARTITION BY dow "
        " ORDER BY cnt ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
        " AS BIGINT) AS cum FROM g), "
        "gn AS (SELECT dow, CAST(SUM(k) AS BIGINT) AS gn FROM g "
        " GROUP BY 1), "
        "med AS (SELECT cu.dow, MIN(cu.cnt) AS med FROM cu "
        " JOIN gn ON cu.dow = gn.dow WHERE cu.cum * 2 >= gn.gn "
        " GROUP BY 1), "
        "zz AS (SELECT dd.dow, CAST(ABS(dd.cnt - med.med) AS BIGINT) AS z "
        " FROM dd JOIN med ON dd.dow = med.dow), "
        f"o AS (SELECT {cells}, CAST(COUNT(*) AS BIGINT) AS n, "
        " CAST(SUM(z) AS BIGINT) AS s FROM zz), "
        f"x AS (SELECT n, ({ssw}) AS ssw, ({ssb}) AS ssb FROM o "
        f" WHERE {guards} AND n > 7) "
        "SELECT n AS n_days, "
        "printf('%.6f', ROUND(ssb, 6)) AS ss_between_z, "
        "printf('%.6f', ROUND(ssw, 6)) AS ss_within_z, "
        "printf('%.6f', ROUND((ssb / CAST(6 AS DOUBLE)) "
        " / (ssw / CAST(n - 7 AS DOUBLE)), 6)) AS w_stat "
        "FROM x WHERE ssw > 0"
    )


@register("events_levene", _levene_sql())
def events_levene(spark, sf):
    """Brown-Forsythe (median-based Levene) test of equal daily-volume
    VARIANCE across the seven weekdays — the dispersion complement of
    ``events_anova`` (ANOVA asks whether weekday LEVELS differ; this
    asks whether weekday VOLATILITY does — the check that must pass
    before pooling variances, and a seasonality readout in its own
    right: weekend traffic is often not just lower but burstier).

    Float discipline: per-weekday centers are LOWER medians by rank
    selection over the per-weekday cumulative counts (cum*2 >= n_j; the
    events_theil_sen discipline — interpolation formulas differ by an
    ulp between engines, selection sidesteps the class; the lower-median
    variant of Brown-Forsythe is pinned by BOTH engines spelling the
    same selection), so each deviation |cnt - med_j| is an exact BIGINT;
    the deviation ANOVA reuses the events_anova shape — per-group exact
    moments, explicit left-associated 7-term SSW/SSB chains of single
    exact-integer divisions, W as two further fixed divisions.

    Scale shape: one fact collapse to the calendar-day grain; the
    weekday-value grain, medians, deviations, and the final
    23-integer row all live at dimension scale."""
    return levene_rollup(day_totals(_events(spark, sf)))


def levene_rollup(dt: DataFrame) -> DataFrame:
    """Fold a (day, cnt) daily-totals table into the one-row
    Brown-Forsythe readout — shared by ``events_levene`` and its
    streaming twin (the lower-median selection + deviation-ANOVA float
    contract lives here)."""
    dd = dt.select(
        "cnt",
        F.pmod(
            F.datediff(F.to_date("day"), F.lit("2024-01-01").cast("date")),
            F.lit(7),
        )
        .cast("long")
        .alias("dow"),
    )
    g = dd.groupBy("dow", "cnt").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    wcum = (
        Window.partitionBy("dow")
        .orderBy("cnt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cu = g.select(
        "dow", "cnt", F.sum("k").over(wcum).cast("long").alias("cum")
    )
    gn = g.groupBy("dow").agg(F.sum("k").cast("long").alias("gn"))
    med = (
        cu.join(gn, ["dow"])
        .filter(F.col("cum") * 2 >= F.col("gn"))
        .groupBy("dow")
        .agg(F.min("cnt").alias("med"))
    )
    zz = dd.join(F.broadcast(med), ["dow"]).select(
        "dow", F.abs(F.col("cnt") - F.col("med")).cast("long").alias("z")
    )
    import functools
    import operator

    gs = range(7)
    aggs = []
    for k in gs:
        aggs += [
            F.sum(F.when(F.col("dow") == k, 1).otherwise(0))
            .cast("long")
            .alias(f"n{k}"),
            F.sum(F.when(F.col("dow") == k, F.col("z")).otherwise(0))
            .cast("long")
            .alias(f"s{k}"),
            F.sum(
                F.when(F.col("dow") == k, F.col("z") * F.col("z"))
                .otherwise(0)
            )
            .cast("long")
            .alias(f"q{k}"),
        ]
    o = zz.agg(
        *aggs,
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("z").cast("long").alias("s"),
    )
    ssw = functools.reduce(
        operator.add,
        [
            (
                F.col(f"n{k}") * F.col(f"q{k}")
                - F.col(f"s{k}") * F.col(f"s{k}")
            ).cast("double")
            / F.col(f"n{k}").cast("double")
            for k in gs
        ],
    )
    ssb = functools.reduce(
        operator.add,
        [
            (F.col(f"s{k}") * F.col(f"s{k}")).cast("double")
            / F.col(f"n{k}").cast("double")
            for k in gs
        ],
    ) - (F.col("s") * F.col("s")).cast("double") / F.col("n").cast("double")
    guard = functools.reduce(
        operator.and_, [F.col(f"n{k}") > 0 for k in gs]
    ) & (F.col("n") > 7)
    x = o.filter(guard).select("n", ssw.alias("ssw"), ssb.alias("ssb"))
    return x.filter(F.col("ssw") > 0).select(
        F.col("n").alias("n_days"),
        _FMT6(F.col("ssb")).alias("ss_between_z"),
        _FMT6(F.col("ssw")).alias("ss_within_z"),
        _FMT6(
            (F.col("ssb") / F.lit(6).cast("double"))
            / (F.col("ssw") / (F.col("n") - 7).cast("double"))
        ).alias("w_stat"),
    )


# --------------------------------------- Friedman test (week blocks) ----

def _friedman_sql() -> str:
    """Build the events_friedman oracle: within-week doubled midranks
    (the spearman trick PARTITIONED by week), per-weekday doubled rank
    sums, and the tie-corrected statistic — in doubled-rank terms the
    /4 cancels, so chi2_F = (k-1)·Σ(D_j - n(k+1))² / (ΣD² - nk(k+1)²)
    is EXACT integers until one division."""
    gs = range(7)
    cells = ", ".join(
        f"CAST(SUM(CASE WHEN dow = {g} THEN dr ELSE 0 END) AS BIGINT) "
        f"AS d{g}"
        for g in gs
    )
    num = " + ".join(
        f"(d{g} - 8 * n) * (d{g} - 8 * n)" for g in gs
    )
    return (
        "WITH dt AS (SELECT strftime(ts, '%Y-%m-%d') AS day, "
        " CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1), "
        "dd AS (SELECT cnt, "
        " (CAST(day AS DATE) - DATE '2024-01-01') // 7 AS week, "
        " (CAST(day AS DATE) - DATE '2024-01-01') % 7 AS dow FROM dt), "
        "cw AS (SELECT week FROM dd GROUP BY week HAVING COUNT(*) = 7), "
        "db AS (SELECT dd.* FROM dd JOIN cw ON dd.week = cw.week), "
        "g AS (SELECT week, cnt, CAST(COUNT(*) AS BIGINT) AS t FROM db "
        " GROUP BY 1, 2), "
        "r AS (SELECT week, cnt, 2 * CAST(SUM(t) OVER (PARTITION BY week "
        " ORDER BY cnt ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
        " AS BIGINT) - t + 1 AS dr FROM g), "
        "j AS (SELECT db.dow, r.dr FROM db "
        " JOIN r ON db.week = r.week AND db.cnt = r.cnt), "
        "nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM cw), "
        f"o AS (SELECT {cells}, "
        " CAST(SUM(dr * dr) AS BIGINT) AS sq FROM j) "
        f"SELECT n AS n_weeks, ({num}) AS chi2_num, "
        " sq - n * 7 * 64 AS chi2_den, "
        f"printf('%.6f', ROUND(CAST(6 * ({num}) AS DOUBLE) "
        " / CAST(sq - n * 7 * 64 AS DOUBLE), 6)) AS chi2_f "
        "FROM o, nb WHERE n >= 2 AND sq - n * 7 * 64 > 0"
    )


@register("events_friedman", _friedman_sql())
def events_friedman(spark, sf):
    """Friedman test of a weekday effect with calendar WEEKS as blocks
    — the repeated-measures member of the rank-test family
    (``events_kruskal`` pools all days as independent samples; Friedman
    ranks the seven weekdays WITHIN each week, so a strong week-level
    volume trend — exactly what ``events_trend`` measures — cannot
    masquerade as a weekday effect; it is the nonparametric
    two-way-blocked complement of ``events_anova``).

    Float discipline: within-week doubled midranks are exact integers
    (2·cum − t + 1 partitioned by week; the events_spearman trick);
    in doubled-rank terms the tie-corrected statistic's /4 factors
    cancel, so chi2_F = (k−1)·Σ_j(D_j − n(k+1))² / (ΣD²_ij − nk(k+1)²)
    with k=7 is EXACT BIGINT arithmetic end-to-end — numerator and
    denominator are both emitted as integers and the statistic is ONE
    correctly-rounded IEEE division. Only complete 7-day weeks enter
    (blocks need all treatments); all-tied corpora are excluded by the
    integer denominator guard.

    Scale shape: one fact collapse to the calendar-day grain; the
    per-week value grain, ranks, and the final 9-integer row all live
    at dimension scale (weeks × 7)."""
    return friedman_rollup(day_totals(_events(spark, sf)))


def week_dow_ranks(dt: DataFrame) -> DataFrame:
    """(week, dow, cnt, dr) within-week doubled-midrank table over
    complete calendar weeks — the shared blocked-rank cell grain of
    ``events_friedman``, ``events_page`` and ``events_quade`` (the
    midrank contract lives ONCE)."""
    anchor = F.lit("2024-01-01").cast("date")
    dd = dt.select(
        "cnt",
        # FLOOR, not a truncating cast: DuckDB's // floors, and a
        # pre-anchor day (negative datediff) would otherwise split a
        # week between two buckets (days are < 2^26 so the double
        # division is exact and floor is the integer quotient).
        F.floor(F.datediff(F.to_date("day"), anchor) / 7)
        .cast("long")
        .alias("week"),
        F.pmod(F.datediff(F.to_date("day"), anchor), F.lit(7))
        .cast("long")
        .alias("dow"),
    )
    cw = dd.groupBy("week").agg(F.count(F.lit(1)).alias("ndays")).filter(
        F.col("ndays") == 7
    ).select("week")
    db = dd.join(F.broadcast(cw), ["week"])
    g = db.groupBy("week", "cnt").agg(
        F.count(F.lit(1)).cast("long").alias("t")
    )
    wcum = (
        Window.partitionBy("week")
        .orderBy("cnt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = g.select(
        "week",
        "cnt",
        (2 * F.sum("t").over(wcum).cast("long") - F.col("t") + 1).alias(
            "dr"
        ),
    )
    return db.join(r, ["week", "cnt"]).select("week", "dow", "cnt", "dr")


def week_dow_ranksums(dt: DataFrame) -> DataFrame:
    """One-row within-week doubled-midrank state over complete calendar
    weeks — d0..d6 (per-weekday doubled rank sums), sq (sum of squared
    doubled ranks), n (complete-week count) — rolled up from the
    shared ``week_dow_ranks`` cell grain."""
    j = week_dow_ranks(dt)
    gs = range(7)
    aggs = [
        F.sum(F.when(F.col("dow") == k, F.col("dr")).otherwise(0))
        .cast("long")
        .alias(f"d{k}")
        for k in gs
    ] + [F.sum(F.col("dr") * F.col("dr")).cast("long").alias("sq")]
    o = j.agg(*aggs)
    nb = j.agg(F.countDistinct("week").cast("long").alias("n"))
    return o.crossJoin(F.broadcast(nb))


def friedman_rollup(dt: DataFrame) -> DataFrame:
    """Fold a (day, cnt) daily-totals table into the one-row Friedman
    readout — shared by ``events_friedman`` and its streaming twin
    (the exact-integer chi2 contract lives here, over the shared
    ``week_dow_ranksums`` blocked-rank front)."""
    import functools
    import operator

    o = week_dow_ranksums(dt)
    gs = range(7)
    num = functools.reduce(
        operator.add,
        [
            (F.col(f"d{k}") - 8 * F.col("n"))
            * (F.col(f"d{k}") - 8 * F.col("n"))
            for k in gs
        ],
    )
    den = F.col("sq") - F.col("n") * 7 * 64
    return (
        o.filter((F.col("n") >= 2) & (den > 0))
        .select(
            F.col("n").alias("n_weeks"),
            num.alias("chi2_num"),
            den.alias("chi2_den"),
            _FMT6(
                (6 * num).cast("double") / den.cast("double")
            ).alias("chi2_f"),
        )
    )


# ------------------------------------------- paired/matched binary ----

@register(
    "events_mcnemar",
    # McNemar's test on matched user-day pairs: subject = (user, d) for
    # d in 0..14, outcome = any purchase on day d (pre) vs day d+15
    # (post). Discordant counts b/c are exact BIGINTs from ONE keyed
    # aggregation (pre tagged +1, post tagged +2, sum -> 1/2/3); the
    # continuity-corrected statistic (|b-c|-1)^2/(b+c) is all-integer
    # until one IEEE division under ROUND + %.6f.
    "WITH e AS (SELECT user_id,"
    "  CAST(DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT)"
    "  AS d FROM events WHERE event_type = 'purchase'), "
    "tag AS ("
    " SELECT DISTINCT user_id, d, 1 AS t FROM e WHERE d >= 0 AND d < 15"
    " UNION ALL"
    " SELECT DISTINCT user_id, d - 15 AS d, 2 AS t FROM e"
    "  WHERE d >= 15 AND d < 30), "
    "s AS (SELECT user_id, d, CAST(SUM(t) AS BIGINT) AS t"
    " FROM tag GROUP BY user_id, d), "
    "m AS (SELECT"
    " CAST(SUM(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b,"
    " CAST(SUM(CASE WHEN t = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c,"
    " CAST(SUM(CASE WHEN t = 3 THEN 1 ELSE 0 END) AS BIGINT) AS bh"
    " FROM s), "
    "n AS (SELECT CAST(15 * COUNT(DISTINCT user_id) AS BIGINT) AS np"
    " FROM events) "
    "SELECT np AS n_pairs, b AS pre_only, c AS post_only,"
    " bh AS both_days, "
    "printf('%.6f', ROUND(CAST((ABS(b - c) - 1) * (ABS(b - c) - 1)"
    " AS DOUBLE) / CAST(b + c AS DOUBLE), 6)) AS chi2_cc "
    "FROM m, n WHERE b + c > 0",
)
def events_mcnemar(spark, sf):
    """McNemar's test on matched user-day purchase outcomes — the
    PAIRED-BINARY member of the test family (``events_wilcoxon`` pairs
    magnitudes, ``events_sign_test`` pairs directions; McNemar pairs
    yes/no outcomes): subject = (user, day-offset d in 0..14), outcome
    = purchased on day d vs day d+15. Only the discordant pairs carry
    information; the continuity-corrected chi-square
    (|b-c|-1)^2/(b+c) is the standard Edwards form.

    Float discipline: b/c/both are exact BIGINTs (distinct-set tags
    summed per subject: 1 = pre only, 2 = post only, 3 = both), and
    the statistic is all-integer until ONE correctly-rounded IEEE
    division under ROUND + %.6f spelled identically on both engines.

    Scale shape: the tag union is two pruned scans of the purchase
    slice collapsed by ONE (user, d)-keyed hash aggregation (no join,
    no window); the rollup is a single 3-integer row. n_pairs is the
    subject-universe size 15 x |users| — concordant-absent pairs never
    need materializing because they carry zero information."""
    return mcnemar_rollup(mcnemar_marks(_events(spark, sf)))


def mcnemar_marks(df: DataFrame) -> DataFrame:
    """Distinct (user_id, d, side) marks — the shared McNemar grain:
    side 1 = purchased on pre day d, side 2 = purchased on the matched
    post day d+15, side 0 = user-seen witness (d = -1, for the subject
    universe 15 x |users|). Each side is a DISTINCT set, so the grain
    is exactly SET-UNION mergeable across micro-batches (the
    stream_srm discipline) — the property ``stream_mcnemar`` relies
    on."""
    e = df.filter(F.col("event_type") == "purchase")
    d = F.datediff(
        F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
    ).cast("long")
    ed = e.select("user_id", d.alias("d"))
    pre = (
        ed.filter((F.col("d") >= 0) & (F.col("d") < 15))
        .distinct()
        .select("user_id", "d", F.lit(1).alias("side"))
    )
    post = (
        ed.filter((F.col("d") >= 15) & (F.col("d") < 30))
        .select("user_id", (F.col("d") - 15).alias("d"))
        .distinct()
        .select("user_id", "d", F.lit(2).alias("side"))
    )
    users = df.select(
        "user_id",
        F.lit(-1).cast("long").alias("d"),
        F.lit(0).alias("side"),
    ).distinct()
    return pre.unionAll(post).unionAll(users)


def mcnemar_rollup(marks: DataFrame) -> DataFrame:
    """Fold the distinct-marks grain into the one-row McNemar readout
    — shared by ``events_mcnemar`` and its streaming twin (the
    discordant-count and continuity-corrected-chi2 contract lives
    here)."""
    s = (
        marks.filter(F.col("side") > 0)
        .groupBy("user_id", "d")
        .agg(F.sum("side").cast("long").alias("t"))
    )
    m = s.agg(
        F.sum(F.when(F.col("t") == 1, 1).otherwise(0))
        .cast("long")
        .alias("b"),
        F.sum(F.when(F.col("t") == 2, 1).otherwise(0))
        .cast("long")
        .alias("c"),
        F.sum(F.when(F.col("t") == 3, 1).otherwise(0))
        .cast("long")
        .alias("bh"),
    )
    n = marks.filter(F.col("side") == 0).agg(
        (15 * F.count(F.lit(1))).cast("long").alias("np")
    )
    b, c = F.col("b"), F.col("c")
    diff = F.abs(b - c) - 1
    return (
        m.crossJoin(F.broadcast(n))
        .filter(b + c > 0)
        .select(
            F.col("np").alias("n_pairs"),
            b.alias("pre_only"),
            c.alias("post_only"),
            F.col("bh").alias("both_days"),
            _FMT6(
                (diff * diff).cast("double") / (b + c).cast("double")
            ).alias("chi2_cc"),
        )
    )


@register(
    "events_cochran_q",
    # Cochran's Q on (user, day) subjects x {view, click, purchase}
    # treatments: Q = (k-1)(k*sum G_j^2 - T^2)/(k*T - sum L_i^2) with
    # k=3 — every moment an exact BIGINT, one IEEE division. The
    # statistic is INVARIANT to all-zero and all-k subject rows (each
    # contributes 0 to both numerator and denominator), so the
    # events-visible grain computes the same Q as the full universe.
    "WITH u AS (SELECT user_id, CAST(ts AS DATE) AS day,"
    " MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS g1,"
    " MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS g2,"
    " MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS g3"
    " FROM events GROUP BY user_id, CAST(ts AS DATE)), "
    "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,"
    " CAST(SUM(g1) AS BIGINT) AS c1, CAST(SUM(g2) AS BIGINT) AS c2,"
    " CAST(SUM(g3) AS BIGINT) AS c3,"
    " CAST(SUM(g1 + g2 + g3) AS BIGINT) AS tt,"
    " CAST(SUM((g1 + g2 + g3) * (g1 + g2 + g3)) AS BIGINT) AS l2"
    " FROM u) "
    "SELECT n AS n_subjects, c1 AS g_view, c2 AS g_click,"
    " c3 AS g_purchase, "
    "printf('%.6f', ROUND(CAST(2 * (3 * (c1 * c1 + c2 * c2 + c3 * c3)"
    " - tt * tt) AS DOUBLE) / CAST(3 * tt - l2 AS DOUBLE), 6)) AS q "
    "FROM m WHERE 3 * tt - l2 > 0",
)
def events_cochran_q(spark, sf):
    """Cochran's Q test across the view/click/purchase treatments on
    (user, day) subjects — the k-TREATMENT generalization of McNemar
    (do the three funnel actions have equal per-day incidence?).
    Subjects the events table cannot see (all-zero days) and saturated
    subjects (all three actions) both contribute exactly zero to the
    numerator k*sum(G_j^2) - T^2 and the denominator k*T - sum(L_i^2)
    for k=3, so the statistic over the visible grain EQUALS the
    full-universe statistic — the saturation pitfall that forced the
    day grain in the first place cancels analytically here.

    Float discipline: column totals G_j, T and the row-moment sum
    L_i^2 are exact BIGINTs off one hash aggregation; Q =
    2*(3*sum G_j^2 - T^2)/(3T - sum L^2) is all-integer until ONE
    correctly-rounded IEEE division under ROUND + %.6f.

    Scale shape: one map-side-combinable (user, day) collapse, one
    five-integer rollup — no join, no window, nothing driver-side."""
    return cochran_rollup(user_day_flags(_events(spark, sf)))


def user_day_flags(df: DataFrame) -> DataFrame:
    """(user, day, g1, g2, g3) treatment flags — the shared Cochran
    grain: each flag is a MAX over events, and MAX is exactly
    mergeable across micro-batches (max of maxes), the property
    ``stream_cochran`` relies on."""
    return df.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(
        F.max(
            F.when(F.col("event_type") == "view", 1).otherwise(0)
        ).alias("g1"),
        F.max(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("g2"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("g3"),
    )


def cochran_rollup(u: DataFrame) -> DataFrame:
    """Fold the flags grain into the one-row Cochran-Q readout —
    shared by ``events_cochran_q`` and its streaming twin (the
    exact-moment Q contract lives here)."""
    ls = F.col("g1") + F.col("g2") + F.col("g3")
    m = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("g1").cast("long").alias("c1"),
        F.sum("g2").cast("long").alias("c2"),
        F.sum("g3").cast("long").alias("c3"),
        F.sum(ls).cast("long").alias("tt"),
        F.sum(ls * ls).cast("long").alias("l2"),
    )
    c1, c2, c3 = F.col("c1"), F.col("c2"), F.col("c3")
    tt, l2 = F.col("tt"), F.col("l2")
    num = 2 * (3 * (c1 * c1 + c2 * c2 + c3 * c3) - tt * tt)
    den = 3 * tt - l2
    return m.filter(den > 0).select(
        F.col("n").alias("n_subjects"),
        c1.alias("g_view"),
        c2.alias("g_click"),
        c3.alias("g_purchase"),
        _FMT6(num.cast("double") / den.cast("double")).alias("q"),
    )


@register(
    "events_simpson",
    # Simpson's diversity of event-type mix per epoch-anchored weekday:
    # D = sum n_i(n_i - 1) / (N(N - 1)) — every moment an exact BIGINT,
    # one IEEE division per weekday. Weekday is DATEDIFF % 7 from the
    # fixed anchor, NEVER dayofweek (engines disagree on week origin).
    "WITH c AS (SELECT"
    " CAST(DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7"
    "  AS BIGINT) AS weekday, event_type,"
    " CAST(COUNT(*) AS BIGINT) AS n"
    " FROM events GROUP BY 1, 2), "
    "w AS (SELECT weekday, CAST(SUM(n) AS BIGINT) AS nn,"
    " CAST(SUM(n * (n - 1)) AS BIGINT) AS p FROM c GROUP BY weekday) "
    "SELECT weekday, nn AS n_events, "
    "printf('%.6f', ROUND(CAST(p AS DOUBLE)"
    " / CAST(nn * (nn - 1) AS DOUBLE), 6)) AS simpson_d "
    "FROM w WHERE nn >= 2",
)
def events_simpson(spark, sf):
    """Simpson's diversity index of the event-type mix per weekday —
    the concentration-of-categories readout next to
    ``events_concentration``'s per-user volume view: D is the
    probability two events drawn without replacement from the same
    weekday share a type (low D = diverse mix). The unbiased
    finite-sample form sum n_i(n_i-1)/(N(N-1)) keeps every term an
    exact integer — no squared-share floats ever appear.

    Float discipline: weekday is the epoch-anchored DATEDIFF % 7 (the
    events_cramers_v rule — never dayofweek), the type counts and
    pair counts are exact BIGINTs, and D is ONE correctly-rounded IEEE
    division per weekday under ROUND + %.6f.

    Scale shape: one map-side-combinable (weekday, type) count, one
    7-row rollup — the bounded-grain discipline throughout."""
    return simpson_rollup(weekday_type_counts(_events(spark, sf)))


def weekday_type_counts(df: DataFrame) -> DataFrame:
    """(weekday, event_type, n) counts under the epoch-anchored weekday
    — the shared Simpson grain (plain COUNTs, exactly sum-mergeable
    across micro-batches; the property ``stream_simpson`` relies
    on)."""
    wd = (
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        )
        % 7
    ).cast("long")
    return df.groupBy(wd.alias("weekday"), "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def simpson_rollup(c: DataFrame) -> DataFrame:
    """Fold the (weekday, type, n) grain into the 7-row Simpson
    readout — shared by ``events_simpson`` and its streaming twin (the
    unbiased n(n-1)/(N(N-1)) contract lives here)."""
    w = c.groupBy("weekday").agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum(F.col("n") * (F.col("n") - 1)).cast("long").alias("p"),
    )
    nn = F.col("nn")
    return w.filter(nn >= 2).select(
        "weekday",
        nn.alias("n_events"),
        _FMT6(
            F.col("p").cast("double") / (nn * (nn - 1)).cast("double")
        ).alias("simpson_d"),
    )


# ------------------------------------------------------- max drawdown ----

@register(
    "events_drawdown",
    # Max drawdown of the DAILY-REVENUE level series: per day,
    # dd = (running-peak - today) / running-peak over exact integer
    # cents; each dd is ONE IEEE division, the interpolation-free MAX
    # over those doubles is order-independent (the
    # retrieval_interp_pr rule), and the drawdown day is the earliest
    # day attaining the max (double equality is sound because both
    # engines computed the identical division).
    "WITH d AS (SELECT CAST(ts AS DATE) AS day, "
    " CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) "
    "  AS BIGINT) AS cents "
    " FROM events WHERE event_type = 'purchase' GROUP BY 1), "
    "r AS (SELECT day, cents, MAX(cents) OVER (ORDER BY day "
    " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pk FROM d), "
    "x AS (SELECT day, "
    " CAST(pk - cents AS DOUBLE) / CAST(pk AS DOUBLE) AS dd FROM r), "
    "m AS (SELECT MAX(dd) AS mx FROM x) "
    "SELECT CAST((SELECT COUNT(*) FROM d) AS BIGINT) AS n_days, "
    "CAST((SELECT MAX(pk) FROM r) AS BIGINT) AS peak_cents, "
    "STRFTIME(MIN(day), '%Y-%m-%d') AS dd_day, "
    "printf('%.6f', ROUND(mx, 6)) AS max_dd "
    "FROM x, m WHERE x.dd = m.mx GROUP BY mx",
)
def events_drawdown(spark, sf):
    """Maximum drawdown of the daily purchase-revenue series — the
    worst slump relative to the best day so far (the risk readout a
    revenue dashboard shows next to ``events_changepoint``'s CUSUM
    break and ``events_trend``'s slope): dd(t) = (peak(<=t) -
    revenue(t)) / peak(<=t), reported at its max with the earliest day
    attaining it.

    Float discipline: daily revenue is the exact integer-cents grain
    (value -> DECIMAL(12,2) -> cents), the running peak is an integer
    MAX window, each dd is ONE correctly-rounded IEEE division, and
    the aggregation over days is MAX — order-independent and
    accumulation-free (the retrieval_interp_pr rule), so the double is
    engine-identical and the earliest-argmax equality join is sound.
    Reported under ROUND + %.6f.

    Scale shape: one map-side-combinable day collapse; the running
    peak is a single window over the bounded day grain (30 rows per
    month of corpus — never corpus-scale); the argmax is an equality
    filter against a one-row broadcast."""
    return drawdown_rollup(purchase_daily_cents(_events(spark, sf)))


def purchase_daily_cents(df: DataFrame) -> DataFrame:
    """(day, cents) daily purchase-revenue grain — exact integer cents
    under the events_rfm DECIMAL(12,2) idiom, plain SUMs so the grain
    is exactly sum-mergeable across micro-batches (the property
    ``stream_drawdown`` relies on)."""
    return (
        df.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(
                (F.col("value").cast("decimal(12,2)") * 100).cast("long")
            )
            .cast("long")
            .alias("cents")
        )
    )


def drawdown_rollup(d: DataFrame) -> DataFrame:
    """Fold the (day, cents) grain into the one-row max-drawdown
    readout — shared by ``events_drawdown`` and its streaming twin
    (the running-peak / earliest-argmax contract lives here)."""
    wp = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = d.select(
        "day", "cents", F.max("cents").over(wp).alias("pk")
    )
    x = r.select(
        "day",
        (
            (F.col("pk") - F.col("cents")).cast("double")
            / F.col("pk").cast("double")
        ).alias("dd"),
    )
    m = x.agg(F.max("dd").alias("mx"))
    nd = d.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    pc = r.agg(F.max("pk").cast("long").alias("peak_cents"))
    return (
        x.join(F.broadcast(m), F.col("dd") == F.col("mx"))
        .groupBy("mx")
        .agg(F.min("day").alias("dd_day0"))
        .crossJoin(F.broadcast(nd))
        .crossJoin(F.broadcast(pc))
        .select(
            "n_days",
            "peak_cents",
            F.date_format("dd_day0", "yyyy-MM-dd").alias("dd_day"),
            _FMT6(F.col("mx")).alias("max_dd"),
        )
    )


# -------------------------------------------------- Bollinger bands ----

@register(
    "events_bollinger",
    # 7-day Bollinger bands over daily volume per type: the breakout
    # flag is the ALL-INTEGER cross-multiplication
    # (7n - s1)^2 > 4*(7*s2 - s1^2) — no float ever decides a flag;
    # the reported band edges are fixed sqrt/division chains under
    # ROUND + %.6f. ROWS window = last 7 observed days per type.
    "WITH d AS (SELECT event_type, STRFTIME(ts, '%Y-%m-%d') AS day, "
    " CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2), "
    "r AS (SELECT event_type, day, cnt, "
    " CAST(SUM(cnt) OVER w AS BIGINT) AS s1, "
    " CAST(SUM(cnt * cnt) OVER w AS BIGINT) AS s2, "
    " ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn "
    " FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day "
    "  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) "
    "SELECT event_type, day, cnt, "
    "printf('%.6f', ROUND(CAST(s1 AS DOUBLE) / CAST(7 AS DOUBLE), 6)) "
    " AS ma7, "
    "printf('%.6f', ROUND(CAST(s1 AS DOUBLE) / CAST(7 AS DOUBLE) "
    " + CAST(2 AS DOUBLE) * SQRT(CAST(7 * s2 - s1 * s1 AS DOUBLE)) "
    "  / CAST(7 AS DOUBLE), 6)) AS upper_band, "
    "printf('%.6f', ROUND(CAST(s1 AS DOUBLE) / CAST(7 AS DOUBLE) "
    " - CAST(2 AS DOUBLE) * SQRT(CAST(7 * s2 - s1 * s1 AS DOUBLE)) "
    "  / CAST(7 AS DOUBLE), 6)) AS lower_band, "
    "(7 * cnt - s1) * (7 * cnt - s1) > 4 * (7 * s2 - s1 * s1) AS is_break "
    "FROM r WHERE rn >= 7",
)
def events_bollinger(spark, sf):
    """Bollinger-band breakout monitor over daily volume per event
    type — the volatility-scaled sibling of ``events_anomaly``'s
    global z-scores (the band adapts to the LOCAL 7-day level and
    spread, so a regime shift stops polluting the threshold after a
    week): ma7 +/- 2 sigma over a ROWS window of the last 7 observed
    days, with the breakout flag raised when today leaves the band.

    Float discipline: with m = s1/7 and sigma^2 = (7*s2 - s1^2)/49
    over exact integer rolling sums, |n - m| > 2*sigma is EXACTLY the
    integer cross-multiplication (7n - s1)^2 > 4*(7*s2 - s1^2) — the
    flag never touches a float; the reported band edges are a fixed
    division + sqrt + multiply chain spelled identically on both
    engines under ROUND + %.6f.

    Scale shape: one map-side-combinable daily collapse, one
    type-keyed window over the bounded day grain (30 rows per type per
    month) — never corpus-scale."""
    return bollinger_rollup(daily_counts(_events(spark, sf)))


def bollinger_rollup(dc: DataFrame) -> DataFrame:
    """Fold a (event_type, day, cnt) daily table into the banded
    readout — shared by ``events_bollinger`` and its streaming twin
    (which rides the SAME ``_stream_daily_counts`` state as
    stream_anomaly/stream_forecast)."""
    d = dc.select(
        "event_type", "day", F.col("cnt").cast("long").alias("cnt")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    wr = Window.partitionBy("event_type").orderBy("day")
    r = d.select(
        "event_type",
        "day",
        "cnt",
        F.sum("cnt").over(w).cast("long").alias("s1"),
        F.sum(F.col("cnt") * F.col("cnt")).over(w).cast("long").alias("s2"),
        F.row_number().over(wr).alias("rn"),
    )
    s1, s2, n = F.col("s1"), F.col("s2"), F.col("cnt")
    seven = F.lit(7).cast("double")
    two = F.lit(2).cast("double")
    sig_num = F.sqrt((7 * s2 - s1 * s1).cast("double"))
    return r.filter(F.col("rn") >= 7).select(
        "event_type",
        "day",
        "cnt",
        _FMT6(s1.cast("double") / seven).alias("ma7"),
        _FMT6(
            s1.cast("double") / seven + two * sig_num / seven
        ).alias("upper_band"),
        _FMT6(
            s1.cast("double") / seven - two * sig_num / seven
        ).alias("lower_band"),
        (
            (7 * n - s1) * (7 * n - s1) > 4 * (7 * s2 - s1 * s1)
        ).alias("is_break"),
    )


# ------------------------------------------------------------- RSI ----

@register(
    "events_rsi",
    # 7-day RSI over daily purchase revenue: day-over-day diffs of
    # exact cents, rolling gain/loss sums over the last 7 diffs, and
    # RSI = 100*g/(g+l) — all-integer until ONE division per day.
    "WITH d AS (SELECT CAST(ts AS DATE) AS day, "
    " CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) "
    "  AS BIGINT) AS cents "
    " FROM events WHERE event_type = 'purchase' GROUP BY 1), "
    "df AS (SELECT day, cents - LAG(cents) OVER (ORDER BY day) AS diff "
    " FROM d), "
    "dd AS (SELECT day, diff, ROW_NUMBER() OVER (ORDER BY day) AS rn "
    " FROM df WHERE diff IS NOT NULL), "
    "r AS (SELECT day, rn, "
    " CAST(SUM(CASE WHEN diff > 0 THEN diff ELSE 0 END) OVER w AS BIGINT)"
    "  AS g, "
    " CAST(SUM(CASE WHEN diff < 0 THEN -diff ELSE 0 END) OVER w AS BIGINT)"
    "  AS l "
    " FROM dd WINDOW w AS (ORDER BY day "
    "  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) "
    "SELECT STRFTIME(day, '%Y-%m-%d') AS day, g AS gains_cents, "
    "l AS losses_cents, "
    "printf('%.6f', ROUND(CAST(100 * g AS DOUBLE) "
    " / CAST(g + l AS DOUBLE), 6)) AS rsi "
    "FROM r WHERE rn >= 7 AND g + l > 0",
)
def events_rsi(spark, sf):
    """Relative Strength Index (7-day, simple-average form) over daily
    purchase revenue — the momentum readout next to
    ``events_drawdown``'s worst-slump and ``events_bollinger``'s
    volatility bands: RSI near 100 means the last week's moves were
    almost all gains, near 0 almost all losses. The simple (Cutler)
    form is chosen over Wilder's 1/14 smoothing DELIBERATELY: Wilder's
    recurrence multiplies by the non-dyadic 13/14 every step, while
    rolling gain/loss SUMS of exact cents stay integers and RSI
    collapses to 100*g/(g+l) — ONE correctly-rounded IEEE division per
    day under ROUND + %.6f (the 100*g numerator stays an exact
    BIGINT, no percent float ever multiplies).

    Scale shape: one map-side-combinable day collapse, one LAG and one
    rolling window over the bounded day grain — never corpus-scale."""
    return rsi_rollup(purchase_daily_cents(_events(spark, sf)))


def rsi_rollup(d: DataFrame) -> DataFrame:
    """Fold the (day, cents) grain into the RSI table — shared by
    ``events_rsi`` and its streaming twin (which rides the SAME
    sum-mergeable daily-cents state as stream_drawdown: one state
    definition, two readouts — the wilcoxon/sign pattern)."""
    wl = Window.orderBy("day")
    df = d.select(
        "day",
        (F.col("cents") - F.lag("cents").over(wl)).alias("diff"),
    ).filter(F.col("diff").isNotNull())
    dd = df.select("day", "diff", F.row_number().over(wl).alias("rn"))
    w7 = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    r = dd.select(
        "day",
        "rn",
        F.sum(F.when(F.col("diff") > 0, F.col("diff")).otherwise(0))
        .over(w7)
        .cast("long")
        .alias("g"),
        F.sum(F.when(F.col("diff") < 0, -F.col("diff")).otherwise(0))
        .over(w7)
        .cast("long")
        .alias("l"),
    )
    g, l = F.col("g"), F.col("l")
    return r.filter((F.col("rn") >= 7) & (g + l > 0)).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        g.alias("gains_cents"),
        l.alias("losses_cents"),
        _FMT6((100 * g).cast("double") / (g + l).cast("double")).alias(
            "rsi"
        ),
    )


# ------------------------------------------------ session macro report ----

@register(
    "macro_session_report",
    # Composes the session-span grain ONCE: counts, the avg duration
    # (one division of exact microsecond integers), and the
    # interval-overlap pair count (the join_interval_overlap relation
    # re-stated as the direct non-equi definition).
    "WITH s AS (SELECT user_id, session_id, "
    " CAST(epoch_us(MIN(CAST(ts AS TIMESTAMP))) AS BIGINT) AS st, "
    " CAST(epoch_us(MAX(CAST(ts AS TIMESTAMP))) AS BIGINT) AS en FROM ("
    " SELECT user_id, ts, SUM(is_new) OVER ("
    "  PARTITION BY user_id ORDER BY ts, event_id"
    "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM ("
    "  SELECT user_id, ts, event_id, CASE WHEN ts - LAG(ts) OVER ("
    "   PARTITION BY user_id ORDER BY ts, event_id) <= INTERVAL 30 MINUTE"
    "   THEN 0 ELSE 1 END AS is_new FROM events)) "
    " GROUP BY user_id, session_id), "
    "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions, "
    " CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users, "
    " CAST(SUM(en - st) AS BIGINT) AS total_dur_us FROM s), "
    "p AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_overlap_pairs "
    " FROM s a JOIN s b ON a.st <= b.en AND b.st <= a.en "
    " AND a.user_id < b.user_id) "
    "SELECT n_sessions, n_users, "
    "printf('%.6f', ROUND(CAST(total_dur_us AS DOUBLE) "
    " / CAST(n_sessions AS DOUBLE), 6)) AS avg_dur_us, "
    "n_overlap_pairs FROM m, p WHERE n_sessions > 0",
)
def macro_session_report(spark, sf):
    """One-row session health profile — the composition macro over the
    session-span grain (the macro_series_profile discipline): session
    and user counts, mean session duration, and the cross-user
    concurrency pair count, all from ONE derivation of the
    ``_session_spans`` intervals that ``win_session_batch`` and
    ``join_interval_overlap`` expose individually.

    Float discipline: durations are exact epoch-microsecond BIGINTs;
    the mean is ONE IEEE division under ROUND + %.6f; the pair count
    re-derives the bucketed overlap join's relation.

    Scale shape: the span grain is derived once and localCheckpoint'ed
    so the three readouts don't re-run the session windows; the
    overlap count reuses the hour-bucket equi-join discipline."""
    from .relational import _OVERLAP_BUCKET_US, _session_spans

    s = _session_spans(spark, sf).localCheckpoint()
    m = s.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.sum(F.col("en") - F.col("st"))
        .cast("long")
        .alias("total_dur_us"),
    )
    # bucket width near the mean session duration (see
    # join_interval_overlap's r6 note) — the hour grid paid ~1.3e9
    # candidate evaluations for 15M true pairs at sf1.0
    hour = _OVERLAP_BUCKET_US
    b = s.select(
        "user_id",
        "session_id",
        "st",
        "en",
        F.explode(
            F.sequence(
                F.floor(F.col("st") / hour).cast("long"),
                F.floor(F.col("en") / hour).cast("long"),
            )
        ).alias("bucket"),
    )
    left = b.select(
        F.col("user_id").alias("ua"),
        F.col("session_id").alias("sa"),
        F.col("st").alias("st_a"),
        F.col("en").alias("en_a"),
        "bucket",
    )
    right = b.select(
        F.col("user_id").alias("ub"),
        F.col("session_id").alias("sb"),
        F.col("st").alias("st_b"),
        F.col("en").alias("en_b"),
        "bucket",
    )
    # first-shared-bucket residual: each overlapping pair is emitted
    # exactly once, so the former DISTINCT exchange disappears (r6; see
    # join_interval_overlap)
    p = (
        left.join(right, "bucket")
        .filter(
            (F.col("ua") < F.col("ub"))
            & (F.col("st_a") <= F.col("en_b"))
            & (F.col("st_b") <= F.col("en_a"))
            & (
                F.col("bucket")
                == F.floor(F.greatest("st_a", "st_b") / hour).cast("long")
            )
        )
        .select("ua", "sa", "ub", "sb")
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap_pairs"))
    )
    return (
        m.crossJoin(F.broadcast(p))
        .filter(F.col("n_sessions") > 0)
        .select(
            "n_sessions",
            "n_users",
            _FMT6(
                F.col("total_dur_us").cast("double")
                / F.col("n_sessions").cast("double")
            ).alias("avg_dur_us"),
            "n_overlap_pairs",
        )
    )


# ------------------------------------- Holt-Winters seasonal smoothing ----

def _hw_exprs(y: str, s1: str, l: str, b: str) -> tuple[str, str, str]:
    """The additive Holt-Winters step (alpha = beta = gamma = 1/2,
    period 7) as three expression strings over engine-specific operand
    spellings — the l_t expression textually repeated inside b_t and
    s_t (the events_holt discipline, now with a third coupled
    recurrence), so both engines execute the identical IEEE op
    sequence."""
    lnew = f"(({y} - {s1}) + ({l} + {b})) / 2"
    bnew = f"((({lnew}) - {l}) + {b}) / 2"
    snew = f"(({y} - ({lnew})) + {s1}) / 2"
    return lnew, bnew, snew


def _hw_l0(elem) -> str:
    """Fixed 7-term left-associated seasonal-init chain over
    day-ordered values; ``elem(i)`` renders the i-th value's
    double-cast spelling."""
    chain = " + ".join(elem(i) for i in range(1, 8))
    return f"({chain}) / 7"


def _hw_sql() -> str:
    e_y = "CAST(r.cnt AS DOUBLE)"
    lnew, bnew, snew = _hw_exprs(e_y, "e.s[1]", "e.l", "e.b")
    l0 = _hw_l0(lambda i: f"CAST(a[{i}] AS DOUBLE)")
    seed_s = ", ".join(
        f"CAST(a[{i}] AS DOUBLE) - ({l0})" for i in range(1, 8)
    )
    return (
        "WITH RECURSIVE d AS (SELECT event_type, strftime(ts, '%Y-%m-%d')"
        " AS day, CAST(COUNT(*) AS BIGINT) AS cnt FROM events"
        " GROUP BY 1, 2), "
        "ar AS (SELECT event_type, list(cnt ORDER BY day) AS a,"
        " CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1), "
        "r AS (SELECT event_type, cnt, CAST(ROW_NUMBER() OVER ("
        " PARTITION BY event_type ORDER BY day) AS BIGINT) AS rn FROM d), "
        "e(event_type, rn, l, b, s) AS ("
        f" SELECT event_type, CAST(7 AS BIGINT), {l0}, CAST(0 AS DOUBLE),"
        f" [{seed_s}] FROM ar WHERE n >= 7 "
        " UNION ALL "
        f" SELECT r.event_type, r.rn, {lnew}, {bnew},"
        f" e.s[2:7] || [{snew}] "
        " FROM e JOIN r ON r.event_type = e.event_type"
        "  AND r.rn = e.rn + 1), "
        "f AS (SELECT event_type, MAX(rn) AS mx FROM e GROUP BY 1) "
        "SELECT e.event_type, "
        "(SELECT n FROM ar WHERE ar.event_type = e.event_type) AS n_days, "
        "printf('%.6f', ROUND(e.l, 6)) AS level, "
        "printf('%.6f', ROUND(e.b, 6)) AS trend, "
        "printf('%.6f', ROUND(e.s[1], 6)) AS seasonal_next, "
        "printf('%.6f', ROUND((e.l + e.b) + e.s[1], 6)) AS forecast_1 "
        "FROM e JOIN f ON f.event_type = e.event_type AND e.rn = f.mx"
    )


@register("events_holt_winters", _hw_sql())
def events_holt_winters(spark, sf):
    """Additive Holt-Winters smoothing (alpha = beta = gamma = 1/2,
    period 7) of each type's daily volume — the seasonal completion of
    the smoothing family (``events_ewma`` tracks level,
    ``events_holt`` adds trend; Holt-Winters adds the weekly seasonal
    a daily business metric actually has, and its one-step forecast
    level + trend + next-seasonal is what ``events_forecast``'s
    seasonal-naive baseline graduates into). Emits the final level,
    trend, next-day seasonal, and one-step forecast per type.

    Float discipline: the TRIPLE coupled recurrence runs under the
    events_holt fold-vs-recursive-CTE contract — the state carries the
    last 7 seasonals as an ARRAY (rotated one slot per step), the l_t
    expression is textually repeated inside b_t AND s_t, the seasonal
    init is a fixed 7-term left-associated chain, and every constant
    is dyadic — so each intermediate double is bit-identical across
    engines by construction.

    Scale shape: one map-side-combinable fact collapse to the shared
    ``daily_counts`` grain, one event_type exchange; the fold is
    O(days) per type with an O(period) state — calendar-bounded."""
    return holt_winters_rollup(daily_counts(_events(spark, sf)))


def holt_winters_rollup(d: DataFrame) -> DataFrame:
    """Fold a (event_type, day, cnt) daily table into the per-type
    Holt-Winters readout — shared by ``events_holt_winters`` and any
    streaming twin (the triple-recurrence float contract lives
    here)."""
    arr = d.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "cnt"))).alias("a"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    l0 = _hw_l0(lambda i: f"CAST(element_at(a, {i}).cnt AS DOUBLE)")
    seed_s = ", ".join(
        f"CAST(element_at(a, {i}).cnt AS DOUBLE) - ({l0})"
        for i in range(1, 8)
    )
    lnew, bnew, snew = _hw_exprs(
        "CAST(x.cnt AS DOUBLE)", "element_at(st.s, 1)", "st.l", "st.b"
    )
    fold = F.expr(
        "aggregate(slice(a, 8, size(a) - 7), "
        f"named_struct('l', {l0}, 'b', CAST(0 AS DOUBLE), "
        f"'s', array({seed_s})), "
        f"(st, x) -> named_struct('l', {lnew}, 'b', {bnew}, "
        f"'s', concat(slice(st.s, 2, 6), array({snew}))))"
    )
    return (
        arr.filter(F.col("n") >= 7)
        .select("event_type", "n", fold.alias("st"))
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            _FMT6(F.col("st.l")).alias("level"),
            _FMT6(F.col("st.b")).alias("trend"),
            _FMT6(F.expr("element_at(st.s, 1)")).alias("seasonal_next"),
            _FMT6(
                (F.col("st.l") + F.col("st.b"))
                + F.expr("element_at(st.s, 1)")
            ).alias("forecast_1"),
        )
    )


# ------------------------------- two-sample effect sizes (vc grain) ----

def cliff_rollup(vc: DataFrame) -> DataFrame:
    """Fold the (cents, c0, c1) grain into the one-row Cliff's-delta
    readout — shared by ``events_cliff_delta`` and its streaming twin
    (the grain is plain SUMs, so the twin is a theorem about SUM)."""
    wprev = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, -1
    )
    t = vc.agg(
        F.sum("c0").cast("long").alias("n0"),
        F.sum("c1").cast("long").alias("n1"),
    )
    c = vc.select(
        "c0",
        "c1",
        F.coalesce(F.sum("c1").over(wprev), F.lit(0)).alias("b1"),
    )
    gl = c.crossJoin(t.select("n1")).agg(
        F.sum(F.col("c0") * F.col("b1")).cast("long").alias("gt_pairs"),
        F.sum(F.col("c0") * (F.col("n1") - F.col("b1") - F.col("c1")))
        .cast("long")
        .alias("lt_pairs"),
    )
    out = gl.crossJoin(t)
    diff = F.col("gt_pairs") - F.col("lt_pairs")
    np_ = F.col("n0") * F.col("n1")
    return out.select(
        "n0",
        "n1",
        "gt_pairs",
        "lt_pairs",
        _FMT6(diff.cast("double") / np_.cast("double")).alias("delta"),
        F.when(F.abs(diff) * 1000 < 147 * np_, "negligible")
        .when(F.abs(diff) * 1000 < 330 * np_, "small")
        .when(F.abs(diff) * 1000 < 474 * np_, "medium")
        .otherwise("large")
        .alias("magnitude"),
    )


@register(
    "events_cliff_delta",
    # Cliff's delta between the hash variants on binned purchase cents:
    # gt/lt pair counts via one ordered cumsum over the bounded grain
    # (gt = sum c0*cumBefore1, lt = sum c0*(n1 - cumIncl1)), delta is
    # ONE division of exact BIGINTs, and the Romano magnitude labels
    # (0.147/0.33/0.474) decide through integer cross-multiplication so
    # the non-dyadic thresholds never meet a float.
    f"WITH vc AS ({_VC_SQL}), "
    "t AS (SELECT CAST(SUM(c0) AS BIGINT) AS n0, "
    " CAST(SUM(c1) AS BIGINT) AS n1 FROM vc), "
    "c AS (SELECT c0, c1, COALESCE(SUM(c1) OVER (ORDER BY cents "
    " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b1 "
    " FROM vc), "
    "gl AS (SELECT CAST(SUM(c0 * b1) AS BIGINT) AS gt_pairs, "
    " CAST(SUM(c0 * (n1 - b1 - c1)) AS BIGINT) AS lt_pairs "
    " FROM c, t) "
    "SELECT n0, n1, gt_pairs, lt_pairs, "
    "printf('%.6f', ROUND(CAST(gt_pairs - lt_pairs AS DOUBLE) "
    " / CAST(n0 * n1 AS DOUBLE), 6)) AS delta, "
    "CASE WHEN ABS(gt_pairs - lt_pairs) * 1000 < 147 * n0 * n1 "
    " THEN 'negligible' "
    "WHEN ABS(gt_pairs - lt_pairs) * 1000 < 330 * n0 * n1 THEN 'small' "
    "WHEN ABS(gt_pairs - lt_pairs) * 1000 < 474 * n0 * n1 THEN 'medium' "
    "ELSE 'large' END AS magnitude "
    "FROM gl, t",
)
def events_cliff_delta(spark, sf):
    """Cliff's delta — the ordinal effect size for the variant split:
    P(amount_A > amount_B) - P(amount_A < amount_B), the robust
    magnitude companion to ``events_mann_whitney``'s significance z
    (a rank test can be 'significant' at a negligible effect on big
    data; delta is what decides if anyone should care).

    Float discipline: both pair counts are exact BIGINTs from one
    ordered cumsum over the bounded cents grain (gt = sum of
    c0*cum-before-1, lt via the complement), delta is ONE
    correctly-rounded IEEE division under ROUND + %.6f, and the
    Romano/Cliff magnitude bands (|d| < 0.147 / 0.33 / 0.474) are
    integer cross-multiplications — the non-dyadic thresholds never
    decide through a float.

    Scale shape: one fact-scale sum-mergeable aggregation to the
    cents grain (events_ks_test discipline), one window over that
    dimension table, two one-row rollups."""
    vc = value_counts_by_variant(_events(spark, sf)).localCheckpoint()
    return cliff_rollup(vc)


def cohens_rollup(vc: DataFrame) -> DataFrame:
    """Fold the (cents, c0, c1) grain into the Cohen's-d readout —
    shared with the streaming twin (moment sums are plain SUMs)."""
    t = vc.agg(
        F.sum("c0").cast("long").alias("n0"),
        F.sum("c1").cast("long").alias("n1"),
        F.sum(F.col("cents") * F.col("c0")).cast("long").alias("s0"),
        F.sum(F.col("cents") * F.col("c1")).cast("long").alias("s1"),
        F.sum(F.col("cents") * F.col("cents") * F.col("c0"))
        .cast("long")
        .alias("q0"),
        F.sum(F.col("cents") * F.col("cents") * F.col("c1"))
        .cast("long")
        .alias("q1"),
    )
    n0, n1 = F.col("n0"), F.col("n1")
    s0, s1 = F.col("s0"), F.col("s1")
    q0, q1 = F.col("q0"), F.col("q1")
    dbl = lambda c: c.cast("double")  # noqa: E731
    ss0 = dbl(n0 * q0 - s0 * s0) / dbl(n0)
    ss1 = dbl(n1 * q1 - s1 * s1) / dbl(n1)
    sp = F.sqrt((ss0 + ss1) / dbl(n0 + n1 - 2))
    d = (dbl(s0) / dbl(n0) - dbl(s1) / dbl(n1)) / sp
    j = F.lit(1.0) - F.lit(3.0) / dbl(4 * (n0 + n1 - 2) - 1)
    return t.filter((n0 > 1) & (n1 > 1)).select(
        "n0",
        "n1",
        _FMT6(dbl(s0) / dbl(n0)).alias("mean0_cents"),
        _FMT6(dbl(s1) / dbl(n1)).alias("mean1_cents"),
        _FMT6(sp).alias("pooled_sd"),
        _FMT6(d).alias("cohens_d"),
        _FMT6(d * j).alias("hedges_g"),
    )


@register(
    "events_cohens_d",
    # Cohen's d / Hedges' g between the hash variants on binned cents:
    # per-group moment sums (n, sum, sum-of-squares) are exact BIGINTs,
    # the pooled sd and d spell ONE fixed IEEE chain (exact-integer
    # numerators n*q - s^2, correctly-rounded divisions + sqrt)
    # identically on both engines; g multiplies by the exact-rational
    # small-sample factor 1 - 3/(4*df - 1).
    f"WITH vc AS ({_VC_SQL}), "
    "t AS (SELECT CAST(SUM(c0) AS BIGINT) AS n0, "
    " CAST(SUM(c1) AS BIGINT) AS n1, "
    " CAST(SUM(cents * c0) AS BIGINT) AS s0, "
    " CAST(SUM(cents * c1) AS BIGINT) AS s1, "
    " CAST(SUM(cents * cents * c0) AS BIGINT) AS q0, "
    " CAST(SUM(cents * cents * c1) AS BIGINT) AS q1 FROM vc) "
    "SELECT n0, n1, "
    "printf('%.6f', ROUND(CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE), 6)) "
    " AS mean0_cents, "
    "printf('%.6f', ROUND(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6)) "
    " AS mean1_cents, "
    "printf('%.6f', ROUND(sqrt((CAST(n0 * q0 - s0 * s0 AS DOUBLE) "
    "  / CAST(n0 AS DOUBLE) + CAST(n1 * q1 - s1 * s1 AS DOUBLE) "
    "  / CAST(n1 AS DOUBLE)) / CAST(n0 + n1 - 2 AS DOUBLE)), 6)) "
    " AS pooled_sd, "
    "printf('%.6f', ROUND((CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) "
    "  - CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) "
    " / sqrt((CAST(n0 * q0 - s0 * s0 AS DOUBLE) / CAST(n0 AS DOUBLE) "
    "  + CAST(n1 * q1 - s1 * s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) "
    "  / CAST(n0 + n1 - 2 AS DOUBLE)), 6)) AS cohens_d, "
    "printf('%.6f', ROUND(((CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) "
    "  - CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) "
    " / sqrt((CAST(n0 * q0 - s0 * s0 AS DOUBLE) / CAST(n0 AS DOUBLE) "
    "  + CAST(n1 * q1 - s1 * s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) "
    "  / CAST(n0 + n1 - 2 AS DOUBLE))) "
    " * (1.0 - 3.0 / CAST(4 * (n0 + n1 - 2) - 1 AS DOUBLE)), 6)) "
    " AS hedges_g "
    "FROM t WHERE n0 > 1 AND n1 > 1",
)
def events_cohens_d(spark, sf):
    """Cohen's d (and Hedges' g) — the standardized mean difference
    between the hash variants' purchase amounts, the parametric effect
    size next to ``events_cliff_delta``'s ordinal one and the
    magnitude companion to ``events_ab_test``'s z.

    Float discipline: group moments (n, sum, sum-of-squares of exact
    integer cents) are exact BIGINTs; each sum-of-squared-deviations
    keeps an EXACT integer numerator (n*q - s^2) over one division by
    n, so the pooled sd, d, and g are ONE fixed chain of
    correctly-rounded IEEE ops (div/add/sqrt/mul) spelled identically
    on both engines — identical op trees give identical bits. Hedges'
    J = 1 - 3/(4*df - 1) is exact-rational, one division. (At 100 TB
    the moment sums move to DECIMAL(38,0) — cents^2 * count would
    stress BIGINT around ~1e5-cent amounts x 1e9 rows.)

    Scale shape: one fact-scale sum-mergeable aggregation to the
    cents grain, then a single one-row fold — never reshuffles."""
    vc = value_counts_by_variant(_events(spark, sf))
    return cohens_rollup(vc)


# ------------------------------- 2x2 association (odds ratio / phi) ----

@register(
    "events_odds_ratio",
    # 2x2 association between hash variant and conversion (the
    # events_ab_test conv rule): all four cells are exact BIGINTs, the
    # odds ratio and relative risk are ONE division each of exact
    # integer cross-products, and phi (= the binary Matthews
    # correlation) divides the exact integer a*d - b*c by a sqrt of a
    # fixed left-associated double product of the four margins.
    "WITH u AS (SELECT user_id, user_id % 2 AS variant, "
    " CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) * 5 "
    "  > COUNT(*) THEN 1 ELSE 0 END AS conv "
    " FROM events GROUP BY user_id), "
    "g AS (SELECT "
    " CAST(SUM(CASE WHEN variant = 0 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a, "
    " CAST(SUM(CASE WHEN variant = 0 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b, "
    " CAST(SUM(CASE WHEN variant = 1 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c, "
    " CAST(SUM(CASE WHEN variant = 1 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d "
    " FROM u) "
    "SELECT a, b, c, d, "
    "printf('%.6f', ROUND(CAST(a * d AS DOUBLE) / CAST(b * c AS DOUBLE), 6)) "
    " AS odds_ratio, "
    "printf('%.6f', ROUND(CAST(a * (c + d) AS DOUBLE) "
    " / CAST(c * (a + b) AS DOUBLE), 6)) AS relative_risk, "
    "printf('%.6f', ROUND(CAST(a * d - b * c AS DOUBLE) "
    " / sqrt(CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE) "
    "   * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE)), 6)) AS phi "
    "FROM g WHERE a > 0 AND b > 0 AND c > 0 AND d > 0",
)
def events_odds_ratio(spark, sf):
    """Odds ratio / relative risk / phi for the variant-conversion 2x2
    table — the effect-size companions to ``events_ab_test``'s z (the
    z says WHETHER rates differ; OR/RR/phi say by HOW MUCH, the numbers
    an experiment readout actually reports). phi is the binary Matthews
    correlation, the balanced single-number association.

    Float discipline: the four cells are exact BIGINTs from one
    user-grain rollup; OR = ad/bc and RR = a(c+d)/(c(a+b)) are ONE
    division each of exact integer cross-products; phi divides the
    exact integer determinant a*d - b*c by sqrt of a FIXED
    left-associated double product of the four margins (each margin an
    exact integer, so the four casts are exact and the multiply chain
    is the same three correctly-rounded ops on both engines). The
    all-cells-positive guard keeps IEEE infinities out of the contract.

    Scale shape: one user-keyed aggregation over facts (map-side
    combinable), then a single-row rollup — the events_ab_test plan
    with a different final expression."""
    e = _events(spark, sf)
    u = (
        e.groupBy("user_id")
        .agg(
            F.when(
                F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                )
                * 5
                > F.count(F.lit(1)),
                1,
            )
            .otherwise(0)
            .alias("conv")
        )
        .select((F.col("user_id") % 2).alias("variant"), "conv")
    )
    cell = lambda v, cv: (  # noqa: E731
        F.sum(
            F.when((F.col("variant") == v) & (F.col("conv") == cv), 1)
            .otherwise(0)
        )
        .cast("long")
    )
    g = u.agg(
        cell(0, 1).alias("a"),
        cell(0, 0).alias("b"),
        cell(1, 1).alias("c"),
        cell(1, 0).alias("d"),
    )
    a, b, c, d = (F.col(x) for x in "abcd")
    dbl = lambda col: col.cast("double")  # noqa: E731
    return g.filter((a > 0) & (b > 0) & (c > 0) & (d > 0)).select(
        "a",
        "b",
        "c",
        "d",
        _FMT6(dbl(a * d) / dbl(b * c)).alias("odds_ratio"),
        _FMT6(dbl(a * (c + d)) / dbl(c * (a + b))).alias("relative_risk"),
        _FMT6(
            dbl(a * d - b * c)
            / F.sqrt(dbl(a + b) * dbl(c + d) * dbl(a + c) * dbl(b + d))
        ).alias("phi"),
    )


# ------------------------------------------------------ Gini coefficient ----

def user_cents_totals(df: DataFrame) -> DataFrame:
    """Per-user total purchase cents (purchasers only) — the shared
    grain for ``events_gini``. The total is a plain SUM of exact
    integer cents, so the state is exactly mergeable across
    micro-batches."""
    return (
        df.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.floor(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )


def gini_rollup(ut: DataFrame) -> DataFrame:
    """Fold the per-user cents totals into the one-row Gini readout —
    shared by ``events_gini`` and its streaming twin."""
    w = Window.orderBy("cents", "user_id")
    r = ut.select(
        "cents", F.row_number().over(w).cast("long").alias("i")
    )
    g = r.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.sum(F.col("i") * F.col("cents")).cast("long").alias("wsum"),
    )
    num = 2 * F.col("wsum") - (F.col("n_users") + 1) * F.col("total_cents")
    den = F.col("n_users") * F.col("total_cents")
    return g.filter(F.col("total_cents") > 0).select(
        "n_users",
        "total_cents",
        _FMT6(num.cast("double") / den.cast("double")).alias("gini"),
    )


@register(
    "events_gini",
    # Gini coefficient of per-user purchase spend: with x_(1..n) the
    # sorted exact-integer cents totals, G = (2*sum i*x_i - (n+1)*S)
    # / (n*S) — every term an exact BIGINT (ties permute equal values
    # so the rank tie-break cannot move the sum), ONE final division.
    "WITH ut AS (SELECT user_id, "
    " CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS cents "
    " FROM events WHERE event_type = 'purchase' GROUP BY user_id), "
    "r AS (SELECT cents, CAST(ROW_NUMBER() OVER (ORDER BY cents, user_id) "
    " AS BIGINT) AS i FROM ut), "
    "g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users, "
    " CAST(SUM(cents) AS BIGINT) AS total_cents, "
    " CAST(SUM(i * cents) AS BIGINT) AS wsum FROM r) "
    "SELECT n_users, total_cents, "
    "printf('%.6f', ROUND(CAST(2 * wsum - (n_users + 1) * total_cents "
    " AS DOUBLE) / CAST(n_users * total_cents AS DOUBLE), 6)) AS gini "
    "FROM g WHERE total_cents > 0",
)
def events_gini(spark, sf):
    """Gini coefficient of per-user purchase spend — the one-number
    inequality readout next to ``events_lorenz``'s curve and
    ``events_pareto``'s top-share (the whale-concentration metric every
    revenue dashboard carries).

    Float discipline: per-user cents totals are exact BIGINTs; with
    ranks i from a total order (cents, user_id — ties carry equal
    values, so any tie order leaves sum(i*x_i) unchanged), the numerator
    2*sum(i*x_i) - (n+1)*S and denominator n*S are exact BIGINTs and
    the Gini is ONE correctly-rounded IEEE division under ROUND + %.6f.
    (At 100 TB the weighted sum moves to DECIMAL(38,0) — rank x cents
    x users stresses BIGINT around 1e9 purchasers.)

    Scale shape: one user-keyed fact aggregation (map-side combinable),
    one global sort of the user-grain dimension (the sort_global
    shape — range-partitioned, no single-node bottleneck), one one-row
    rollup."""
    ut = user_cents_totals(_events(spark, sf)).localCheckpoint()
    return gini_rollup(ut)


# ------------------------------------------- Hoover index / MAD / CV ----

def hoover_rollup(ut: DataFrame) -> DataFrame:
    """Fold the per-user cents totals into the one-row Hoover-index /
    mean-absolute-deviation / coefficient-of-variation readout —
    shared by ``events_hoover`` and its streaming twin."""
    g = ut.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum((F.col("cents") * F.col("cents")).cast("decimal(38,0)"))
        .alias("q"),
    )
    a = (
        ut.join(F.broadcast(g))
        .agg(
            F.min("n").cast("long").alias("n_users"),
            F.min("s").cast("long").alias("total_cents"),
            F.min("q").alias("q"),
            F.sum(F.abs(F.col("n") * F.col("cents") - F.col("s")))
            .cast("long")
            .alias("adev"),
        )
    )
    n, s, q, adev = (F.col(c) for c in ("n_users", "total_cents", "q", "adev"))
    ss = (
        n.cast("decimal(38,0)") * q
        - s.cast("decimal(38,0)") * s.cast("decimal(38,0)")
    )
    return a.filter((s > 0) & (n > 1)).select(
        "n_users",
        "total_cents",
        _FMT6(
            adev.cast("double") / (2 * n * s).cast("double")
        ).alias("hoover"),
        _FMT6(adev.cast("double") / (n * n).cast("double")).alias(
            "mad_mean"
        ),
        _FMT6(F.sqrt(ss.cast("double")) / s.cast("double")).alias("cv"),
    )


@register(
    "events_hoover",
    # Hoover (Robin Hood) index, mean absolute deviation around the
    # mean, and coefficient of variation of per-user purchase spend:
    # with exact BIGINT cents totals x_i, every |n*x_i - S| is an exact
    # BIGINT, so Hoover = sum|n*x_i - S| / (2nS) and MAD = that sum /
    # n^2 are ONE division each; CV = sqrt(n*q - S^2)/S keeps the
    # sum-of-squares exact in HUGEINT/DECIMAL under one
    # correctly-rounded sqrt and ONE division.
    "WITH ut AS (SELECT user_id, "
    " CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS cents "
    " FROM events WHERE event_type = 'purchase' GROUP BY user_id), "
    "g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
    " CAST(SUM(cents) AS BIGINT) AS s, "
    " SUM(CAST(cents AS HUGEINT) * cents) AS q FROM ut), "
    "a AS (SELECT MIN(n) AS n_users, MIN(s) AS total_cents, MIN(q) AS q, "
    " CAST(SUM(ABS(n * cents - s)) AS BIGINT) AS adev FROM ut, g) "
    "SELECT CAST(n_users AS BIGINT) AS n_users, "
    "CAST(total_cents AS BIGINT) AS total_cents, "
    "printf('%.6f', ROUND(CAST(adev AS DOUBLE) "
    " / CAST(2 * n_users * total_cents AS DOUBLE), 6)) AS hoover, "
    "printf('%.6f', ROUND(CAST(adev AS DOUBLE) "
    " / CAST(n_users * n_users AS DOUBLE), 6)) AS mad_mean, "
    "printf('%.6f', ROUND(sqrt(CAST(CAST(n_users AS HUGEINT) * q "
    "  - CAST(total_cents AS HUGEINT) * total_cents AS DOUBLE)) "
    "  / CAST(total_cents AS DOUBLE), 6)) AS cv "
    "FROM a WHERE total_cents > 0 AND n_users > 1",
)
def events_hoover(spark, sf):
    """Hoover (Robin Hood) index, mean absolute deviation, and
    coefficient of variation of per-user purchase spend — the
    redistribute-this-much inequality number next to ``events_gini``
    (Hoover is the largest vertical gap between ``events_lorenz``'s
    curve and the diagonal: the share of total spend that would have
    to move to equalize users), plus the two classic spread-to-scale
    readouts a revenue dashboard quotes alongside it.

    Float discipline: per-user cents totals are exact BIGINTs; every
    deviation |n*x_i - S| is an exact BIGINT (the events_outlier_mad
    scaled-deviation trick), so Hoover = A/(2nS) and MAD = A/n^2 are
    ONE correctly-rounded IEEE division each; CV keeps the
    sum-of-squares exact in DECIMAL(38,0)/HUGEINT (the events_autocorr
    wide-integer contract — cents^2 x users overflows BIGINT at
    corpus scale), casts once, and is one correctly-rounded sqrt over
    ONE division — identical on both engines. Degenerate n<=1 or
    zero-total corpora are filtered (all three undefined).

    Scale shape: one user-keyed fact aggregation (map-side
    combinable), a one-row broadcast joined back for the deviation
    pass, one one-row rollup — facts touched once, the user grain
    twice, nothing global ever sorts."""
    ut = user_cents_totals(_events(spark, sf)).localCheckpoint()
    return hoover_rollup(ut)


# ------------------------------------------------------ Palma ratio ----

def palma_rollup(ut: DataFrame) -> DataFrame:
    """Fold the per-user cents totals into the one-row Palma-ratio
    readout (top-10% share / bottom-40% share) — shared by
    ``events_palma`` and its streaming twin."""
    w = Window.orderBy("cents", "user_id")
    r = ut.select(
        "cents", F.row_number().over(w).cast("long").alias("i")
    )
    g = r.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("cents").cast("long").alias("total_cents"),
    )
    a = (
        r.join(F.broadcast(g))
        .agg(
            F.min("n_users").alias("n_users"),
            F.min("total_cents").alias("total_cents"),
            F.sum(
                F.when(
                    F.col("i") * 5 <= F.col("n_users") * 2, F.col("cents")
                ).otherwise(0)
            )
            .cast("long")
            .alias("bottom40_cents"),
            F.sum(
                F.when(
                    F.col("i") * 10 > F.col("n_users") * 9, F.col("cents")
                ).otherwise(0)
            )
            .cast("long")
            .alias("top10_cents"),
        )
    )
    n, s = F.col("n_users"), F.col("total_cents")
    b, t = F.col("bottom40_cents"), F.col("top10_cents")
    return a.filter((s > 0) & (b > 0)).select(
        "n_users",
        "total_cents",
        "bottom40_cents",
        "top10_cents",
        _FMT6(b.cast("double") / s.cast("double")).alias("bottom40_share"),
        _FMT6(t.cast("double") / s.cast("double")).alias("top10_share"),
        _FMT6(t.cast("double") / b.cast("double")).alias("palma_ratio"),
    )


@register(
    "events_palma",
    # Palma ratio of per-user purchase spend: rank users by (cents,
    # user_id); bottom-40% membership is the exact integer comparison
    # 5i <= 2n and top-10% is 10i > 9n (no float quantile cut ever
    # exists), the three sums are exact BIGINTs, and each share/ratio
    # is ONE correctly-rounded IEEE division under ROUND + %.6f.
    "WITH ut AS (SELECT user_id, "
    " CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS cents "
    " FROM events WHERE event_type = 'purchase' GROUP BY user_id), "
    "r AS (SELECT cents, CAST(ROW_NUMBER() OVER (ORDER BY cents, user_id) "
    " AS BIGINT) AS i FROM ut), "
    "g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users, "
    " CAST(SUM(cents) AS BIGINT) AS total_cents FROM r), "
    "a AS (SELECT MIN(n_users) AS n_users, "
    " MIN(total_cents) AS total_cents, "
    " CAST(SUM(CASE WHEN i * 5 <= n_users * 2 THEN cents ELSE 0 END) "
    "  AS BIGINT) AS bottom40_cents, "
    " CAST(SUM(CASE WHEN i * 10 > n_users * 9 THEN cents ELSE 0 END) "
    "  AS BIGINT) AS top10_cents FROM r, g) "
    "SELECT CAST(n_users AS BIGINT) AS n_users, "
    "CAST(total_cents AS BIGINT) AS total_cents, "
    "bottom40_cents, top10_cents, "
    "printf('%.6f', ROUND(CAST(bottom40_cents AS DOUBLE) "
    " / CAST(total_cents AS DOUBLE), 6)) AS bottom40_share, "
    "printf('%.6f', ROUND(CAST(top10_cents AS DOUBLE) "
    " / CAST(total_cents AS DOUBLE), 6)) AS top10_share, "
    "printf('%.6f', ROUND(CAST(top10_cents AS DOUBLE) "
    " / CAST(bottom40_cents AS DOUBLE), 6)) AS palma_ratio "
    "FROM a WHERE total_cents > 0 AND bottom40_cents > 0",
)
def events_palma(spark, sf):
    """Palma ratio of per-user purchase spend — the top-10%-share over
    bottom-40%-share inequality readout (the development-economics
    standard that reads tail concentration directly, where
    ``events_gini`` is most sensitive to the middle of the
    distribution; quoting both is how an inequality report avoids
    mistaking a fat middle for a heavy tail).

    Float discipline: membership cuts are EXACT integer
    cross-multiplications on ranks from the total (cents, user_id)
    order — 5i <= 2n for the bottom 40%, 10i > 9n for the top 10% —
    so no float quantile boundary exists (ties carry equal values, so
    tie order cannot move either sum); the three cents sums are exact
    BIGINTs and each share/ratio is ONE correctly-rounded IEEE
    division under ROUND + %.6f.

    Scale shape: one user-keyed fact aggregation, one global sort of
    the user-grain dimension (range-partitioned — the events_gini
    shape), a one-row broadcast back, one one-row rollup."""
    ut = user_cents_totals(_events(spark, sf)).localCheckpoint()
    return palma_rollup(ut)


# ------------------------------------------- Jonckheere-Terpstra test ----

def jonckheere_rollup(ut: DataFrame) -> DataFrame:
    """Fold the per-user cents totals into the one-row
    Jonckheere-Terpstra readout (ordered-alternative trend across the
    three user-hash exposure tiers) — shared by ``events_jonckheere``
    and its streaming twin. The doubled statistic 2J stays an exact
    BIGINT (ties contribute 1 per cross-tier pair, strict wins 2)."""
    vg = (
        ut.select((F.col("user_id") % 3).alias("grp"), "cents")
        .groupBy("cents")
        .agg(
            *[
                F.sum(F.when(F.col("grp") == g, 1).otherwise(0))
                .cast("long")
                .alias(f"c{g}")
                for g in range(3)
            ]
        )
    )
    w = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, -1
    )
    b = vg.select(
        *[F.col(f"c{g}") for g in range(3)],
        *[
            F.coalesce(F.sum(f"c{g}").over(w), F.lit(0))
            .cast("long")
            .alias(f"b{g}")
            for g in range(2)
        ],
    )
    c0, c1, c2 = (F.col(f"c{g}") for g in range(3))
    b0, b1 = F.col("b0"), F.col("b1")
    twoj_v = (
        c1 * (2 * b0 + c0) + c2 * (2 * b0 + c0) + c2 * (2 * b1 + c1)
    )
    a = b.agg(
        F.sum("c0").cast("long").alias("n0"),
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
        F.sum(twoj_v).cast("long").alias("two_j"),
    )
    n0, n1, n2 = (F.col(f"n{g}") for g in range(3))
    nn = n0 + n1 + n2
    dev4 = 2 * F.col("two_j") - (
        nn * nn - n0 * n0 - n1 * n1 - n2 * n2
    )
    var72 = (
        nn * nn * (2 * nn + 3)
        - n0 * n0 * (2 * n0 + 3)
        - n1 * n1 * (2 * n1 + 3)
        - n2 * n2 * (2 * n2 + 3)
    )
    return a.withColumn("var72", var72).filter(
        (F.col("var72") > 0) & (n0 > 0) & (n1 > 0) & (n2 > 0)
    ).select(
        "n0",
        "n1",
        "n2",
        "two_j",
        _FMT6(
            dev4.cast("double")
            / (
                F.lit(4.0)
                * F.sqrt(F.col("var72").cast("double") / F.lit(72.0))
            )
        ).alias("jt_z"),
    )


@register(
    "events_jonckheere",
    # Jonckheere-Terpstra ordered-alternative test across the three
    # user-hash tiers: the doubled statistic 2J is an exact BIGINT
    # accumulated from one ordered cumsum over the bounded cents grain
    # (strict cross-tier wins count 2, ties 1); E[J] and the
    # no-tie-correction null variance are exact integer polynomials,
    # and z is the fixed cast/div/sqrt/mul/div chain both engines pin.
    "WITH ut AS (SELECT user_id, "
    " CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS cents "
    " FROM events WHERE event_type = 'purchase' GROUP BY user_id), "
    "vg AS (SELECT cents, "
    " CAST(SUM(CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0, "
    " CAST(SUM(CASE WHEN user_id % 3 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1, "
    " CAST(SUM(CASE WHEN user_id % 3 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2 "
    " FROM ut GROUP BY cents), "
    "b AS (SELECT c0, c1, c2, "
    " CAST(COALESCE(SUM(c0) OVER (ORDER BY cents "
    "  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS b0, "
    " CAST(COALESCE(SUM(c1) OVER (ORDER BY cents "
    "  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS b1 "
    " FROM vg), "
    "a AS (SELECT CAST(SUM(c0) AS BIGINT) AS n0, "
    " CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2, "
    " CAST(SUM(c1 * (2 * b0 + c0) + c2 * (2 * b0 + c0) "
    "  + c2 * (2 * b1 + c1)) AS BIGINT) AS two_j FROM b) "
    "SELECT n0, n1, n2, two_j, "
    "printf('%.6f', ROUND(CAST(2 * two_j - ((n0 + n1 + n2) * (n0 + n1 + n2) "
    "  - n0 * n0 - n1 * n1 - n2 * n2) AS DOUBLE) "
    " / (4.0 * sqrt(CAST((n0 + n1 + n2) * (n0 + n1 + n2) "
    "  * (2 * (n0 + n1 + n2) + 3) - n0 * n0 * (2 * n0 + 3) "
    "  - n1 * n1 * (2 * n1 + 3) - n2 * n2 * (2 * n2 + 3) AS DOUBLE) "
    "  / 72.0)), 6)) AS jt_z "
    "FROM a WHERE (n0 + n1 + n2) * (n0 + n1 + n2) "
    " * (2 * (n0 + n1 + n2) + 3) - n0 * n0 * (2 * n0 + 3) "
    " - n1 * n1 * (2 * n1 + 3) - n2 * n2 * (2 * n2 + 3) > 0 "
    " AND n0 > 0 AND n1 > 0 AND n2 > 0",
)
def events_jonckheere(spark, sf):
    """Jonckheere-Terpstra trend test for per-user purchase spend
    across the three user-hash exposure tiers — the ORDERED-alternative
    companion to ``events_kruskal`` (Kruskal-Wallis asks 'do the k
    groups differ at all?'; J-T asks the dose-response question an
    experiment with graded exposures actually poses: 'does spend rise
    WITH the tier?', gaining power by spending it on the ordering).

    Float discipline: the doubled statistic 2J is an exact BIGINT — a
    single ordered cumulative sum over the bounded distinct-cents
    grain counts every cross-tier pair once (strict wins contribute 2,
    ties 1 — the doubled-midrank trick in pair form); 4(J - E[J]) and
    the classic no-tie-correction null variance (times 72) are exact
    integer polynomials in the tier sizes, so the z-score is the fixed
    cast / divide-by-72 / sqrt / multiply / divide chain IEEE pins
    bit-identically on both engines under ROUND + %.6f. (The
    tie-corrected variance is deliberately not used; ties here are
    sparse cents collisions and the classic statistic is the
    documented contract.)

    Scale shape: one user-keyed fact aggregation, one bounded
    cents-grain pivot (map-side combinable), ONE ordered cumulative
    sum over that dimension-sized grain (the events_cliff_delta
    single-partition window — bounded by distinct amounts, never by
    facts), one one-row rollup."""
    ut = user_cents_totals(_events(spark, sf)).localCheckpoint()
    return jonckheere_rollup(ut)


# ------------------------------------------------- Mood's median test ----

def moods_rollup(ut: DataFrame) -> DataFrame:
    """Fold the per-user cents totals into the one-row Mood's-median
    readout (2x3 above/at-or-below contingency + chi-squared) — shared
    by ``events_moods_median`` and its streaming twin."""
    w = Window.orderBy("cents", "user_id")
    r = ut.select(
        "user_id", "cents", F.row_number().over(w).cast("long").alias("i")
    )
    g = r.agg(F.count(F.lit(1)).cast("long").alias("n"))
    med = (
        r.join(F.broadcast(g))
        .filter(F.col("i") == F.expr("(n + 1) div 2"))
        .select(F.col("cents").alias("med_cents"))
    )
    cells = (
        ut.join(F.broadcast(med))
        .select(
            (F.col("user_id") % 3).alias("grp"),
            (F.col("cents") > F.col("med_cents")).alias("above"),
            "med_cents",
        )
        .agg(
            F.min("med_cents").cast("long").alias("median_cents"),
            *[
                F.sum(
                    F.when(
                        (F.col("grp") == g_) & (F.col("above") == ab),
                        1,
                    ).otherwise(0)
                )
                .cast("long")
                .alias(f"{'a' if ab else 'b'}{g_}")
                for ab in (True, False)
                for g_ in range(3)
            ],
        )
    )
    a0, a1, a2 = (F.col(f"a{g_}") for g_ in range(3))
    b0, b1, b2 = (F.col(f"b{g_}") for g_ in range(3))
    ra, rb = a0 + a1 + a2, b0 + b1 + b2
    nn = ra + rb
    cols = [a0 + b0, a1 + b1, a2 + b2]

    def term(o, rr, cc):
        num = (o * nn - rr * cc).cast("decimal(38,0)")
        return (num * num).cast("double") / (nn * rr * cc).cast("double")

    chi2 = (
        term(a0, ra, cols[0])
        + term(a1, ra, cols[1])
        + term(a2, ra, cols[2])
        + term(b0, rb, cols[0])
        + term(b1, rb, cols[1])
        + term(b2, rb, cols[2])
    )
    return cells.filter(
        (ra > 0)
        & (rb > 0)
        & (cols[0] > 0)
        & (cols[1] > 0)
        & (cols[2] > 0)
    ).select(
        "median_cents",
        "a0",
        "a1",
        "a2",
        "b0",
        "b1",
        "b2",
        _FMT6(chi2).alias("chi2"),
    )


@register(
    "events_moods_median",
    # Mood's median test across the three user-hash tiers: the grand
    # lower median comes from integer rank selection (i = (n+1)//2 —
    # never a float quantile), the 2x3 above/at-or-below cells are
    # exact BIGINTs, and the chi-squared statistic keeps every
    # (O*N - r*c)^2 numerator exact in HUGEINT/DECIMAL(38,0) with ONE
    # division per cell summed in a fixed left-associated six-term
    # chain — the events_chi2 discipline on a median split.
    "WITH ut AS (SELECT user_id, "
    " CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS cents "
    " FROM events WHERE event_type = 'purchase' GROUP BY user_id), "
    "r AS (SELECT user_id, cents, CAST(ROW_NUMBER() OVER "
    " (ORDER BY cents, user_id) AS BIGINT) AS i FROM ut), "
    "g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM r), "
    "med AS (SELECT cents AS med_cents FROM r, g "
    " WHERE i = (n + 1) // 2), "
    "cells AS (SELECT MIN(med_cents) AS median_cents, "
    " CAST(SUM(CASE WHEN user_id % 3 = 0 AND cents > med_cents "
    "  THEN 1 ELSE 0 END) AS BIGINT) AS a0, "
    " CAST(SUM(CASE WHEN user_id % 3 = 1 AND cents > med_cents "
    "  THEN 1 ELSE 0 END) AS BIGINT) AS a1, "
    " CAST(SUM(CASE WHEN user_id % 3 = 2 AND cents > med_cents "
    "  THEN 1 ELSE 0 END) AS BIGINT) AS a2, "
    " CAST(SUM(CASE WHEN user_id % 3 = 0 AND cents <= med_cents "
    "  THEN 1 ELSE 0 END) AS BIGINT) AS b0, "
    " CAST(SUM(CASE WHEN user_id % 3 = 1 AND cents <= med_cents "
    "  THEN 1 ELSE 0 END) AS BIGINT) AS b1, "
    " CAST(SUM(CASE WHEN user_id % 3 = 2 AND cents <= med_cents "
    "  THEN 1 ELSE 0 END) AS BIGINT) AS b2 FROM ut, med) "
    "SELECT CAST(median_cents AS BIGINT) AS median_cents, "
    "a0, a1, a2, b0, b1, b2, "
    "printf('%.6f', ROUND("
    " CAST(CAST(a0 * (a0+a1+a2+b0+b1+b2) - (a0+a1+a2) * (a0+b0) "
    "   AS HUGEINT) * (a0 * (a0+a1+a2+b0+b1+b2) - (a0+a1+a2) * (a0+b0)) "
    "   AS DOUBLE) / CAST((a0+a1+a2+b0+b1+b2) * (a0+a1+a2) * (a0+b0) "
    "   AS DOUBLE) "
    " + CAST(CAST(a1 * (a0+a1+a2+b0+b1+b2) - (a0+a1+a2) * (a1+b1) "
    "   AS HUGEINT) * (a1 * (a0+a1+a2+b0+b1+b2) - (a0+a1+a2) * (a1+b1)) "
    "   AS DOUBLE) / CAST((a0+a1+a2+b0+b1+b2) * (a0+a1+a2) * (a1+b1) "
    "   AS DOUBLE) "
    " + CAST(CAST(a2 * (a0+a1+a2+b0+b1+b2) - (a0+a1+a2) * (a2+b2) "
    "   AS HUGEINT) * (a2 * (a0+a1+a2+b0+b1+b2) - (a0+a1+a2) * (a2+b2)) "
    "   AS DOUBLE) / CAST((a0+a1+a2+b0+b1+b2) * (a0+a1+a2) * (a2+b2) "
    "   AS DOUBLE) "
    " + CAST(CAST(b0 * (a0+a1+a2+b0+b1+b2) - (b0+b1+b2) * (a0+b0) "
    "   AS HUGEINT) * (b0 * (a0+a1+a2+b0+b1+b2) - (b0+b1+b2) * (a0+b0)) "
    "   AS DOUBLE) / CAST((a0+a1+a2+b0+b1+b2) * (b0+b1+b2) * (a0+b0) "
    "   AS DOUBLE) "
    " + CAST(CAST(b1 * (a0+a1+a2+b0+b1+b2) - (b0+b1+b2) * (a1+b1) "
    "   AS HUGEINT) * (b1 * (a0+a1+a2+b0+b1+b2) - (b0+b1+b2) * (a1+b1)) "
    "   AS DOUBLE) / CAST((a0+a1+a2+b0+b1+b2) * (b0+b1+b2) * (a1+b1) "
    "   AS DOUBLE) "
    " + CAST(CAST(b2 * (a0+a1+a2+b0+b1+b2) - (b0+b1+b2) * (a2+b2) "
    "   AS HUGEINT) * (b2 * (a0+a1+a2+b0+b1+b2) - (b0+b1+b2) * (a2+b2)) "
    "   AS DOUBLE) / CAST((a0+a1+a2+b0+b1+b2) * (b0+b1+b2) * (a2+b2) "
    "   AS DOUBLE), 6)) AS chi2 "
    "FROM cells WHERE a0 + a1 + a2 > 0 AND b0 + b1 + b2 > 0 "
    " AND a0 + b0 > 0 AND a1 + b1 > 0 AND a2 + b2 > 0",
)
def events_moods_median(spark, sf):
    """Mood's median test for per-user purchase spend across the three
    user-hash exposure tiers — the maximally outlier-robust k-sample
    location test (it reduces every observation to one bit: above the
    grand median or not), the coarse companion to ``events_kruskal``'s
    rank test and ``events_jonckheere``'s ordered one. The 2x3
    contingency table it builds is also the readout an analyst sanity-
    checks tier balance with.

    Float discipline: the grand LOWER median is integer rank selection
    (i = (n+1) div 2 under the total (cents, user_id) order — the
    events_theil_sen discipline; integer `div`, never Spark's
    float-producing `/`), so no interpolation formula ever runs; the
    six cells and all margins are exact BIGINTs; each chi-squared term
    keeps its (O*N - r*c)^2 numerator exact in DECIMAL(38,0) on Spark
    and HUGEINT on DuckDB (O*N overflows BIGINT after squaring at
    corpus scale — the events_chi2 lesson) over ONE division, and the
    six terms are summed in a fixed left-associated chain, never an
    unordered SUM over cells.

    Scale shape: one user-keyed fact aggregation, one global sort of
    the user-grain dimension for the rank selection (range-
    partitioned), a one-row broadcast median joined back, one one-row
    rollup."""
    ut = user_cents_totals(_events(spark, sf)).localCheckpoint()
    return moods_rollup(ut)


# ------------------------------------------- inequality report macro ----

def inequality_report_rollup(ut: DataFrame) -> DataFrame:
    """Compose the three inequality rollups (Gini, Hoover/MAD/CV,
    Palma) over ONE per-user cents grain into a one-row report —
    shared by ``macro_inequality_report`` and its streaming twin.
    Each float contract lives in its own rollup; this joins the
    one-row readouts (the macro_daily_health composition
    discipline)."""
    g = gini_rollup(ut)
    h = hoover_rollup(ut).drop("n_users", "total_cents")
    p = palma_rollup(ut).drop("n_users", "total_cents")
    return g.crossJoin(h).crossJoin(p).select(
        "n_users",
        "total_cents",
        "gini",
        "hoover",
        "mad_mean",
        "cv",
        "bottom40_cents",
        "top10_cents",
        "bottom40_share",
        "top10_share",
        "palma_ratio",
    )


@register(
    "macro_inequality_report",
    # The full spend-inequality profile in ONE row: Gini + Hoover/MAD/
    # CV + Palma composed over the SAME per-user cents grain — the
    # oracle composes all three per-key contracts in one WITH chain,
    # pinning the COMPOSITION, not just the parts.
    "WITH ut AS (SELECT user_id, "
    " CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS cents "
    " FROM events WHERE event_type = 'purchase' GROUP BY user_id), "
    "r AS (SELECT cents, CAST(ROW_NUMBER() OVER (ORDER BY cents, user_id) "
    " AS BIGINT) AS i FROM ut), "
    "g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users, "
    " CAST(SUM(cents) AS BIGINT) AS total_cents, "
    " CAST(SUM(i * cents) AS BIGINT) AS wsum FROM r), "
    "hm AS (SELECT MIN(n_users) AS n, MIN(total_cents) AS s, "
    " SUM(CAST(cents AS HUGEINT) * cents) AS q, "
    " CAST(SUM(ABS(n_users * cents - total_cents)) AS BIGINT) AS adev "
    " FROM ut, g), "
    "pa AS (SELECT "
    " CAST(SUM(CASE WHEN i * 5 <= n_users * 2 THEN cents ELSE 0 END) "
    "  AS BIGINT) AS bottom40_cents, "
    " CAST(SUM(CASE WHEN i * 10 > n_users * 9 THEN cents ELSE 0 END) "
    "  AS BIGINT) AS top10_cents FROM r, g) "
    "SELECT g.n_users, g.total_cents, "
    "printf('%.6f', ROUND(CAST(2 * g.wsum - (g.n_users + 1) * g.total_cents "
    " AS DOUBLE) / CAST(g.n_users * g.total_cents AS DOUBLE), 6)) AS gini, "
    "printf('%.6f', ROUND(CAST(hm.adev AS DOUBLE) "
    " / CAST(2 * hm.n * hm.s AS DOUBLE), 6)) AS hoover, "
    "printf('%.6f', ROUND(CAST(hm.adev AS DOUBLE) "
    " / CAST(hm.n * hm.n AS DOUBLE), 6)) AS mad_mean, "
    "printf('%.6f', ROUND(sqrt(CAST(CAST(hm.n AS HUGEINT) * hm.q "
    "  - CAST(hm.s AS HUGEINT) * hm.s AS DOUBLE)) "
    "  / CAST(hm.s AS DOUBLE), 6)) AS cv, "
    "pa.bottom40_cents, pa.top10_cents, "
    "printf('%.6f', ROUND(CAST(pa.bottom40_cents AS DOUBLE) "
    " / CAST(g.total_cents AS DOUBLE), 6)) AS bottom40_share, "
    "printf('%.6f', ROUND(CAST(pa.top10_cents AS DOUBLE) "
    " / CAST(g.total_cents AS DOUBLE), 6)) AS top10_share, "
    "printf('%.6f', ROUND(CAST(pa.top10_cents AS DOUBLE) "
    " / CAST(pa.bottom40_cents AS DOUBLE), 6)) AS palma_ratio "
    "FROM g, hm, pa "
    "WHERE g.total_cents > 0 AND g.n_users > 1 AND pa.bottom40_cents > 0",
)
def macro_inequality_report(spark, sf):
    """The whole spend-inequality profile as ONE query: Gini + Hoover/
    MAD/CV + Palma over the SAME checkpointed per-user cents grain —
    the one-row dashboard a revenue team reads weekly, and the
    composition key that proves the three per-metric contracts agree
    when derived from one shared scan (pytest reconciles every column
    against the standalone keys — the macro_series_profile
    discipline).

    Float discipline: inherited wholesale from the three composed
    rollups (each documented at its per-key); the oracle re-states
    the ENTIRE composition in one WITH chain so the driver pins the
    composed plan, not just the parts.

    Scale shape: the fact table is touched ONCE (the shared user-grain
    aggregation, localCheckpoint'ed); the three rollups then read that
    dimension-scale grain — one global rank sort shared by Gini/Palma
    via the checkpoint, one-row joins to finish. At 100 TB the only
    fact-scale cost is the one purchase scan."""
    ut = user_cents_totals(_events(spark, sf)).localCheckpoint()
    return inequality_report_rollup(ut)


# ------------------------------------------------------ Grubbs test ----

def grubbs_rollup(ut: DataFrame) -> DataFrame:
    """Fold the per-user cents totals into the one-row Grubbs
    max-outlier readout — shared by ``events_grubbs`` and its
    streaming twin."""
    g = ut.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum((F.col("cents") * F.col("cents")).cast("decimal(38,0)"))
        .alias("q"),
    )
    j = ut.join(F.broadcast(g)).withColumn(
        "dev", F.abs(F.col("n") * F.col("cents") - F.col("s"))
    )
    mx = j.agg(
        F.min("n").cast("long").alias("n_users"),
        F.min("s").cast("long").alias("total_cents"),
        F.min("q").alias("q"),
        F.max("dev").cast("long").alias("maxdev"),
    )
    arg = (
        j.join(
            F.broadcast(
                mx.select(F.col("maxdev").alias("md"))
            )
        )
        .filter(F.col("dev") == F.col("md"))
        .agg(
            F.min("user_id").cast("long").alias("outlier_user"),
            F.min("cents").cast("long").alias("outlier_cents"),
        )
    )
    n, s, q = F.col("n_users"), F.col("total_cents"), F.col("q")
    ss = (
        n.cast("decimal(38,0)") * q
        - s.cast("decimal(38,0)") * s.cast("decimal(38,0)")
    )
    gstat = F.col("maxdev").cast("double") / (
        n.cast("double")
        * F.sqrt(ss.cast("double") / (n * (n - 1)).cast("double"))
    )
    return (
        mx.crossJoin(arg)
        .filter((n > 1) & (F.col("maxdev") > 0))
        .select(
            "n_users",
            "outlier_user",
            "outlier_cents",
            "maxdev",
            _FMT6(gstat).alias("grubbs_g"),
        )
    )


@register(
    "events_grubbs",
    # Grubbs max-outlier statistic on per-user purchase spend: the
    # scaled deviations |n*x_i - S| are exact BIGINTs so the argmax is
    # an integer selection (ties -> min user_id); the sum of squares
    # n*q - S^2 stays exact in HUGEINT/DECIMAL(38,0); G divides the
    # exact max deviation by n * the sample sd in one fixed
    # div/sqrt/mul chain spelled identically on both engines.
    "WITH ut AS (SELECT user_id, "
    " CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS cents "
    " FROM events WHERE event_type = 'purchase' GROUP BY user_id), "
    "g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
    " CAST(SUM(cents) AS BIGINT) AS s, "
    " SUM(CAST(cents AS HUGEINT) * cents) AS q FROM ut), "
    "j AS (SELECT user_id, cents, ABS(n * cents - s) AS dev FROM ut, g), "
    "mx AS (SELECT MIN(n) AS n_users, MIN(s) AS total_cents, MIN(q) AS q, "
    " CAST(MAX(dev) AS BIGINT) AS maxdev FROM j, g), "
    "arg AS (SELECT CAST(MIN(user_id) AS BIGINT) AS outlier_user, "
    " CAST(MIN(cents) AS BIGINT) AS outlier_cents "
    " FROM j, mx WHERE dev = maxdev) "
    "SELECT CAST(n_users AS BIGINT) AS n_users, outlier_user, "
    "outlier_cents, maxdev, "
    "printf('%.6f', ROUND(CAST(maxdev AS DOUBLE) "
    " / (CAST(n_users AS DOUBLE) "
    "  * sqrt(CAST(CAST(n_users AS HUGEINT) * q "
    "   - CAST(total_cents AS HUGEINT) * total_cents AS DOUBLE) "
    "   / CAST(n_users * (n_users - 1) AS DOUBLE))), 6)) AS grubbs_g "
    "FROM mx, arg WHERE n_users > 1 AND maxdev > 0",
)
def events_grubbs(spark, sf):
    """Grubbs max-outlier statistic for per-user purchase spend — the
    single-most-extreme-observation test (who is the whale, and HOW
    extreme in sd units?), the targeted companion to
    ``events_outlier_mad``'s robust per-observation flags and
    ``events_tukey_fences``'s fence counts. G = max|x - mean| / s is
    the statistic; the critical value needs a t-quantile, so the key
    reports G and the identified user and leaves the cut to the
    consumer (the no-transcendentals rule).

    Float discipline: scaled deviations |n*x_i - S| are exact BIGINTs
    (the events_outlier_mad trick), so the max and its argmax are
    integer selections (tie -> min user_id, deterministic); the sum of
    squares stays exact in DECIMAL(38,0)/HUGEINT; G is ONE fixed
    cast/div/sqrt/mul/div chain — sqrt the only transcendental,
    IEEE-pinned — under ROUND + %.6f.

    Scale shape: one user-keyed fact aggregation, one-row broadcasts
    back for the deviation and argmax passes, one one-row rollup —
    facts touched once, never sorted."""
    ut = user_cents_totals(_events(spark, sf)).localCheckpoint()
    return grubbs_rollup(ut)


# --------------------------------------------------- trimmed mean ----

def trimmed_rollup(g: DataFrame) -> DataFrame:
    """Fold the (cents, cnt) purchase-amount grain into the one-row
    10%-trimmed-mean readout — shared by ``events_trimmed_mean`` and
    its streaming twin. The retained mass per value is an exact
    integer interval overlap, so the whole contract is integers until
    one division."""
    w = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cu = g.select(
        "cents",
        "cnt",
        F.sum("cnt").over(w).cast("long").alias("cum"),
    )
    t = g.agg(F.sum("cnt").cast("long").alias("n"))
    j = cu.join(F.broadcast(t)).withColumn(
        "k", F.expr("n div 10")
    )
    kept = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("cum"), F.col("n") - F.col("k"))
        - F.greatest(F.col("cum") - F.col("cnt"), F.col("k")),
    )
    a = j.agg(
        F.min("n").alias("n"),
        F.min("k").alias("k_trimmed"),
        F.sum(kept).cast("long").alias("kept_n"),
        F.sum(kept * F.col("cents")).cast("long").alias("kept_cents"),
    )
    return a.filter(F.col("kept_n") > 0).select(
        F.col("n").cast("long").alias("n"),
        F.col("k_trimmed").cast("long").alias("k_trimmed"),
        "kept_n",
        "kept_cents",
        _FMT6(
            F.col("kept_cents").cast("double")
            / F.col("kept_n").cast("double")
        ).alias("trimmed_mean_cents"),
    )


@register(
    "events_trimmed_mean",
    # 10% two-sided TRIMMED mean of purchase cents (drop the k = n//10
    # smallest and largest observations, average the rest) — the
    # retained count per distinct value is the exact integer interval
    # overlap min(cum, n-k) - max(cum-cnt, k) clamped at 0, so the
    # numerator and denominator are exact BIGINTs and the mean is ONE
    # IEEE division.
    "WITH c AS (SELECT CAST(FLOOR(value * 100) AS BIGINT) AS cents "
    " FROM events WHERE event_type = 'purchase'), "
    "g AS (SELECT cents, CAST(COUNT(*) AS BIGINT) AS cnt FROM c "
    " GROUP BY cents), "
    "cu AS (SELECT cents, cnt, CAST(SUM(cnt) OVER (ORDER BY cents "
    " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum "
    " FROM g), "
    "t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n, "
    " CAST(SUM(cnt) // 10 AS BIGINT) AS k FROM g), "
    "a AS (SELECT MIN(n) AS n, MIN(k) AS k_trimmed, "
    " CAST(SUM(GREATEST(0, LEAST(cum, n - k) "
    "  - GREATEST(cum - cnt, k))) AS BIGINT) AS kept_n, "
    " CAST(SUM(GREATEST(0, LEAST(cum, n - k) "
    "  - GREATEST(cum - cnt, k)) * cents) AS BIGINT) AS kept_cents "
    " FROM cu, t) "
    "SELECT CAST(n AS BIGINT) AS n, CAST(k_trimmed AS BIGINT) AS k_trimmed, "
    "kept_n, kept_cents, "
    "printf('%.6f', ROUND(CAST(kept_cents AS DOUBLE) "
    " / CAST(kept_n AS DOUBLE), 6)) AS trimmed_mean_cents "
    "FROM a WHERE kept_n > 0",
)
def events_trimmed_mean(spark, sf):
    """10% two-sided trimmed mean of purchase amounts — the
    DROP-the-tails robust location estimate next to
    ``events_winsorized_mean``'s CLAMP-the-tails one (the two disagree
    exactly when the tails are asymmetric, which is why a robust
    report quotes both) and ``agg_median``'s 50% extreme.

    Float discipline: with the bounded (cents, cnt) grain under one
    ordered cumulative sum, the retained count per distinct value is
    the exact integer interval overlap min(cum, n-k) - max(cum-cnt, k)
    clamped at zero (k = n div 10 — integer `div`, the events_theil_sen
    lesson), so kept_n and kept_cents are exact BIGINTs and the mean
    is ONE correctly-rounded IEEE division under ROUND + %.6f. No
    rank interpolation formula ever runs.

    Scale shape: one map-side-combinable fact collapse to the bounded
    cents grain, ONE ordered cumulative sum over that dimension-sized
    grain (the events_deciles single-partition window — bounded by
    distinct amounts, never by facts), one one-row rollup."""
    g = purchase_cents_counts(_events(spark, sf)).localCheckpoint()
    return trimmed_rollup(g)


# ------------------------------------------------- cohort LTV curve ----

def cohort_ltv_rollup(uw: DataFrame, spend: DataFrame) -> DataFrame:
    """Fold the per-user first-week table and the (user, week, cents)
    spend grain into the cumulative LTV-per-user curve — shared by
    ``events_cohort_ltv`` and its streaming twin. ``uw`` is the
    (user_id, wk) deduped activity grain; ``spend`` is (user_id, wk,
    cents) purchase totals — both exactly mergeable."""
    first = uw.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    sizes = first.groupBy("cohort_wk").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_users")
    )
    aged = (
        spend.join(first, "user_id")
        .select(
            "cohort_wk",
            (F.col("wk") - F.col("cohort_wk")).alias("age_weeks"),
            "cents",
        )
        .groupBy("cohort_wk", "age_weeks")
        .agg(F.sum("cents").cast("long").alias("wk_cents"))
    )
    w = (
        Window.partitionBy("cohort_wk")
        .orderBy("age_weeks")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = aged.select(
        "cohort_wk",
        "age_weeks",
        "wk_cents",
        F.sum("wk_cents").over(w).cast("long").alias("cum_cents"),
    )
    return cum.join(F.broadcast(sizes), "cohort_wk").select(
        "cohort_wk",
        "age_weeks",
        "cohort_users",
        "wk_cents",
        "cum_cents",
        _FMT6(
            F.col("cum_cents").cast("double")
            / F.col("cohort_users").cast("double")
        ).alias("ltv_cents_per_user"),
    )


@register(
    "events_cohort_ltv",
    # Weekly-cohort cumulative-revenue (LTV) curve: cohort = a user's
    # first epoch-week (the events_lifecycle week spelling), age =
    # spend week - cohort week; weekly and cumulative cents are exact
    # BIGINTs (the cumsum runs over the bounded (cohort, age) grain)
    # and LTV-per-user is ONE IEEE division per row.
    "WITH d AS (SELECT DISTINCT user_id, "
    "  CAST((dn - (dn % 7)) / 7 AS BIGINT) AS wk FROM ("
    "   SELECT user_id, date_diff('day', DATE '1970-01-01', "
    "    CAST(ts AS DATE)) AS dn FROM events)), "
    "f AS (SELECT user_id, MIN(wk) AS cohort_wk FROM d GROUP BY user_id), "
    "sz AS (SELECT cohort_wk, CAST(COUNT(*) AS BIGINT) AS cohort_users "
    " FROM f GROUP BY cohort_wk), "
    "sp AS (SELECT user_id, CAST((dn - (dn % 7)) / 7 AS BIGINT) AS wk, "
    "  CAST(SUM(cents) AS BIGINT) AS cents FROM ("
    "   SELECT user_id, date_diff('day', DATE '1970-01-01', "
    "    CAST(ts AS DATE)) AS dn, "
    "    CAST(FLOOR(value * 100) AS BIGINT) AS cents "
    "   FROM events WHERE event_type = 'purchase') GROUP BY 1, 2), "
    "aged AS (SELECT f.cohort_wk, sp.wk - f.cohort_wk AS age_weeks, "
    "  CAST(SUM(sp.cents) AS BIGINT) AS wk_cents "
    " FROM sp JOIN f ON f.user_id = sp.user_id GROUP BY 1, 2), "
    "cum AS (SELECT cohort_wk, age_weeks, wk_cents, "
    "  CAST(SUM(wk_cents) OVER (PARTITION BY cohort_wk ORDER BY age_weeks "
    "   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
    "  AS cum_cents FROM aged) "
    "SELECT cum.cohort_wk, age_weeks, cohort_users, wk_cents, cum_cents, "
    "printf('%.6f', ROUND(CAST(cum_cents AS DOUBLE) "
    " / CAST(cohort_users AS DOUBLE), 6)) AS ltv_cents_per_user "
    "FROM cum JOIN sz ON sz.cohort_wk = cum.cohort_wk",
)
def events_cohort_ltv(spark, sf):
    """Weekly-cohort cumulative-revenue (LTV) curve — the MONEY
    companion to ``retention_cohort``'s headcount triangle: per
    acquisition cohort (a user's first epoch-week, the
    events_lifecycle spelling) and week-of-life, the cumulative
    purchase cents and the per-user LTV — the curve every
    payback-period and CAC decision reads off. Cohorts whose curves
    flatten early are the churn signal ``events_lifecycle`` counts;
    here it is priced.

    Float discipline: weeks are exact integer epoch-week numbers;
    weekly and cumulative cents are exact BIGINTs (the cumulative sum
    is an ordered window over the BOUNDED (cohort, age) grain — weeks
    x weeks, dimension-scale); LTV-per-user is ONE correctly-rounded
    IEEE division per row under ROUND + %.6f.

    Scale shape: two user-keyed fact aggregations (first-week and
    spend — both map-side combinable and exactly mergeable, which is
    what the streaming twin carries), one broadcast of the tiny
    cohort-size table, one window over the bounded cohort-age grain —
    facts never sorted."""
    e = _events(spark, sf)
    uw = user_weeks(e).localCheckpoint()
    spend = user_week_spend(e).localCheckpoint()
    return cohort_ltv_rollup(uw, spend)


def user_week_spend(df: DataFrame) -> DataFrame:
    """Per-(user, epoch-week) purchase cents — the spend half of the
    cohort-LTV state; a plain SUM, exactly mergeable across
    micro-batches (the user_weeks week spelling)."""
    dn = F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01"))
    return (
        df.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            ((dn - dn % 7) / 7).cast("long").alias("wk"),
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("user_id", "wk")
        .agg(F.sum("cents").cast("long").alias("cents"))
    )


# ---------------------------------------------- Durbin-Watson statistic ---

def dw_rollup(dt: DataFrame) -> DataFrame:
    """Fold a (day, cnt) daily-totals grain into the one-row
    Durbin-Watson readout — shared by ``events_durbin_watson`` and its
    streaming twin. The mean-centering scale factor cancels between
    numerator and denominator, so DW = n*sum((c_t - c_{t-1})^2) /
    (n*sum(c^2) - S^2) is a ratio of two exact DECIMAL(38,0)/HUGEINT
    integers and ONE IEEE division."""
    w = Window.orderBy("day")
    lagged = dt.select("cnt", F.lag("cnt").over(w).alias("prev"))
    diff = F.col("cnt") - F.col("prev")
    m = lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("cnt").cast("decimal(38,0)")).alias("s"),
        F.sum(F.col("cnt").cast("decimal(38,0)") * F.col("cnt")).alias(
            "sxx"
        ),
        F.sum(
            F.when(
                F.col("prev").isNotNull(),
                diff.cast("decimal(38,0)") * diff,
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("sdd"),
    )
    den = F.col("n") * F.col("sxx") - F.col("s") * F.col("s")
    num = F.col("n") * F.col("sdd")
    return m.filter(den > 0).select(
        F.col("n").alias("n_days"),
        _FMT6(num.cast("double") / den.cast("double")).alias("dw"),
        (2 * den > num).alias("positive_autocorr"),
    )


@register(
    "events_durbin_watson",
    # Durbin-Watson serial-correlation statistic of the daily
    # total-volume series: DW = sum of squared adjacent differences
    # over the centered sum of squares. Mean-centering is eliminated
    # algebraically (differences cancel the mean; the denominator
    # expands to (n*sum(c^2) - S^2)/n), so both sides of the ratio are
    # exact HUGEINT/DECIMAL(38,0) integers and DW is ONE IEEE division;
    # the dw < 2 positive-autocorrelation flag is decided by an exact
    # integer cross-multiply, never by the float.
    "WITH dt AS (SELECT strftime(ts, '%Y-%m-%d') AS day, "
    " CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1), "
    "l AS (SELECT cnt, LAG(cnt) OVER (ORDER BY day) AS prev FROM dt), "
    "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
    "  CAST(SUM(CAST(cnt AS HUGEINT)) AS HUGEINT) AS s, "
    "  CAST(SUM(CAST(cnt AS HUGEINT) * cnt) AS HUGEINT) AS sxx, "
    "  CAST(SUM(CASE WHEN prev IS NOT NULL THEN "
    "   CAST(cnt - prev AS HUGEINT) * (cnt - prev) ELSE 0 END) "
    "   AS HUGEINT) AS sdd FROM l) "
    "SELECT n AS n_days, "
    "printf('%.6f', ROUND(CAST(n * sdd AS DOUBLE) "
    " / CAST(n * sxx - s * s AS DOUBLE), 6)) AS dw, "
    "(2 * (n * sxx - s * s) > n * sdd) AS positive_autocorr "
    "FROM m WHERE n * sxx - s * s > 0",
)
def events_durbin_watson(spark, sf):
    """Durbin-Watson statistic of the daily total-volume series — the
    regression-residual serial-correlation diagnostic (DW near 2 =
    independent days, DW < 2 = positive autocorrelation / momentum,
    DW > 2 = alternation), complementing ``events_autocorr``'s per-type
    lag-1 ACF and ``events_runs_test``'s sign-based randomness check
    with the classic econometric readout over the same grain.

    Float discipline: deviations never materialize — the mean cancels
    in adjacent differences and expands out of the denominator, so
    numerator (n * sum of squared diffs) and denominator (n * sum of
    squares - S^2) are BOTH exact DECIMAL(38,0)/HUGEINT integers; DW
    is ONE correctly-rounded IEEE division under ROUND + %.6f, and the
    autocorrelation flag is an exact integer cross-multiplication.

    Scale shape: one map-side-combinable fact collapse to the daily
    grain (shared ``day_totals``), one lag window plus one one-row
    aggregate over that dimension-sized table — facts touched once,
    never sorted."""
    return dw_rollup(day_totals(_events(spark, sf)))


# ---------------------------------------- Hellinger distribution distance --

def _hellinger_sql() -> str:
    """Build the events_hellinger oracle: per-weekday purchase/click
    cells via one conditional-aggregation scan, then the 7-term
    left-associated sqrt chain — every sqrt input is an exact integer
    cast to double, so each term is ONE correctly-rounded IEEE sqrt
    and the chain order matches the Spark reduce exactly."""
    cells = ", ".join(
        f"CAST(SUM(CASE WHEN dow = {d} AND event_type = 'purchase' "
        f"THEN 1 ELSE 0 END) AS BIGINT) AS a{d}, "
        f"CAST(SUM(CASE WHEN dow = {d} AND event_type = 'click' "
        f"THEN 1 ELSE 0 END) AS BIGINT) AS b{d}"
        for d in range(7)
    )
    chain = " + ".join(f"SQRT(CAST(a{d} * b{d} AS DOUBLE))" for d in range(7))
    ta = " + ".join(f"a{d}" for d in range(7))
    tb = " + ".join(f"b{d}" for d in range(7))
    return (
        "WITH e AS (SELECT CAST(DATEDIFF('day', DATE '2024-01-01', "
        " CAST(ts AS DATE)) % 7 AS BIGINT) AS dow, event_type FROM events "
        " WHERE event_type IN ('purchase', 'click')), "
        f"o AS (SELECT {cells} FROM e), "
        f"t AS (SELECT *, {ta} AS ta, {tb} AS tb, "
        f" ({chain}) / SQRT(CAST(ta * tb AS DOUBLE)) AS bc FROM o) "
        "SELECT ta AS n_purchase, tb AS n_click, "
        "printf('%.6f', ROUND(bc, 6)) AS bhattacharyya, "
        "printf('%.6f', ROUND(SQRT(GREATEST(CAST(0 AS DOUBLE), "
        " CAST(1 AS DOUBLE) - bc)), 6)) AS hellinger "
        "FROM t WHERE ta > 0 AND tb > 0"
    )


def dow_marginals(cells: DataFrame) -> DataFrame:
    """Pivot a (dow, event_type, cnt) contingency grain into ONE wide
    row of exact BIGINT weekday marginals — a0..a6 (purchase),
    b0..b6 (click) plus the ta/tb totals — the shared front half of
    every purchase-vs-click distribution-distance readout
    (``events_hellinger``, ``events_tv_distance``,
    ``events_wasserstein`` and their streaming twins)."""
    import functools
    import operator

    aggs = []
    for d in range(7):
        for t, col in (("purchase", "a"), ("click", "b")):
            aggs.append(
                F.sum(
                    F.when(
                        (F.col("dow") == d) & (F.col("event_type") == t),
                        F.col("cnt"),
                    ).otherwise(0)
                )
                .cast("long")
                .alias(f"{col}{d}")
            )
    o = cells.agg(*aggs)
    return o.select(
        "*",
        functools.reduce(
            operator.add, [F.col(f"a{d}") for d in range(7)]
        ).alias("ta"),
        functools.reduce(
            operator.add, [F.col(f"b{d}") for d in range(7)]
        ).alias("tb"),
    )


def hellinger_rollup(cells: DataFrame) -> DataFrame:
    """Fold a (dow, event_type, cnt) contingency grain into the one-row
    Bhattacharyya/Hellinger readout between the purchase and click
    weekday distributions — shared by ``events_hellinger`` and its
    streaming twin (same sum-mergeable cells as ``cramers_rollup``)."""
    import functools
    import operator

    o = dow_marginals(cells)
    chain = functools.reduce(
        operator.add,
        [
            F.sqrt((F.col(f"a{d}") * F.col(f"b{d}")).cast("double"))
            for d in range(7)
        ],
    )
    bc = chain / F.sqrt((F.col("ta") * F.col("tb")).cast("double"))
    h = F.sqrt(F.greatest(F.lit(0.0), F.lit(1.0) - bc))
    return o.filter((F.col("ta") > 0) & (F.col("tb") > 0)).select(
        F.col("ta").alias("n_purchase"),
        F.col("tb").alias("n_click"),
        _FMT6(bc).alias("bhattacharyya"),
        _FMT6(h).alias("hellinger"),
    )


@register("events_hellinger", _hellinger_sql())
def events_hellinger(spark, sf):
    """Hellinger distance (and Bhattacharyya coefficient) between the
    weekday distributions of purchases and clicks — the bounded [0, 1]
    distribution-shift readout a drift monitor wants where KL diverges
    on empty cells: do purchases follow the same weekly rhythm as
    clicks, or does buying concentrate on different days than
    browsing? Complements ``events_cramers_v`` (association strength
    over the full contingency) with a proper metric between two named
    marginals.

    Float discipline: each of the 7 cells' sqrt(a_d * b_d) is ONE
    correctly-rounded IEEE sqrt of an exactly-representable integer
    product (< 2^53 at every test SF); the 7 terms sum in an EXPLICIT
    left-associated chain spelled identically on both engines; BC
    divides by one sqrt of an exact integer product, and H =
    sqrt(GREATEST(0, 1 - BC)) guards the Cauchy-Schwarz boundary so a
    1-ulp overshoot can never produce NaN on either engine. Weekday is
    the epoch-anchored (date - 2024-01-01) % 7 — NEVER dayofweek (the
    events_cramers_v rule).

    Scale shape: one map-side-combinable fact collapse to the 14-cell
    contingency (shared ``dow_type_counts``), then a single-row fixed
    expression — no shuffle wider than the aggregate state."""
    return hellinger_rollup(dow_type_counts(_events(spark, sf)))


# ------------------------------------------ Nelson-Aalen cumulative hazard --

def na_rollup(u: DataFrame, horizon_hours: int = 48) -> DataFrame:
    """Fold a per-user (fe, pt) conversion-span table into the
    Nelson-Aalen cumulative-hazard curve — the ADDITIVE twin of
    ``km_rollup`` over the shared ``survival_steps`` front half:
    H_i = H_{i-1} + d_i / n_i, each step one exact-cast integer
    division, the running sum a sequential left fold in duration
    order (0.0 + x == x exactly, so the seed add is elided on both
    engines)."""
    steps = survival_steps(u, horizon_hours)
    arr = steps.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("dur"), F.col("n"), F.col("d")))
        ).alias("a")
    )
    folded = arr.select(
        F.expr(
            "slice(aggregate(a, "
            "array(named_struct('dur', CAST(-1 AS BIGINT), "
            " 'n', CAST(0 AS BIGINT), 'd', CAST(0 AS BIGINT), "
            " 'h', CAST(0.0 AS DOUBLE))), "
            "(acc, x) -> acc || array(named_struct("
            " 'dur', x.dur, 'n', x.n, 'd', x.d, "
            " 'h', element_at(acc, -1).h "
            "      + (CAST(x.d AS DOUBLE) / CAST(x.n AS DOUBLE))"
            "))), 2, size(a))"
        ).alias("k")
    )
    r = folded.select(F.explode("k").alias("r"))
    return r.select(
        F.col("r.dur").alias("dur_hours"),
        F.col("r.n").alias("at_risk"),
        F.col("r.d").alias("deaths"),
        _FMT6(F.col("r.h")).alias("cum_hazard"),
    )


@register(
    "events_nelson_aalen",
    # Nelson-Aalen cumulative hazard for time-to-first-purchase under
    # the events_survival censoring rule — the additive companion to
    # the Kaplan-Meier product fold: H(t) = sum of d_i/n_i over steps
    # up to t, stepped by a recursive CTE running the IDENTICAL
    # (cast, cast, divide, add) chain as the Spark sorted-array fold
    # (0.0 + x == x exactly, so the base case elides the seed add).
    "WITH RECURSIVE u AS (SELECT user_id, MIN(ts) AS fe, "
    "  MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS pt "
    " FROM events GROUP BY user_id), "
    "c AS (SELECT MIN(fe) + INTERVAL 48 HOUR AS cut FROM u), "
    "sp AS (SELECT CASE WHEN pt IS NOT NULL AND pt <= cut "
    "   THEN (epoch_us(pt) - epoch_us(fe)) // 3600000000 "
    "   ELSE (epoch_us(cut) - epoch_us(fe)) // 3600000000 END AS dur, "
    "  (pt IS NOT NULL AND pt <= cut) AS death "
    " FROM u, c WHERE fe <= cut), "
    "g AS (SELECT CAST(dur AS BIGINT) AS dur, "
    "  CAST(SUM(CASE WHEN death THEN 1 ELSE 0 END) AS BIGINT) AS d, "
    "  CAST(COUNT(*) AS BIGINT) AS dc FROM sp GROUP BY 1), "
    "r0 AS (SELECT dur, d, CAST(SUM(dc) OVER (ORDER BY dur DESC "
    "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n "
    " FROM g), "
    "r AS (SELECT dur, n, d, CAST(ROW_NUMBER() OVER (ORDER BY dur) "
    "  AS BIGINT) AS rn FROM r0 WHERE d > 0), "
    "k(rn, dur, n, d, h) AS ("
    " SELECT rn, dur, n, d, "
    "  (CAST(d AS DOUBLE) / CAST(n AS DOUBLE)) FROM r WHERE rn = 1 "
    " UNION ALL "
    " SELECT r.rn, r.dur, r.n, r.d, "
    "  k.h + (CAST(r.d AS DOUBLE) / CAST(r.n AS DOUBLE)) "
    " FROM k JOIN r ON r.rn = k.rn + 1) "
    "SELECT dur AS dur_hours, n AS at_risk, d AS deaths, "
    "printf('%.6f', ROUND(h, 6)) AS cum_hazard FROM k",
)
def events_nelson_aalen(spark, sf):
    """Nelson-Aalen cumulative-hazard curve for time-to-first-purchase
    — the estimator survival analysis reaches for when hazard RATE
    (conversions per at-risk user per hour) matters more than survival
    probability: H(t) jumps by d_i/n_i at each event time, its slope
    IS the conversion intensity, and unlike Kaplan-Meier it stays
    well-behaved when at-risk counts get small. Same administrative
    48-hour censoring rule, duration grain, and at-risk accounting as
    ``events_survival`` (the shared ``survival_steps`` front half) —
    the two curves together are the standard survival-analysis pair
    (exp(-H) approximates S where hazards are small).

    Float discipline: every step increment is ONE correctly-rounded
    IEEE division of exact integers (deaths / at-risk); the running
    sum is a SEQUENTIAL left fold in duration order — a sorted-array
    JVM aggregate fold on Spark, a recursive CTE stepping the
    identical op chain on DuckDB (the events_ewma pattern), with the
    seed add elided on both sides since 0.0 + x == x exactly.

    Scale shape: identical to ``events_survival`` — one mergeable
    user-grain collapse, broadcast cutoff, horizon-bounded step table,
    one single-row fold."""
    return na_rollup(conversion_spans(_events(spark, sf)))


# ------------------------------------- total-variation distribution shift --

def _dow_pair_sql_front() -> str:
    """Shared oracle front half for the weekday purchase-vs-click
    distance family: the epoch-anchored weekday cells (the
    events_cramers_v rule — NEVER dayofweek) pivoted to one wide row
    of exact BIGINT marginals a0..a6 / b0..b6 + ta/tb totals."""
    cells = ", ".join(
        f"CAST(SUM(CASE WHEN dow = {d} AND event_type = 'purchase' "
        f"THEN 1 ELSE 0 END) AS BIGINT) AS a{d}, "
        f"CAST(SUM(CASE WHEN dow = {d} AND event_type = 'click' "
        f"THEN 1 ELSE 0 END) AS BIGINT) AS b{d}"
        for d in range(7)
    )
    ta = " + ".join(f"a{d}" for d in range(7))
    tb = " + ".join(f"b{d}" for d in range(7))
    return (
        "WITH e AS (SELECT CAST(DATEDIFF('day', DATE '2024-01-01', "
        " CAST(ts AS DATE)) % 7 AS BIGINT) AS dow, event_type FROM events "
        " WHERE event_type IN ('purchase', 'click')), "
        f"o AS (SELECT {cells} FROM e), "
        f"t AS (SELECT *, {ta} AS ta, {tb} AS tb FROM o) "
    )


def _tv_sql() -> str:
    """Build the events_tv_distance oracle: the shared weekday-marginal
    front half, then TV = sum |a_d*tb - b_d*ta| / (2*ta*tb) — the
    numerator an all-integer 7-term sum (order-immaterial), the
    distance ONE IEEE division."""
    num = " + ".join(f"ABS(a{d} * tb - b{d} * ta)" for d in range(7))
    return (
        _dow_pair_sql_front()
        + "SELECT ta AS n_purchase, tb AS n_click, "
        f"({num}) AS tv_numer, "
        f"printf('%.6f', ROUND(CAST({num} AS DOUBLE) "
        " / CAST(2 * ta * tb AS DOUBLE), 6)) AS tv_distance "
        "FROM t WHERE ta > 0 AND tb > 0"
    )


def tv_rollup(cells: DataFrame) -> DataFrame:
    """Fold a (dow, event_type, cnt) contingency grain into the one-row
    total-variation readout — shared by ``events_tv_distance`` and its
    streaming twin (the cross-multiplied integer contract lives
    here)."""
    import functools
    import operator

    o = dow_marginals(cells)
    num = functools.reduce(
        operator.add,
        [
            F.abs(
                F.col(f"a{d}") * F.col("tb") - F.col(f"b{d}") * F.col("ta")
            )
            for d in range(7)
        ],
    ).cast("long")
    return (
        o.filter((F.col("ta") > 0) & (F.col("tb") > 0))
        .select(
            F.col("ta").alias("n_purchase"),
            F.col("tb").alias("n_click"),
            num.alias("tv_numer"),
            _FMT6(
                num.cast("double")
                / (2 * F.col("ta") * F.col("tb")).cast("double")
            ).alias("tv_distance"),
        )
    )


@register("events_tv_distance", _tv_sql())
def events_tv_distance(spark, sf):
    """Total-variation distance between the weekday distributions of
    purchases and clicks — the L1 companion to ``events_hellinger``
    over the SAME contingency grain: TV is the tightest bound on how
    much any event's probability can differ between the two rhythms
    (the A/B reading: the maximum advantage a day-of-week-based
    classifier could ever extract), where Hellinger weights small
    cells more gently.

    Float discipline: TV = sum_d |a_d/ta - b_d/tb| / 2 is respelled
    over the common denominator as sum_d |a_d*tb - b_d*ta| /
    (2*ta*tb): the numerator is an ALL-INTEGER 7-term sum (summation
    order immaterial for BIGINTs; the cross products stay < 2^53 at
    every test SF — at 100 TB they move to DECIMAL(38,0), the
    events_spearman note) and the distance is ONE correctly-rounded
    IEEE division under ROUND + %.6f. The exact integer numerator is
    emitted alongside so the float column is redundant with the
    integer contract.

    Scale shape: one map-side-combinable fact collapse to the 14-cell
    contingency (shared ``dow_type_counts``), then a single-row fixed
    expression — identical to the Hellinger plan."""
    return tv_rollup(dow_type_counts(_events(spark, sf)))


# ---------------------------------------- 1-D Wasserstein (earth mover) --

def _wasserstein_sql() -> str:
    """Build the events_wasserstein oracle: the shared weekday-marginal
    front half, then W1 = sum_{d<6} |cumA_d*tb - cumB_d*ta| /
    (ta*tb) — explicit per-prefix integer sums, ONE IEEE division."""
    terms = []
    for d in range(6):
        ca = " + ".join(f"a{k}" for k in range(d + 1))
        cb = " + ".join(f"b{k}" for k in range(d + 1))
        terms.append(f"ABS(({ca}) * tb - ({cb}) * ta)")
    num = " + ".join(terms)
    return (
        _dow_pair_sql_front()
        + "SELECT ta AS n_purchase, tb AS n_click, "
        f"({num}) AS w1_numer, "
        f"printf('%.6f', ROUND(CAST({num} AS DOUBLE) "
        " / CAST(ta * tb AS DOUBLE), 6)) AS wasserstein_days "
        "FROM t WHERE ta > 0 AND tb > 0"
    )


def wasserstein_rollup(cells: DataFrame) -> DataFrame:
    """Fold a (dow, event_type, cnt) contingency grain into the one-row
    1-D Wasserstein readout — shared by ``events_wasserstein`` and its
    streaming twin (the exact prefix-sum contract lives here)."""
    import functools
    import operator

    o = dow_marginals(cells)
    terms = []
    for d in range(6):
        ca = functools.reduce(
            operator.add, [F.col(f"a{k}") for k in range(d + 1)]
        )
        cb = functools.reduce(
            operator.add, [F.col(f"b{k}") for k in range(d + 1)]
        )
        terms.append(F.abs(ca * F.col("tb") - cb * F.col("ta")))
    num = functools.reduce(operator.add, terms).cast("long")
    return (
        o.filter((F.col("ta") > 0) & (F.col("tb") > 0))
        .select(
            F.col("ta").alias("n_purchase"),
            F.col("tb").alias("n_click"),
            num.alias("w1_numer"),
            _FMT6(
                num.cast("double")
                / (F.col("ta") * F.col("tb")).cast("double")
            ).alias("wasserstein_days"),
        )
    )


@register("events_wasserstein", _wasserstein_sql())
def events_wasserstein(spark, sf):
    """1-D Wasserstein (earth-mover) distance between the weekday
    distributions of purchases and clicks, in units of DAYS — the
    geometry-aware member of the distribution-distance family: TV and
    Hellinger treat Monday-vs-Tuesday the same as Monday-vs-Saturday,
    while W1 charges mass by how FAR along the week it must move, so
    a one-day phase shift reads small and a weekday-vs-weekend flip
    reads large. On an ordered 1-D support W1 is the L1 distance
    between CDFs: W1 = sum_d |F_a(d) - F_b(d)| * (unit spacing).

    Float discipline: each CDF prefix is an explicit integer sum of
    the exact BIGINT cells; the 6 cross-multiplied |cumA_d*tb -
    cumB_d*ta| terms are all-integer (order-immaterial; DECIMAL(38,0)
    at 100 TB per the events_spearman note); W1 is ONE
    correctly-rounded IEEE division under ROUND + %.6f, with the
    exact integer numerator emitted alongside.

    Scale shape: one map-side-combinable fact collapse to the 14-cell
    contingency (shared ``dow_type_counts``), then a single-row fixed
    expression — identical to the Hellinger/TV plan."""
    return wasserstein_rollup(dow_type_counts(_events(spark, sf)))


# ------------------------------------------- ordinal association family --

def _ordinal_sql() -> str:
    """Build the events_gamma oracle: the events_kendall concordance
    CTE chain (cell-pair products, doubled tie corrections) extended
    with the two marginal level counts, then each of the four ordinal
    statistics as ONE exact-integer ratio under ROUND + %.6f."""
    return (
        "WITH pu AS (SELECT user_id, "
        "  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) "
        "   AS BIGINT) AS a, "
        "  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) "
        "   AS BIGINT) AS b FROM events GROUP BY user_id), "
        "cells AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n "
        " FROM pu GROUP BY a, b), "
        "cd AS (SELECT "
        "  CAST(COALESCE(SUM(CASE WHEN c1.b < c2.b THEN c1.n * c2.n END), 0) "
        "   AS BIGINT) AS c, "
        "  CAST(COALESCE(SUM(CASE WHEN c1.b > c2.b THEN c1.n * c2.n END), 0) "
        "   AS BIGINT) AS d "
        " FROM cells c1 JOIN cells c2 ON c1.a < c2.a), "
        "ta AS (SELECT CAST(SUM(t * (t - 1)) AS BIGINT) AS ta, "
        "  CAST(COUNT(*) AS BIGINT) AS ma "
        " FROM (SELECT CAST(SUM(n) AS BIGINT) AS t FROM cells GROUP BY a)), "
        "tb AS (SELECT CAST(SUM(t * (t - 1)) AS BIGINT) AS tb, "
        "  CAST(COUNT(*) AS BIGINT) AS mb "
        " FROM (SELECT CAST(SUM(n) AS BIGINT) AS t FROM cells GROUP BY b)), "
        "m AS (SELECT CAST(SUM(n) AS BIGINT) AS n FROM cells) "
        "SELECT n AS n_users, c AS concordant, d AS discordant, "
        "printf('%.6f', ROUND(CAST(c - d AS DOUBLE) "
        " / CAST(c + d AS DOUBLE), 6)) AS gamma, "
        "printf('%.6f', ROUND(CAST(2 * (c - d) AS DOUBLE) "
        " / CAST(n * (n - 1) - ta AS DOUBLE), 6)) AS somers_d_ba, "
        "printf('%.6f', ROUND(CAST(2 * (c - d) AS DOUBLE) "
        " / CAST(n * (n - 1) - tb AS DOUBLE), 6)) AS somers_d_ab, "
        "printf('%.6f', ROUND(CAST(2 * LEAST(ma, mb) * (c - d) AS DOUBLE) "
        " / CAST(n * n * (LEAST(ma, mb) - 1) AS DOUBLE), 6)) AS tau_c "
        "FROM m, cd, ta, tb "
        "WHERE c + d > 0 AND n * (n - 1) > ta AND n * (n - 1) > tb "
        " AND LEAST(ma, mb) > 1"
    )


def ordinal_rollup(pu: DataFrame) -> DataFrame:
    """Fold a per-user (a, b) volume table into the one-row ordinal
    association readout (Goodman-Kruskal gamma, Somers' D in both
    directions, Stuart's tau-c) — shared by ``events_gamma`` and its
    streaming twin. Same cell-pair concordance machinery as
    ``kendall_rollup``; the four one-division contracts live here."""
    cells = pu.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    c1 = cells.select(
        F.col("a").alias("a1"), F.col("b").alias("b1"),
        F.col("n").alias("n1"),
    )
    c2 = cells.select(
        F.col("a").alias("a2"), F.col("b").alias("b2"),
        F.col("n").alias("n2"),
    )
    cd = c1.join(F.broadcast(c2), F.col("a1") < F.col("a2")).agg(
        F.coalesce(
            F.sum(
                F.when(F.col("b1") < F.col("b2"), F.col("n1") * F.col("n2"))
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("c"),
        F.coalesce(
            F.sum(
                F.when(F.col("b1") > F.col("b2"), F.col("n1") * F.col("n2"))
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("d"),
    )
    ta = (
        cells.groupBy("a")
        .agg(F.sum("n").cast("long").alias("t"))
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1)).cast("long").alias("ta"),
            F.count(F.lit(1)).cast("long").alias("ma"),
        )
    )
    tb = (
        cells.groupBy("b")
        .agg(F.sum("n").cast("long").alias("t"))
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1)).cast("long").alias("tb"),
            F.count(F.lit(1)).cast("long").alias("mb"),
        )
    )
    m = cells.agg(F.sum("n").cast("long").alias("n"))
    j = m.crossJoin(cd).crossJoin(ta).crossJoin(tb)
    p = F.col("n") * (F.col("n") - 1)
    cmd = F.col("c") - F.col("d")
    mm = F.least(F.col("ma"), F.col("mb"))
    return (
        j.filter(
            (F.col("c") + F.col("d") > 0)
            & (p > F.col("ta"))
            & (p > F.col("tb"))
            & (mm > 1)
        )
        .select(
            F.col("n").alias("n_users"),
            F.col("c").alias("concordant"),
            F.col("d").alias("discordant"),
            _FMT6(
                cmd.cast("double") / (F.col("c") + F.col("d")).cast("double")
            ).alias("gamma"),
            _FMT6(
                (2 * cmd).cast("double") / (p - F.col("ta")).cast("double")
            ).alias("somers_d_ba"),
            _FMT6(
                (2 * cmd).cast("double") / (p - F.col("tb")).cast("double")
            ).alias("somers_d_ab"),
            _FMT6(
                (2 * mm * cmd).cast("double")
                / (F.col("n") * F.col("n") * (mm - 1)).cast("double")
            ).alias("tau_c"),
        )
    )


@register("events_gamma", _ordinal_sql())
def events_gamma(spark, sf):
    """Ordinal association family between per-user view volume and
    per-user purchase volume — the three classical companions to
    ``events_kendall`` off the SAME concordance machinery, in one
    readout row: Goodman-Kruskal gamma (ties excluded entirely — the
    optimistic bound), Somers' D in both dependency directions (ties
    on the independent margin excluded — the asymmetric regression
    reading, D_ba = 'does more viewing order more purchasing'), and
    Stuart's tau-c (the rectangular-table correction analysts quote
    when the two margins have very different level counts). Together
    with tau-b these four are the complete standard ordinal toolkit.

    Float discipline: C, D, the doubled tie corrections TA/TB, the
    margin level counts ma/mb, and every numerator/denominator are
    exact BIGINTs (DECIMAL(38,0) at 100 TB — the events_spearman
    note); each statistic is ONE correctly-rounded IEEE division
    under ROUND + %.6f:  gamma = (C-D)/(C+D),
    D_ba = 2(C-D)/(P-TA), D_ab = 2(C-D)/(P-TB),
    tau_c = 2m(C-D)/(n^2(m-1)) with m = min(ma, mb). Degenerate
    margins (all tied, or fewer than two levels) are filtered by
    identical integer guards on both engines.

    Scale shape: identical to ``events_kendall`` — one
    map-side-combinable collapse to the user grain (shared
    ``user_ab``), one further collapse to the dimension-sized
    distinct-cell table, a broadcast cell self-join (dimension^2
    pairs, never user^2), two marginal rollups, one single-row
    readout."""
    return ordinal_rollup(user_ab(_events(spark, sf)))


# ------------------------------------ lag-2 autocovariance diagnostics --

def acv_rollup(dt: DataFrame) -> DataFrame:
    """Fold a (day, cnt) daily-totals grain into the one-row exact
    lag-0/1/2 autocovariance state (n, C0, C1, C2) — the shared front
    half of ``events_pacf`` and ``events_ljung_box``. Deviations are
    scaled by n (d_t = n*x_t - S, an exact BIGINT — the events_autocorr
    trick), so every product is an exact DECIMAL(38,0) and the n^2
    scale cancels in every downstream ratio."""
    w = Window.orderBy("day")
    tot = dt.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cnt").cast("long").alias("s"),
    )
    d = dt.crossJoin(F.broadcast(tot)).select(
        "n",
        "day",
        (F.col("n") * F.col("cnt") - F.col("s"))
        .cast("decimal(38,0)")
        .alias("d"),
    )
    per = d.select(
        "n",
        "d",
        F.lag("d").over(w).alias("p1"),
        F.lag("d", 2).over(w).alias("p2"),
    )
    zero = F.lit(0).cast("decimal(38,0)")
    return per.agg(
        F.max("n").alias("n"),
        F.sum(F.col("d") * F.col("d")).alias("c0"),
        F.sum(
            F.when(F.col("p1").isNotNull(), F.col("d") * F.col("p1"))
            .otherwise(zero)
        ).alias("c1"),
        F.sum(
            F.when(F.col("p2").isNotNull(), F.col("d") * F.col("p2"))
            .otherwise(zero)
        ).alias("c2"),
    )


def _acv_sql_front() -> str:
    """Shared oracle front half for the lag-2 autocovariance family:
    the (day, cnt) daily grain, n-scaled exact deviations, and the
    HUGEINT lag-0/1/2 product sums (the dw oracle's engine-twin)."""
    return (
        "WITH dt AS (SELECT strftime(ts, '%Y-%m-%d') AS day, "
        " CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1), "
        "tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        " CAST(SUM(cnt) AS BIGINT) AS s FROM dt), "
        "dd AS (SELECT n, CAST(n * cnt - s AS HUGEINT) AS d, "
        " LAG(CAST(n * cnt - s AS HUGEINT)) OVER (ORDER BY day) AS p1, "
        " LAG(CAST(n * cnt - s AS HUGEINT), 2) OVER (ORDER BY day) AS p2 "
        " FROM dt, tot), "
        "m AS (SELECT MAX(n) AS n, "
        " CAST(SUM(d * d) AS HUGEINT) AS c0, "
        " CAST(SUM(CASE WHEN p1 IS NOT NULL THEN d * p1 ELSE 0 END) "
        "  AS HUGEINT) AS c1, "
        " CAST(SUM(CASE WHEN p2 IS NOT NULL THEN d * p2 ELSE 0 END) "
        "  AS HUGEINT) AS c2 FROM dd) "
    )


def pacf_rollup(dt: DataFrame) -> DataFrame:
    """Fold a (day, cnt) daily-totals grain into the one-row partial
    autocorrelation readout — shared by ``events_pacf`` and its
    streaming twin (the cross-multiplied integer contract lives
    here)."""
    return _pacf_readout(acv_rollup(dt))


def _pacf_readout(m: DataFrame) -> DataFrame:
    """PACF readout from a precomputed one-row acv state (shared with
    ``serial_report_rollup``, which derives the state once)."""
    c0, c1, c2 = F.col("c0"), F.col("c1"), F.col("c2")
    return (
        m.filter(
            (F.col("n") >= 3) & (c0 > 0) & (F.abs(c1) < c0)
        )
        .select(
            F.col("n").alias("n_days"),
            c0.cast("long").alias("acv0"),
            c1.cast("long").alias("acv1"),
            c2.cast("long").alias("acv2"),
            _FMT6(c1.cast("double") / c0.cast("double")).alias("r1"),
            _FMT6(c2.cast("double") / c0.cast("double")).alias("r2"),
            _FMT6(
                (c2 * c0 - c1 * c1).cast("double")
                / (c0 * c0 - c1 * c1).cast("double")
            ).alias("pacf2"),
        )
    )


@register(
    "events_pacf",
    # Lag-2 partial autocorrelation of the daily total-volume series
    # via Durbin-Levinson: phi_22 = (r2 - r1^2)/(1 - r1^2) respelled
    # over the common C0 denominator as (C2*C0 - C1^2)/(C0^2 - C1^2) —
    # a ratio of two exact HUGEINT/DECIMAL(38,0) integers and ONE IEEE
    # division; r1, r2 are each one exact-integer division too.
    _acv_sql_front()
    + "SELECT n AS n_days, "
    "CAST(c0 AS BIGINT) AS acv0, CAST(c1 AS BIGINT) AS acv1, "
    "CAST(c2 AS BIGINT) AS acv2, "
    "printf('%.6f', ROUND(CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE), 6)) "
    " AS r1, "
    "printf('%.6f', ROUND(CAST(c2 AS DOUBLE) / CAST(c0 AS DOUBLE), 6)) "
    " AS r2, "
    "printf('%.6f', ROUND(CAST(c2 * c0 - c1 * c1 AS DOUBLE) "
    " / CAST(c0 * c0 - c1 * c1 AS DOUBLE), 6)) AS pacf2 "
    "FROM m WHERE n >= 3 AND c0 > 0 AND ABS(c1) < c0",
)
def events_pacf(spark, sf):
    """Lag-2 partial autocorrelation of the daily total-volume series —
    the order-identification companion to ``events_autocorr``'s ACF and
    ``events_durbin_watson``'s residual test: phi_22 is the correlation
    between today and two days ago AFTER removing what yesterday
    already explains, the statistic that separates an AR(1) process
    (phi_22 near 0 — the Box-Jenkins 'cut-off') from genuinely deeper
    memory (phi_22 large), i.e. whether a one-day-lag forecast model
    is enough.

    Float discipline: deviations are scaled by n (d_t = n*x_t - S, an
    exact BIGINT), so the lag-0/1/2 product sums C0, C1, C2 are exact
    DECIMAL(38,0)/HUGEINT integers whose n^2 scale cancels in every
    ratio; Durbin-Levinson phi_22 = (r2 - r1^2)/(1 - r1^2) is
    respelled over the common denominator as (C2*C0 - C1^2) /
    (C0^2 - C1^2) — still a ratio of two EXACT integers (the decimal
    products stay < 10^31 at every test SF; headroom documented per
    the events_spearman note) and ONE correctly-rounded IEEE division
    under ROUND + %.6f; r1 and r2 are likewise one division each. The
    exact integer autocovariances are emitted alongside. Degenerate
    series (n < 3, constant, or |r1| = 1) are filtered by identical
    integer guards on both engines.

    Scale shape: one map-side-combinable fact collapse to the daily
    grain (shared ``day_totals``), one broadcast of the one-row total,
    one lag window plus a one-row aggregate over the dimension-sized
    day table — facts touched once, never sorted."""
    return pacf_rollup(day_totals(_events(spark, sf)))


_CHI2_95_DF2 = 5.991464547107982  # = -2*ln(0.05): exact chi2(2) 95% point


def ljung_box_rollup(dt: DataFrame) -> DataFrame:
    """Fold a (day, cnt) daily-totals grain into the one-row Ljung-Box
    portmanteau readout (lags 1-2) — shared by ``events_ljung_box``
    and its streaming twin (the pinned 3-op float chain lives here)."""
    return _lb_readout(acv_rollup(dt))


def _lb_readout(m: DataFrame) -> DataFrame:
    """Ljung-Box readout from a precomputed one-row acv state (shared
    with ``serial_report_rollup``, which derives the state once)."""
    n, c0, c1, c2 = F.col("n"), F.col("c0"), F.col("c1"), F.col("c2")
    q = (
        (n * (n + 2)).cast("double")
        * (c1 * c1 * (n - 2) + c2 * c2 * (n - 1)).cast("double")
        / ((n - 1) * (n - 2)).cast("double")
        / (c0 * c0).cast("double")
    )
    return (
        m.filter((n >= 3) & (c0 > 0))
        .select(
            n.alias("n_days"),
            _FMT6(q).alias("lb_q"),
            (q > F.lit(_CHI2_95_DF2)).alias("serial_dependence_95"),
        )
    )


def _ljung_box_sql() -> str:
    """Build the events_ljung_box oracle: the shared autocovariance
    front half, then the IDENTICAL pinned mul/div/div chain and the
    same inlined chi2(2) literal."""
    return (
        _acv_sql_front()
        + "SELECT n AS n_days, "
        "printf('%.6f', ROUND("
        "CAST(n * (n + 2) AS DOUBLE) "
        " * CAST(c1 * c1 * (n - 2) + c2 * c2 * (n - 1) AS DOUBLE) "
        " / CAST((n - 1) * (n - 2) AS DOUBLE) / CAST(c0 * c0 AS DOUBLE)"
        ", 6)) AS lb_q, "
        "(CAST(n * (n + 2) AS DOUBLE) "
        " * CAST(c1 * c1 * (n - 2) + c2 * c2 * (n - 1) AS DOUBLE) "
        " / CAST((n - 1) * (n - 2) AS DOUBLE) / CAST(c0 * c0 AS DOUBLE)"
        f" > {_CHI2_95_DF2!r}) AS serial_dependence_95 "
        "FROM m WHERE n >= 3 AND c0 > 0"
    )


@register("events_ljung_box", _ljung_box_sql())
def events_ljung_box(spark, sf):
    """Ljung-Box portmanteau test (lags 1-2) on the daily total-volume
    series — the JOINT whiteness test that complements the per-lag
    readouts: ``events_autocorr``/``events_pacf`` ask how big each lag
    is, Q asks whether the first two lags TOGETHER are consistent with
    white noise, the standard pre-flight check before trusting an
    i.i.d.-based monitor (and the df=2 twin of the DW single-lag
    test). Q = n(n+2) * [r1^2/(n-1) + r2^2/(n-2)].

    Float discipline: with rk = Ck/C0 over the exact integer
    autocovariances (shared ``acv_rollup``), Q is respelled so every
    integer subterm stays exact — numerator C1^2(n-2) + C2^2(n-1) and
    denominators (n-1)(n-2), C0^2 are DECIMAL(38,0)/HUGEINT — and the
    float part is a PINNED 3-op chain (mul, div, div in one textual
    order on both engines; each IEEE op correctly rounded on identical
    inputs, so the composition is bit-identical) under ROUND + %.6f.
    The 5% decision compares that identical double against the inlined
    chi2(2) critical literal -2*ln(0.05) = 5.991464547107982 — exact
    for df=2 (the inverse CDF has the closed form -2*ln(alpha)), so
    the flag is honest, not a non-dyadic table constant (the
    retrieval_ndcg precomputed-literal trick).

    Scale shape: identical to ``events_pacf`` — one map-side
    collapse to the daily grain, one lag window over the
    dimension-sized day table, one single-row readout."""
    return ljung_box_rollup(day_totals(_events(spark, sf)))


_LN40 = 3.6888794541139363  # = ln(40): 2*exp(-6K^2/(n^3+n^2)) < 0.05 bound


def pettitt_rollup(dt: DataFrame) -> DataFrame:
    """Fold a (day, cnt) daily-totals grain into the one-row Pettitt
    changepoint readout — shared by ``events_pettitt`` and its
    streaming twin (the all-integer U_t recursion lives here)."""
    w = Window.orderBy("day")
    g = dt.groupBy("cnt").agg(F.count(F.lit(1)).cast("long").alias("k"))
    wcum = Window.orderBy("cnt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cu = g.select(
        "cnt", "k", F.sum("k").over(wcum).cast("long").alias("cum")
    )
    tot = dt.agg(F.count(F.lit(1)).cast("long").alias("n"))
    v = (
        dt.join(F.broadcast(cu), "cnt")
        .crossJoin(F.broadcast(tot))
        .select(
            "day",
            "n",
            (2 * F.col("cum") - F.col("k") - F.col("n"))
            .cast("long")
            .alias("v"),
        )
    )
    u = v.select(
        "day",
        "n",
        F.sum("v").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .cast("long")
        .alias("u"),
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") < F.col("n"))
    pick = Window.orderBy(F.abs(F.col("u")).desc(), F.col("day"))
    top = (
        u.select(
            "day", "n", "u", F.row_number().over(pick).alias("pr")
        )
        .filter(F.col("pr") == 1)
    )
    kk = F.abs(F.col("u"))
    nn = F.col("n")
    return top.select(
        nn.alias("n_days"),
        F.col("day").alias("change_day"),
        kk.alias("k_stat"),
        F.col("u").alias("u_at_change"),
        (
            (6 * kk * kk).cast("double")
            > F.lit(_LN40) * (nn * nn * nn + nn * nn).cast("double")
        ).alias("significant_95"),
    )


def _pettitt_sql() -> str:
    """Build the events_pettitt oracle: the doubled-midrank V_t spelling
    (V_t = 2*cum - k - n), the windowed U_t prefix sum, the
    (|U| DESC, day) argmax, and the same inlined ln(40) literal."""
    return (
        "WITH dt AS (SELECT strftime(ts, '%Y-%m-%d') AS day, "
        " CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1), "
        "g AS (SELECT cnt, CAST(COUNT(*) AS BIGINT) AS k FROM dt "
        " GROUP BY cnt), "
        "cu AS (SELECT cnt, k, CAST(SUM(k) OVER (ORDER BY cnt) AS BIGINT) "
        " AS cum FROM g), "
        "tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM dt), "
        "v AS (SELECT day, n, "
        "  CAST(2 * cum - k - n AS BIGINT) AS v "
        " FROM dt JOIN cu USING (cnt), tot), "
        "u AS (SELECT day, n, "
        "  CAST(SUM(v) OVER (ORDER BY day) AS BIGINT) AS u, "
        "  ROW_NUMBER() OVER (ORDER BY day) AS rn FROM v), "
        "t AS (SELECT day, n, u, "
        "  ROW_NUMBER() OVER (ORDER BY ABS(u) DESC, day) AS pr "
        " FROM u WHERE rn < n) "
        "SELECT n AS n_days, day AS change_day, ABS(u) AS k_stat, "
        "u AS u_at_change, "
        "(CAST(6 * ABS(u) * ABS(u) AS DOUBLE) "
        f" > {_LN40!r} * CAST(n * n * n + n * n AS DOUBLE)) "
        " AS significant_95 "
        "FROM t WHERE pr = 1"
    )


@register("events_pettitt", _pettitt_sql())
def events_pettitt(spark, sf):
    """Pettitt single-changepoint test on the daily total-volume
    series — the RANK-based companion to ``events_changepoint``'s
    CUSUM-of-levels argmax: U_t compares every day before t with every
    day after t by sign only, so a sustained level shift is found
    without being dragged by outlier days (the Mann-Whitney statistic
    swept over all split points). Emits the split day, K = max|U_t|,
    the signed U there (sign = direction of the shift), and the 5%
    decision.

    Float discipline: V_t = #(x_j < x_t) - #(x_j > x_t) is spelled
    from the doubled-midrank machinery as 2*cum - k - n (all exact
    BIGINTs — the events_spearman rank trick); U_t is the integer
    prefix sum of V_t (the standard Pettitt recursion U_t = U_{t-1} +
    V_t); the argmax is pinned by the total (|U| DESC, day) order on
    both engines. The 5% flag inverts p = 2*exp(-6K^2/(n^3+n^2)) <
    0.05 into 6K^2 > ln(40)*(n^3+n^2) with ln(40) inlined as a
    precomputed correctly-rounded literal (the retrieval_ndcg trick) —
    one identical multiply-and-compare on both engines, never a
    data-dependent transcendental.

    Scale shape: one map-side-combinable fact collapse to the daily
    grain (shared ``day_totals``), rank machinery over the TINY
    value-distribution table (broadcast back), two windows over the
    dimension-sized day table — the all-pairs double sum is never
    materialized (the O(n^2) definition collapses to the O(n)
    recursion)."""
    return pettitt_rollup(day_totals(_events(spark, sf)))


# --------------------------------------- Cochran-Armitage dose trend --

_CHI2_95_DF1 = 3.841458820694124  # published chi2(1) 95% point (z_{.975}^2)


def dow_trial_counts(df: DataFrame) -> DataFrame:
    """Per-weekday (trials, purchases) — the shared dose-response grain
    for ``events_cochran_armitage`` and its streaming twin (plain
    SUM-able counts, exactly mergeable across micro-batches; weekday =
    the epoch-anchored events_cramers_v rule, NEVER dayofweek)."""
    return (
        df.select(
            F.pmod(
                F.datediff(
                    F.to_date("ts"), F.lit("2024-01-01").cast("date")
                ),
                F.lit(7),
            )
            .cast("long")
            .alias("dow"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("p"),
        )
        .groupBy("dow")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("p").cast("long").alias("a"),
        )
    )


def ca_rollup(g: DataFrame) -> DataFrame:
    """Fold a (dow, n, a) dose grain into the one-row Cochran-Armitage
    readout — shared by ``events_cochran_armitage`` and its streaming
    twin (the exact-integer z^2 contract lives here)."""
    m = g.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("a").cast("long").alias("aa"),
        F.sum(F.col("dow") * F.col("a")).cast("long").alias("t1"),
        F.sum(F.col("dow") * F.col("n")).cast("long").alias("t2"),
        F.sum(F.col("dow") * F.col("dow") * F.col("n"))
        .cast("long")
        .alias("t3"),
    )
    nn, aa = F.col("nn"), F.col("aa")
    t1, t2, t3 = F.col("t1"), F.col("t2"), F.col("t3")
    diff = (nn * t1 - aa * t2).cast("decimal(38,0)")
    vdose = (nn * t3 - t2 * t2).cast("decimal(38,0)")
    num = nn.cast("decimal(38,0)") * diff * diff
    den = (aa * (nn - aa)).cast("decimal(38,0)") * vdose
    z2 = num.cast("double") / den.cast("double")
    return (
        m.filter((aa > 0) & (aa < nn) & (nn * t3 > t2 * t2))
        .select(
            nn.alias("n_events"),
            aa.alias("n_purchases"),
            F.signum((nn * t1 - aa * t2).cast("double"))
            .cast("int")
            .alias("trend_direction"),
            _FMT6(z2).alias("ca_z2"),
            (z2 > F.lit(_CHI2_95_DF1)).alias("trend_significant_95"),
        )
    )


def _ca_sql() -> str:
    """Build the events_cochran_armitage oracle: the epoch-anchored
    weekday dose grain, the five exact moments, and the IDENTICAL
    one-division z^2 with the same inlined chi2(1) literal."""
    return (
        "WITH g AS (SELECT CAST(DATEDIFF('day', DATE '2024-01-01', "
        " CAST(ts AS DATE)) % 7 AS BIGINT) AS dow, "
        " CAST(COUNT(*) AS BIGINT) AS n, "
        " CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) "
        "  AS BIGINT) AS a FROM events GROUP BY 1), "
        "m AS (SELECT CAST(SUM(n) AS BIGINT) AS nn, "
        " CAST(SUM(a) AS BIGINT) AS aa, "
        " CAST(SUM(dow * a) AS BIGINT) AS t1, "
        " CAST(SUM(dow * n) AS BIGINT) AS t2, "
        " CAST(SUM(dow * dow * n) AS BIGINT) AS t3 FROM g) "
        "SELECT nn AS n_events, aa AS n_purchases, "
        "CAST(SIGN(CAST(nn * t1 - aa * t2 AS DOUBLE)) AS INT) "
        " AS trend_direction, "
        "printf('%.6f', ROUND("
        "CAST(CAST(nn AS HUGEINT) * CAST(nn * t1 - aa * t2 AS HUGEINT) "
        "  * CAST(nn * t1 - aa * t2 AS HUGEINT) AS DOUBLE) "
        " / CAST(CAST(aa * (nn - aa) AS HUGEINT) "
        "  * CAST(nn * t3 - t2 * t2 AS HUGEINT) AS DOUBLE), 6)) AS ca_z2, "
        "(CAST(CAST(nn AS HUGEINT) * CAST(nn * t1 - aa * t2 AS HUGEINT) "
        "  * CAST(nn * t1 - aa * t2 AS HUGEINT) AS DOUBLE) "
        " / CAST(CAST(aa * (nn - aa) AS HUGEINT) "
        f"  * CAST(nn * t3 - t2 * t2 AS HUGEINT) AS DOUBLE)"
        f" > {_CHI2_95_DF1!r}) AS trend_significant_95 "
        "FROM m WHERE aa > 0 AND aa < nn AND nn * t3 > t2 * t2"
    )


@register("events_cochran_armitage", _ca_sql())
def events_cochran_armitage(spark, sf):
    """Cochran-Armitage trend test of purchase propensity across the
    epoch-week (dose = weekday index 0..6) — the ORDERED-alternative
    companion to ``events_cramers_v``: chi2 asks only whether the
    weekday margins differ; CA asks the sharper monotone question (does
    conversion drift up or down ACROSS the week?), which is the test
    with power when the effect is a steady within-week ramp. Emits the
    trend direction, z^2, and the 5% decision.

    Float discipline: the five sufficient moments (N, A, T1 = sum d*a,
    T2 = sum d*n, T3 = sum d^2*n) are exact BIGINTs; z^2 =
    N(N*T1 - A*T2)^2 / (A(N-A)(N*T3 - T2^2)) has exact
    DECIMAL(38,0)/HUGEINT numerator and denominator (products < 10^31
    at every test SF — headroom per the events_spearman note) and is
    ONE correctly-rounded IEEE division under ROUND + %.6f. The
    direction is the exact integer sign of N*T1 - A*T2; the 5% flag
    compares the identically-computed double against the inlined
    chi2(1) literal 3.841458820694124 (the retrieval_ndcg
    precomputed-literal trick), so both engines decide identically.
    Degenerate margins (no purchases, all purchases, zero dose
    variance) are filtered by identical integer guards.

    Scale shape: ONE map-side-combinable fact collapse to the 7-row
    dose grain (shared ``dow_trial_counts``), then a single-row fixed
    expression — the events_cramers_v plan."""
    return ca_rollup(dow_trial_counts(_events(spark, sf)))


# ------------------------------------------- serial-dependence macro ----

def serial_report_rollup(dt: DataFrame) -> DataFrame:
    """Fold a (day, cnt) daily-totals grain into the one-row
    serial-dependence report — shared by ``macro_serial_report`` and
    its streaming twin (composes the shared ``dw_rollup``,
    ``pacf_rollup``, ``ljung_box_rollup`` and ``pettitt_rollup``; each
    readout keeps its per-key contract exactly)."""
    dt = dt.localCheckpoint()
    dw = dw_rollup(dt).select("n_days", "dw", "positive_autocorr")
    acv = acv_rollup(dt).localCheckpoint()
    pa = _pacf_readout(acv).select("r1", "r2", "pacf2")
    lb = _lb_readout(acv).select("lb_q", "serial_dependence_95")
    pt = pettitt_rollup(dt).select(
        F.col("change_day").alias("pettitt_day"),
        F.col("k_stat").alias("pettitt_k"),
        F.col("significant_95").alias("pettitt_significant_95"),
    )
    return (
        dw.crossJoin(F.broadcast(pa))
        .crossJoin(F.broadcast(lb))
        .crossJoin(F.broadcast(pt))
    )


def _serial_report_sql() -> str:
    """Compose the four serial-dependence oracles over ONE shared
    day-totals CTE with disjoint names (dm = DW moments, am = the
    autocovariance front, pg/pc/pv/pu/pt = the Pettitt chain)."""
    return (
        "WITH dt AS (SELECT strftime(ts, '%Y-%m-%d') AS day, "
        " CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1), "
        # Durbin-Watson moments
        "dl AS (SELECT cnt, LAG(cnt) OVER (ORDER BY day) AS prev FROM dt), "
        "dm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "  CAST(SUM(CAST(cnt AS HUGEINT)) AS HUGEINT) AS s, "
        "  CAST(SUM(CAST(cnt AS HUGEINT) * cnt) AS HUGEINT) AS sxx, "
        "  CAST(SUM(CASE WHEN prev IS NOT NULL THEN "
        "   CAST(cnt - prev AS HUGEINT) * (cnt - prev) ELSE 0 END) "
        "   AS HUGEINT) AS sdd FROM dl), "
        # lag-2 autocovariances (n-scaled exact deviations)
        "at AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        " CAST(SUM(cnt) AS BIGINT) AS s FROM dt), "
        "ad AS (SELECT CAST(n * cnt - s AS HUGEINT) AS d, "
        " LAG(CAST(n * cnt - s AS HUGEINT)) OVER (ORDER BY day) AS p1, "
        " LAG(CAST(n * cnt - s AS HUGEINT), 2) OVER (ORDER BY day) AS p2 "
        " FROM dt, at), "
        "am AS (SELECT CAST(SUM(d * d) AS HUGEINT) AS c0, "
        " CAST(SUM(CASE WHEN p1 IS NOT NULL THEN d * p1 ELSE 0 END) "
        "  AS HUGEINT) AS c1, "
        " CAST(SUM(CASE WHEN p2 IS NOT NULL THEN d * p2 ELSE 0 END) "
        "  AS HUGEINT) AS c2 FROM ad), "
        # Pettitt chain (doubled-midrank V_t, windowed U_t, pinned argmax)
        "pg AS (SELECT cnt, CAST(COUNT(*) AS BIGINT) AS k FROM dt "
        " GROUP BY cnt), "
        "pc AS (SELECT cnt, k, CAST(SUM(k) OVER (ORDER BY cnt) AS BIGINT) "
        " AS cum FROM pg), "
        "pv AS (SELECT day, n, CAST(2 * cum - k - n AS BIGINT) AS v "
        " FROM dt JOIN pc USING (cnt), at), "
        "pu AS (SELECT day, n, CAST(SUM(v) OVER (ORDER BY day) AS BIGINT) "
        " AS u, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM pv), "
        "pt AS (SELECT day, u, "
        "  ROW_NUMBER() OVER (ORDER BY ABS(u) DESC, day) AS pr "
        " FROM pu WHERE rn < n) "
        "SELECT dm.n AS n_days, "
        "printf('%.6f', ROUND(CAST(dm.n * dm.sdd AS DOUBLE) "
        " / CAST(dm.n * dm.sxx - dm.s * dm.s AS DOUBLE), 6)) AS dw, "
        "(2 * (dm.n * dm.sxx - dm.s * dm.s) > dm.n * dm.sdd) "
        " AS positive_autocorr, "
        "printf('%.6f', ROUND(CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE), 6)) "
        " AS r1, "
        "printf('%.6f', ROUND(CAST(c2 AS DOUBLE) / CAST(c0 AS DOUBLE), 6)) "
        " AS r2, "
        "printf('%.6f', ROUND(CAST(c2 * c0 - c1 * c1 AS DOUBLE) "
        " / CAST(c0 * c0 - c1 * c1 AS DOUBLE), 6)) AS pacf2, "
        "printf('%.6f', ROUND("
        "CAST(dm.n * (dm.n + 2) AS DOUBLE) "
        " * CAST(c1 * c1 * (dm.n - 2) + c2 * c2 * (dm.n - 1) AS DOUBLE) "
        " / CAST((dm.n - 1) * (dm.n - 2) AS DOUBLE) "
        " / CAST(c0 * c0 AS DOUBLE), 6)) AS lb_q, "
        "(CAST(dm.n * (dm.n + 2) AS DOUBLE) "
        " * CAST(c1 * c1 * (dm.n - 2) + c2 * c2 * (dm.n - 1) AS DOUBLE) "
        " / CAST((dm.n - 1) * (dm.n - 2) AS DOUBLE) "
        f" / CAST(c0 * c0 AS DOUBLE) > {_CHI2_95_DF2!r}) "
        " AS serial_dependence_95, "
        "pt.day AS pettitt_day, ABS(pt.u) AS pettitt_k, "
        "(CAST(6 * ABS(pt.u) * ABS(pt.u) AS DOUBLE) "
        f" > {_LN40!r} * CAST(dm.n * dm.n * dm.n + dm.n * dm.n AS DOUBLE)) "
        " AS pettitt_significant_95 "
        "FROM dm, am, pt "
        "WHERE pt.pr = 1 AND dm.n * dm.sxx - dm.s * dm.s > 0 "
        " AND dm.n >= 3 AND c0 > 0 AND ABS(c1) < c0"
    )


@register("macro_serial_report", _serial_report_sql())
def macro_serial_report(spark, sf):
    """One-row serial-dependence report of the daily volume series —
    the time-series pre-flight an ops dashboard runs before trusting
    any i.i.d.-based monitor, composing the family's four newest
    contracts over ONE shared ``day_totals`` grain: Durbin-Watson (and
    its integer-decided direction flag), the lag-1/2 ACF and the
    Durbin-Levinson PACF(2), the Ljung-Box joint whiteness Q with its
    exact chi2(2) decision, and the Pettitt changepoint (day, K, 5%
    flag). Green here pins the COMPOSITION (the macro_daily_health
    rationale): the oracle re-derives all four chains from the same
    day-totals CTE with disjoint names.

    Float discipline: each readout keeps its per-key contract exactly
    (single divisions of exact integers, the pinned 3-op Ljung-Box
    chain, the precomputed -2*ln(0.05) and ln(40) literals); nothing
    new is introduced by composition.

    Scale shape: one map-side-combinable fact collapse to the calendar
    day grain (localCheckpointed so the four rollups share ONE
    materialization); every downstream stage is dimension-sized."""
    return serial_report_rollup(day_totals(_events(spark, sf)))


# ------------------------------------------------- Page trend test ----

_Z_95_ONE_SIDED = 1.6448536269514722  # published one-sided normal 95% point


def page_rollup(dt: DataFrame) -> DataFrame:
    """Fold a (day, cnt) daily-totals grain into the one-row Page-L
    readout — shared by ``events_page`` and its streaming twin (the
    doubled-L integer contract lives here, over the shared
    ``week_dow_ranksums`` blocked-rank front)."""
    import functools
    import operator

    o = week_dow_ranksums(dt)
    l2 = functools.reduce(
        operator.add,
        [(k + 1) * F.col(f"d{k}") for k in range(7)],
    ).cast("long")
    n = F.col("n")
    diff = (6 * (l2 - 224 * n)).cast("double")
    z = diff / F.sqrt((18816 * n).cast("double"))
    return o.filter(n >= 2).select(
        n.alias("n_weeks"),
        l2.alias("l2_stat"),
        F.signum(l2 - 224 * n).cast("int").alias("trend_direction"),
        _FMT6(z).alias("page_z"),
        (z > F.lit(_Z_95_ONE_SIDED)).alias("increasing_95"),
    )


def _page_sql() -> str:
    """Build the events_page oracle: the friedman blocked-midrank CTE
    chain, then the doubled Page L, the exact-integer expectation
    term, and the one-division z with the same inlined literal."""
    l2 = " + ".join(f"{k + 1} * d{k}" for k in range(7))
    z = (
        f"CAST(6 * (({l2}) - 224 * n) AS DOUBLE) "
        " / SQRT(CAST(18816 * n AS DOUBLE))"
    )
    cells = ", ".join(
        f"CAST(SUM(CASE WHEN dow = {g} THEN dr ELSE 0 END) AS BIGINT) "
        f"AS d{g}"
        for g in range(7)
    )
    return (
        "WITH dt AS (SELECT strftime(ts, '%Y-%m-%d') AS day, "
        " CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1), "
        "dd AS (SELECT cnt, "
        " (CAST(day AS DATE) - DATE '2024-01-01') // 7 AS week, "
        " (CAST(day AS DATE) - DATE '2024-01-01') % 7 AS dow FROM dt), "
        "cw AS (SELECT week FROM dd GROUP BY week HAVING COUNT(*) = 7), "
        "db AS (SELECT dd.* FROM dd JOIN cw ON dd.week = cw.week), "
        "g AS (SELECT week, cnt, CAST(COUNT(*) AS BIGINT) AS t FROM db "
        " GROUP BY 1, 2), "
        "r AS (SELECT week, cnt, 2 * CAST(SUM(t) OVER (PARTITION BY week "
        " ORDER BY cnt ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
        " AS BIGINT) - t + 1 AS dr FROM g), "
        "j AS (SELECT db.dow, r.dr FROM db "
        " JOIN r ON db.week = r.week AND db.cnt = r.cnt), "
        "nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM cw), "
        f"o AS (SELECT {cells} FROM j) "
        f"SELECT n AS n_weeks, ({l2}) AS l2_stat, "
        f"CAST(SIGN(({l2}) - 224 * n) AS INT) AS trend_direction, "
        f"printf('%.6f', ROUND({z}, 6)) AS page_z, "
        f"({z} > {_Z_95_ONE_SIDED!r}) AS increasing_95 "
        "FROM o, nb WHERE n >= 2"
    )


@register("events_page", _page_sql())
def events_page(spark, sf):
    """Page's L trend test of an ORDERED weekday effect with calendar
    weeks as blocks — the monotone-alternative sharpening of
    ``events_friedman`` (Friedman asks only whether weekdays differ;
    Page asks whether volume RAMPS across the week in the dose order
    0..6 — the blocked sibling of ``events_jonckheere``, and the test
    with power when the effect is a steady within-week drift that
    repeats every week). L = sum_j j * R_j over the within-week rank
    sums; a large L means late weekdays consistently out-rank early
    ones.

    Float discipline: within-week doubled midranks are exact integers
    (the shared ``week_dow_ranksums`` front), so the doubled statistic
    2L = sum (j+1)*D_j and the centered term 2L - 224n (E[2L] =
    b*k(k+1)^2/2 with k=7) are exact BIGINTs; z = 6*(2L - 224n) /
    sqrt(18816n) (4*36*Var[L] = b*k^2(k+1)^2(k-1) = 18816b) is ONE
    sqrt of an exact integer and ONE IEEE division under ROUND +
    %.6f. The classical no-ties variance is used (ties enter L via
    midranks — the standard practice; Friedman's chi2 carries the tie
    correction for this family). Direction is the exact integer sign;
    the one-sided 5% flag compares the identically-computed z against
    the inlined published normal literal 1.6448536269514722.

    Scale shape: identical to ``events_friedman`` — one fact collapse
    to the calendar-day grain; ranks and the final row live at
    dimension scale (weeks × 7)."""
    return page_rollup(day_totals(_events(spark, sf)))


# ------------------------------------------------ turning-point test ----

_Z_95_TWO_SIDED = 1.959963984540054  # published two-sided normal 95% point


def turning_rollup(dt: DataFrame) -> DataFrame:
    """Fold a (day, cnt) daily-totals grain into the one-row
    turning-point randomness readout — shared by
    ``events_turning_points`` and its streaming twin (the strict
    integer peak/trough contract lives here)."""
    w = Window.orderBy("day")
    tp = dt.select(
        "cnt",
        F.lag("cnt").over(w).alias("prev"),
        F.lead("cnt").over(w).alias("next"),
    )
    is_turn = (
        F.col("prev").isNotNull()
        & F.col("next").isNotNull()
        & (
            ((F.col("prev") < F.col("cnt")) & (F.col("next") < F.col("cnt")))
            | (
                (F.col("prev") > F.col("cnt"))
                & (F.col("next") > F.col("cnt"))
            )
        )
    )
    m = tp.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(is_turn, 1).otherwise(0)).cast("long").alias("t"),
    )
    n, t = F.col("n"), F.col("t")
    z = (90 * t - 60 * (n - 2)).cast("double") / F.sqrt(
        (90 * (16 * n - 29)).cast("double")
    )
    return m.filter(n >= 3).select(
        n.alias("n_days"),
        t.alias("n_turning"),
        _FMT6((2 * (n - 2)).cast("double") / F.lit(3.0)).alias(
            "expected_turning"
        ),
        _FMT6(z).alias("tp_z"),
        (F.abs(z) > F.lit(_Z_95_TWO_SIDED)).alias("nonrandom_95"),
    )


def _turning_sql() -> str:
    """Build the events_turning_points oracle: lag/lead windows over
    the day grain, the strict integer peak/trough count, and the
    IDENTICAL respelled z with the same inlined literal."""
    return (
        "WITH dt AS (SELECT strftime(ts, '%Y-%m-%d') AS day, "
        " CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1), "
        "l AS (SELECT cnt, LAG(cnt) OVER (ORDER BY day) AS prev, "
        " LEAD(cnt) OVER (ORDER BY day) AS next FROM dt), "
        "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        " CAST(SUM(CASE WHEN prev IS NOT NULL AND next IS NOT NULL AND "
        "  ((prev < cnt AND next < cnt) OR (prev > cnt AND next > cnt)) "
        "  THEN 1 ELSE 0 END) AS BIGINT) AS t FROM l) "
        "SELECT n AS n_days, t AS n_turning, "
        "printf('%.6f', ROUND(CAST(2 * (n - 2) AS DOUBLE) / 3.0, 6)) "
        " AS expected_turning, "
        "printf('%.6f', ROUND(CAST(90 * t - 60 * (n - 2) AS DOUBLE) "
        " / SQRT(CAST(90 * (16 * n - 29) AS DOUBLE)), 6)) AS tp_z, "
        "(ABS(CAST(90 * t - 60 * (n - 2) AS DOUBLE) "
        " / SQRT(CAST(90 * (16 * n - 29) AS DOUBLE))) "
        f" > {_Z_95_TWO_SIDED!r}) AS nonrandom_95 "
        "FROM m WHERE n >= 3"
    )


@register("events_turning_points", _turning_sql())
def events_turning_points(spark, sf):
    """Turning-point test of randomness on the daily total-volume
    series — the local-extrema member of the randomness family
    (``events_runs_test`` watches sign regimes around the median;
    turning points watch the SHAPE: too few peaks/troughs = momentum
    or trend, too many = alternation/over-correction). T counts strict
    interior peaks and troughs; under i.i.d. E[T] = 2(n-2)/3 and
    Var[T] = (16n-29)/90 (Kendall's classical result).

    Float discipline: T and n are exact integers (strict integer
    comparisons; equal neighbors simply do not count — both engines
    apply the identical strict predicate, the honest treatment of the
    no-ties classical theory on a tied corpus); the z respells to
    (90T - 60(n-2)) / sqrt(90(16n-29)) — an exact integer numerator,
    ONE sqrt of an exact integer, ONE IEEE division under ROUND +
    %.6f; the expectation is ONE division by the dyadic-parsed 3.0
    literal; the 5% flag compares |z| against the inlined published
    two-sided normal literal.

    Scale shape: one map-side-combinable fact collapse to the daily
    grain (shared ``day_totals``), one lag/lead window plus a one-row
    aggregate over the dimension-sized day table."""
    return turning_rollup(day_totals(_events(spark, sf)))


# ---------------------------------------------- seasonal Mann-Kendall ----

def smk_rollup(dt: DataFrame) -> DataFrame:
    """Fold a (day, cnt) daily-totals grain into the one-row seasonal
    Mann-Kendall readout (weekday strata) — shared by
    ``events_mk_seasonal`` and its streaming twin (the summed exact-S /
    tie-corrected-variance contract lives here)."""
    anchor = F.lit("2024-01-01").cast("date")
    dd = dt.select(
        "day",
        "cnt",
        F.pmod(F.datediff(F.to_date("day"), anchor), F.lit(7))
        .cast("long")
        .alias("dow"),
    )
    a = dd.select(
        "dow", F.col("day").alias("day_a"), F.col("cnt").alias("cnt_a")
    )
    b = dd.select(
        "dow", F.col("day").alias("day_b"), F.col("cnt").alias("cnt_b")
    )
    s = (
        a.join(b, ["dow"])
        .filter(F.col("day_a") < F.col("day_b"))
        .agg(
            F.sum(
                F.when(F.col("cnt_b") > F.col("cnt_a"), 1)
                .when(F.col("cnt_b") < F.col("cnt_a"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s")
        )
    )
    per = dd.groupBy("dow").agg(F.count(F.lit(1)).cast("long").alias("m"))
    ties = (
        dd.groupBy("dow", "cnt")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .groupBy("dow")
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5))
            .cast("long")
            .alias("tc")
        )
    )
    v = (
        per.join(ties, "dow")
        .agg(
            F.sum(
                F.col("m") * (F.col("m") - 1) * (2 * F.col("m") + 5)
                - F.col("tc")
            )
            .cast("long")
            .alias("var18"),
            F.sum("m").cast("long").alias("n"),
        )
    )
    j = s.crossJoin(F.broadcast(v))
    sc = F.col("s")
    cc = (
        F.when(sc > 0, sc - 1).when(sc < 0, sc + 1).otherwise(F.lit(0))
    ).cast("double")
    z = cc / F.sqrt(F.col("var18").cast("double") / F.lit(18.0))
    return j.filter(F.col("var18") > 0).select(
        F.col("n").alias("n_days"),
        sc.alias("s_stat"),
        F.col("var18").alias("var18_num"),
        F.signum(sc.cast("double")).cast("int").alias("trend_direction"),
        _FMT6(z).alias("smk_z"),
        (F.abs(z) > F.lit(_Z_95_TWO_SIDED)).alias("trend_significant_95"),
    )


def _smk_sql() -> str:
    """Build the events_mk_seasonal oracle: weekday-stratified day
    pairs (the epoch-anchored dow), per-stratum tie-corrected variance
    terms summed, and the IDENTICAL continuity-corrected z chain."""
    return (
        "WITH dt AS (SELECT strftime(ts, '%Y-%m-%d') AS day, "
        " CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1), "
        "dd AS (SELECT day, cnt, "
        " CAST((CAST(day AS DATE) - DATE '2024-01-01') % 7 AS BIGINT) "
        "  AS dow FROM dt), "
        "s AS (SELECT CAST(SUM(CASE WHEN b.cnt > a.cnt THEN 1 "
        "  WHEN b.cnt < a.cnt THEN -1 ELSE 0 END) AS BIGINT) AS s "
        " FROM dd a JOIN dd b ON a.dow = b.dow AND a.day < b.day), "
        "per AS (SELECT dow, CAST(COUNT(*) AS BIGINT) AS m FROM dd "
        " GROUP BY dow), "
        "tie AS (SELECT dow, CAST(SUM(t * (t - 1) * (2 * t + 5)) "
        "  AS BIGINT) AS tc FROM (SELECT dow, cnt, "
        "  CAST(COUNT(*) AS BIGINT) AS t FROM dd GROUP BY dow, cnt) "
        " GROUP BY dow), "
        "v AS (SELECT CAST(SUM(m * (m - 1) * (2 * m + 5) - tc) AS BIGINT) "
        "  AS var18, CAST(SUM(m) AS BIGINT) AS n "
        " FROM per JOIN tie USING (dow)) "
        "SELECT n AS n_days, s AS s_stat, var18 AS var18_num, "
        "CAST(SIGN(CAST(s AS DOUBLE)) AS INT) AS trend_direction, "
        "printf('%.6f', ROUND(CAST(CASE WHEN s > 0 THEN s - 1 "
        "  WHEN s < 0 THEN s + 1 ELSE 0 END AS DOUBLE) "
        " / SQRT(CAST(var18 AS DOUBLE) / 18.0), 6)) AS smk_z, "
        "(ABS(CAST(CASE WHEN s > 0 THEN s - 1 WHEN s < 0 THEN s + 1 "
        "  ELSE 0 END AS DOUBLE) / SQRT(CAST(var18 AS DOUBLE) / 18.0)) "
        f" > {_Z_95_TWO_SIDED!r}) AS trend_significant_95 "
        "FROM s, v WHERE var18 > 0"
    )


@register("events_mk_seasonal", _smk_sql())
def events_mk_seasonal(spark, sf):
    """Seasonal Mann-Kendall trend test of the daily total-volume
    series with weekday strata (Hirsch-Slack's seasonal form, the
    independent-seasons classical version) — the deseasonalized
    sharpening of ``events_mann_kendall``: only SAME-WEEKDAY day pairs
    are compared, so the weekly rhythm ``events_seasonality`` measures
    cannot masquerade as (or mask) a monotone trend. S and the
    tie-corrected variance are summed across the seven strata.

    Float discipline: S is an exact BIGINT (integer sign comparisons);
    each stratum's variance term m(m-1)(2m+5) - sum t(t-1)(2t+5) is
    exact BIGINT arithmetic and the strata sum stays exact; z is the
    continuity-corrected (S -+ 1)/sqrt(var18/18.0) — the IDENTICAL
    fixed chain as events_mann_kendall (one int->double cast, one
    division by the dyadic-parsed 18.0, one sqrt, one division) under
    ROUND + %.6f; direction is the exact integer sign; the 5% flag
    compares |z| against the inlined published two-sided normal
    literal.

    Scale shape: one map-side-combinable fact collapse to the daily
    grain; the pair self-join keys on the stratum and is bounded by
    7 x (days/7)^2 — calendar-bounded, independent of corpus size."""
    return smk_rollup(day_totals(_events(spark, sf)))


# ------------------------------------------------ record-counting test ----

def records_rollup(dt: DataFrame) -> DataFrame:
    """Fold a (day, cnt) daily-totals grain into the one-row
    record-count readout — shared by ``events_records`` and its
    streaming twin (the strict prefix-extremum contract and the pinned
    harmonic fold live here)."""
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    r = dt.select(
        "cnt",
        F.max("cnt").over(w).alias("pmax"),
        F.min("cnt").over(w).alias("pmin"),
    )
    m = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when(
                F.col("pmax").isNull() | (F.col("cnt") > F.col("pmax")), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("rh"),
        F.sum(
            F.when(
                F.col("pmin").isNull() | (F.col("cnt") < F.col("pmin")), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("rl"),
    )
    hn = F.aggregate(
        F.sequence(F.lit(1), F.col("n").cast("int")),
        F.lit(0.0),
        lambda acc, i: acc + F.lit(1.0) / i.cast("double"),
    )
    return m.filter(F.col("n") >= 1).select(
        F.col("n").alias("n_days"),
        F.col("rh").alias("record_highs"),
        F.col("rl").alias("record_lows"),
        _FMT6(hn).alias("expected_records"),
        (F.col("rh").cast("double") > hn).alias("excess_highs"),
        (F.col("rl").cast("double") > hn).alias("excess_lows"),
    )


def _records_sql() -> str:
    """Build the events_records oracle: prefix-extremum windows, the
    strict integer record counts, and the IDENTICAL ascending harmonic
    fold (list_reduce over a 0.0-prepended 1..n list — the
    kg_resource_allocation fold discipline)."""
    hn = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), range(1, n + 1)), "
        "(s, x) -> s + CAST(1 AS DOUBLE) / CAST(x AS DOUBLE))"
    )
    return (
        "WITH dt AS (SELECT strftime(ts, '%Y-%m-%d') AS day, "
        " CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1), "
        "r AS (SELECT cnt, "
        " MAX(cnt) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING "
        "  AND 1 PRECEDING) AS pmax, "
        " MIN(cnt) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING "
        "  AND 1 PRECEDING) AS pmin FROM dt), "
        "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        " CAST(SUM(CASE WHEN pmax IS NULL OR cnt > pmax THEN 1 ELSE 0 END) "
        "  AS BIGINT) AS rh, "
        " CAST(SUM(CASE WHEN pmin IS NULL OR cnt < pmin THEN 1 ELSE 0 END) "
        "  AS BIGINT) AS rl FROM r) "
        "SELECT n AS n_days, rh AS record_highs, rl AS record_lows, "
        f"printf('%.6f', ROUND({hn}, 6)) AS expected_records, "
        f"(CAST(rh AS DOUBLE) > {hn}) AS excess_highs, "
        f"(CAST(rl AS DOUBLE) > {hn}) AS excess_lows "
        "FROM m WHERE n >= 1"
    )


@register("events_records", _records_sql())
def events_records(spark, sf):
    """Record-counting randomness test on the daily total-volume
    series — the extreme-value member of the randomness family
    (``events_runs_test`` watches sign regimes, ``events_turning_points``
    watches local shape; records watch the FRONTIER: a drifting series
    keeps setting new highs long after an i.i.d. one has gone quiet).
    Counts strict record highs and lows (the first day is both, the
    classical convention); under i.i.d. the expected record count is
    the harmonic number H_n regardless of the distribution — one of
    the few exact distribution-free results in statistics.

    Float discipline: record counts are exact integers (strict integer
    comparisons against prefix extrema; ties are not records — both
    engines apply the identical predicate); H_n = sum 1/i is a PINNED
    ascending fold over the integer sequence 1..n (Spark
    ``aggregate(sequence(1, n))`` == DuckDB ``list_reduce`` over the
    0.0-prepended ``range`` — the kg_resource_allocation fold
    discipline: identical term order, each step one correctly-rounded
    IEEE add/divide) under ROUND + %.6f; the excess flags compare the
    exact integer counts against the identically-computed H_n.

    Scale shape: one map-side-combinable fact collapse to the daily
    grain (shared ``day_totals``), one prefix-extremum window plus a
    one-row aggregate over the dimension-sized day table; the harmonic
    fold is O(days) on one row."""
    return records_rollup(day_totals(_events(spark, sf)))


# --------------------------------------------------------- Quade test ----

def quade_rollup(dt: DataFrame) -> DataFrame:
    """Fold a (day, cnt) daily-totals grain into the one-row Quade
    readout — shared by ``events_quade`` and its streaming twin (the
    quadrupled-score integer contract lives here, over the shared
    ``week_dow_ranks`` cell grain)."""
    j = week_dow_ranks(dt)
    rng = j.groupBy("week").agg(
        (F.max("cnt") - F.min("cnt")).cast("long").alias("rg")
    )
    g = rng.groupBy("rg").agg(F.count(F.lit(1)).cast("long").alias("t"))
    wcum = Window.orderBy("rg").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dq = g.select(
        "rg",
        (2 * F.sum("t").over(wcum).cast("long") - F.col("t") + 1).alias(
            "dq"
        ),
    )
    wq = rng.join(F.broadcast(dq), "rg").select("week", "dq")
    s2 = j.join(F.broadcast(wq), "week").select(
        "week",
        "dow",
        (F.col("dq") * (F.col("dr") - 8)).cast("long").alias("s2"),
    )
    tj = s2.groupBy("dow").agg(F.sum("s2").cast("long").alias("tj"))
    a2 = s2.agg(
        F.sum(F.col("s2") * F.col("s2")).cast("long").alias("a2"),
        F.countDistinct("week").cast("long").alias("b"),
    )
    st = tj.agg(F.sum(F.col("tj") * F.col("tj")).cast("long").alias("st"))
    m = a2.crossJoin(F.broadcast(st))
    b, A2, sT = F.col("b"), F.col("a2"), F.col("st")
    num = (b - 1) * sT
    den = b * A2 - sT
    return m.filter((b >= 2) & (den > 0)).select(
        b.alias("n_weeks"),
        num.alias("quade_num"),
        den.alias("quade_den"),
        _FMT6(num.cast("double") / den.cast("double")).alias("quade_f"),
    )


def _quade_sql() -> str:
    """Build the events_quade oracle: the friedman blocked-midrank CTE
    chain, per-week range midranks, the quadrupled scores S2 =
    dQ*(dr-8), and the all-integer F ratio (b-1)*ΣT² / (b*ΣS² - ΣT²)."""
    return (
        "WITH dt AS (SELECT strftime(ts, '%Y-%m-%d') AS day, "
        " CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1), "
        "dd AS (SELECT cnt, "
        " (CAST(day AS DATE) - DATE '2024-01-01') // 7 AS week, "
        " (CAST(day AS DATE) - DATE '2024-01-01') % 7 AS dow FROM dt), "
        "cw AS (SELECT week FROM dd GROUP BY week HAVING COUNT(*) = 7), "
        "db AS (SELECT dd.* FROM dd JOIN cw ON dd.week = cw.week), "
        "g AS (SELECT week, cnt, CAST(COUNT(*) AS BIGINT) AS t FROM db "
        " GROUP BY 1, 2), "
        "r AS (SELECT week, cnt, 2 * CAST(SUM(t) OVER (PARTITION BY week "
        " ORDER BY cnt ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
        " AS BIGINT) - t + 1 AS dr FROM g), "
        "j AS (SELECT db.week, db.dow, r.dr FROM db "
        " JOIN r ON db.week = r.week AND db.cnt = r.cnt), "
        "rng AS (SELECT week, CAST(MAX(cnt) - MIN(cnt) AS BIGINT) AS rg "
        " FROM db GROUP BY week), "
        "rg_g AS (SELECT rg, CAST(COUNT(*) AS BIGINT) AS t FROM rng "
        " GROUP BY rg), "
        "rq AS (SELECT rg, 2 * CAST(SUM(t) OVER (ORDER BY rg "
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
        " - t + 1 AS dq FROM rg_g), "
        "wq AS (SELECT week, dq FROM rng JOIN rq USING (rg)), "
        "s2 AS (SELECT j.week, j.dow, "
        "  CAST(wq.dq * (j.dr - 8) AS BIGINT) AS s2 "
        " FROM j JOIN wq ON wq.week = j.week), "
        "tj AS (SELECT dow, CAST(SUM(s2) AS BIGINT) AS tj FROM s2 "
        " GROUP BY dow), "
        "a2 AS (SELECT CAST(SUM(s2 * s2) AS BIGINT) AS a2, "
        "  CAST(COUNT(DISTINCT week) AS BIGINT) AS b FROM s2), "
        "st AS (SELECT CAST(SUM(tj * tj) AS BIGINT) AS st FROM tj) "
        "SELECT b AS n_weeks, (b - 1) * st AS quade_num, "
        "b * a2 - st AS quade_den, "
        "printf('%.6f', ROUND(CAST((b - 1) * st AS DOUBLE) "
        " / CAST(b * a2 - st AS DOUBLE), 6)) AS quade_f "
        "FROM a2, st WHERE b >= 2 AND b * a2 - st > 0"
    )


@register("events_quade", _quade_sql())
def events_quade(spark, sf):
    """Quade test of a weekday effect with calendar weeks as blocks —
    the RANGE-WEIGHTED sibling of ``events_friedman`` (Friedman gives
    every week one vote; Quade weights each week by the rank of its
    own within-week spread, so weeks where the weekday effect is LARGE
    in absolute terms dominate — the blocked test with more power at
    small treatment counts, per Conover). S_ij = Q_i*(r_ij - (k+1)/2)
    with Q_i the rank of week i's range; the statistic is the F ratio
    (b-1)*B/(A-B).

    Float discipline: with doubled midranks everywhere (within-week
    dr, across-week range midranks dQ — both the events_spearman
    trick) the quadrupled score S2 = dQ*(dr - 8) is an exact BIGINT
    ((k+1)/2 = 4 is an integer for k=7, so no half ever appears); the
    scale factors cancel in the F ratio, which respells to the
    all-integer (b-1)*ΣT_j² / (b*ΣS² - ΣT_j²) — ONE correctly-rounded
    IEEE division under ROUND + %.6f, numerator and denominator
    emitted exactly. Degenerate corpora (one week, or all scores in
    the treatment sums) are filtered by identical integer guards.

    Scale shape: identical to ``events_friedman`` — one fact collapse
    to the calendar-day grain (shared ``week_dow_ranks``); the range
    midranks live at week scale (broadcast back); everything else is
    dimension-sized (weeks × 7)."""
    return quade_rollup(day_totals(_events(spark, sf)))


# ------------------------------------------------- ACF profile curve ----

def acf_profile_rollup(dt: DataFrame) -> DataFrame:
    """Fold a (day, cnt) daily-totals grain into the 7-row ACF profile
    (lags 1..7) — shared by ``events_acf_profile`` and its streaming
    twin (the n-scaled exact-autocovariance contract of ``acv_rollup``
    generalized to a per-lag table)."""
    w = Window.orderBy("day")
    tot = dt.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cnt").cast("long").alias("s"),
    )
    d = (
        dt.crossJoin(F.broadcast(tot))
        .select(
            "n",
            F.row_number().over(w).alias("rn"),
            (F.col("n") * F.col("cnt") - F.col("s"))
            .cast("decimal(38,0)")
            .alias("d"),
        )
        .localCheckpoint()
    )
    c0 = d.agg(F.sum(F.col("d") * F.col("d")).alias("c0"))
    lags = d.sparkSession.range(1, 8).select(
        F.col("id").cast("long").alias("lag")
    )
    right = d.select(
        F.col("rn").alias("rn2"), F.col("d").alias("d2")
    )
    ck = (
        d.crossJoin(F.broadcast(lags))
        .join(
            right,
            F.col("rn2") == F.col("rn") - F.col("lag"),
        )
        .groupBy("lag")
        .agg(
            F.max("n").alias("n"),
            F.sum(F.col("d") * F.col("d2")).alias("ck"),
        )
    )
    j = ck.crossJoin(F.broadcast(c0))
    r = F.col("ck").cast("double") / F.col("c0").cast("double")
    band = F.lit(2.0) / F.sqrt(F.col("n").cast("double"))
    return (
        j.filter((F.col("n") >= 8) & (F.col("c0") > 0))
        .select(
            "lag",
            F.col("ck").cast("long").alias("acv"),
            _FMT6(r).alias("r"),
            (F.abs(r) > band).alias("outside_band"),
        )
    )


def _acf_profile_sql() -> str:
    """Build the events_acf_profile oracle: the n-scaled deviation
    grain, a lag table joined on row offsets, per-lag exact HUGEINT
    products, and the identical one-division readout with the
    2/sqrt(n) white-noise band."""
    return (
        "WITH dt AS (SELECT strftime(ts, '%Y-%m-%d') AS day, "
        " CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1), "
        "tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        " CAST(SUM(cnt) AS BIGINT) AS s FROM dt), "
        "d AS (SELECT n, ROW_NUMBER() OVER (ORDER BY day) AS rn, "
        " CAST(n * cnt - s AS HUGEINT) AS dv FROM dt, tot), "
        "c0 AS (SELECT CAST(SUM(dv * dv) AS HUGEINT) AS c0 FROM d), "
        "lags AS (SELECT unnest(generate_series(1, 7)) AS lag), "
        "ck AS (SELECT lag, MAX(a.n) AS n, "
        "  CAST(SUM(a.dv * b.dv) AS HUGEINT) AS ck "
        " FROM d a CROSS JOIN lags JOIN d b ON b.rn = a.rn - lag "
        " GROUP BY lag) "
        "SELECT lag, CAST(ck AS BIGINT) AS acv, "
        "printf('%.6f', ROUND(CAST(ck AS DOUBLE) / CAST(c0 AS DOUBLE), 6)) "
        " AS r, "
        "(ABS(CAST(ck AS DOUBLE) / CAST(c0 AS DOUBLE)) "
        " > CAST(2 AS DOUBLE) / SQRT(CAST(n AS DOUBLE))) AS outside_band "
        "FROM ck, c0 WHERE n >= 8 AND c0 > 0"
    )


@register("events_acf_profile", _acf_profile_sql())
def events_acf_profile(spark, sf):
    """Autocorrelation profile of the daily total-volume series at lags
    1..7 — the full correlogram the per-lag keys sample
    (``events_autocorr`` reads lag 1 per type, ``events_pacf`` lags
    1-2 of the total): the 7-lag window spans one full week, so a
    weekly rhythm shows up as a spike at lag 7 while momentum decays
    smoothly from lag 1 — the plot every forecasting postmortem opens
    with, as a table. Each lag carries the +-2/sqrt(n) white-noise
    band flag (the Bartlett large-sample band every stats package
    draws).

    Float discipline: the lag-k autocovariances C_k reuse the
    ``acv_rollup`` n-scaling (d_t = n*x_t - S exact, products exact
    DECIMAL(38,0)/HUGEINT; the n^2 cancels in r_k); each r_k is ONE
    correctly-rounded IEEE division under ROUND + %.6f, with the exact
    integer C_k emitted alongside; the band flag compares |r_k|
    against 2/sqrt(n) — both sides computed with the identical op
    chain on both engines.

    Scale shape: one map-side-combinable fact collapse to the daily
    grain (shared ``day_totals``), a localCheckpointed deviation grain
    joined against the TINY 7-row lag table on row offsets (days x 7
    rows — dimension scale), one per-lag aggregate."""
    return acf_profile_rollup(day_totals(_events(spark, sf)))


# ------------------------------------------------ randomness macro ----

def randomness_report_rollup(dt: DataFrame) -> DataFrame:
    """Fold a (day, cnt) daily-totals grain into the one-row
    randomness report — shared by ``macro_randomness_report`` and its
    streaming twin (composes the shared ``runs_rollup``,
    ``turning_rollup`` and ``records_rollup``; each readout keeps its
    per-key contract exactly)."""
    dt = dt.localCheckpoint()
    runs = runs_rollup(dt).select(
        F.col("n_runs").alias("n_runs"), F.col("z").alias("runs_z")
    )
    tp = turning_rollup(dt).select(
        "n_days",
        "n_turning",
        F.col("tp_z").alias("tp_z"),
        F.col("nonrandom_95").alias("tp_nonrandom_95"),
    )
    rec = records_rollup(dt).select(
        "record_highs",
        "record_lows",
        "expected_records",
        "excess_highs",
        "excess_lows",
    )
    return (
        tp.crossJoin(F.broadcast(runs)).crossJoin(F.broadcast(rec))
    )


def _randomness_report_sql() -> str:
    """Compose the three randomness oracles over ONE shared day-totals
    CTE with disjoint names (the macro_serial_report discipline):
    the runs chain (rg/rr/rm), the turning chain (tl/tm), and the
    records chain (rc/rm2) with the pinned harmonic fold."""
    hn = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), range(1, tm.n + 1)), "
        "(s, x) -> s + CAST(1 AS DOUBLE) / CAST(x AS DOUBLE))"
    )
    return (
        "WITH dt AS (SELECT strftime(ts, '%Y-%m-%d') AS day, "
        " CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1), "
        "mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM dt), "
        # runs chain (the macro_daily_health spelling)
        "g AS (SELECT cnt, CAST(COUNT(*) AS BIGINT) AS k FROM dt "
        " GROUP BY cnt), "
        "cu AS (SELECT cnt, CAST(SUM(k) OVER (ORDER BY cnt "
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
        " AS cum FROM g), "
        "med AS (SELECT MIN(cnt) AS med FROM cu, mm WHERE cum >= "
        " (n + 1) // 2), "
        "sg AS (SELECT day, CASE WHEN cnt > med THEN 1 ELSE -1 END AS sgn "
        " FROM dt, med WHERE cnt <> med), "
        "rr AS (SELECT sgn, LAG(sgn) OVER (ORDER BY day) AS prev FROM sg), "
        "rm AS (SELECT "
        " CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1, "
        " CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n2, "
        " CAST(1 + SUM(CASE WHEN prev IS NOT NULL AND sgn <> prev "
        "  THEN 1 ELSE 0 END) AS BIGINT) AS runs FROM rr), "
        # turning chain
        "tl AS (SELECT cnt, LAG(cnt) OVER (ORDER BY day) AS prev, "
        " LEAD(cnt) OVER (ORDER BY day) AS next FROM dt), "
        "tm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        " CAST(SUM(CASE WHEN prev IS NOT NULL AND next IS NOT NULL AND "
        "  ((prev < cnt AND next < cnt) OR (prev > cnt AND next > cnt)) "
        "  THEN 1 ELSE 0 END) AS BIGINT) AS t FROM tl), "
        # records chain
        "rc AS (SELECT cnt, "
        " MAX(cnt) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING "
        "  AND 1 PRECEDING) AS pmax, "
        " MIN(cnt) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING "
        "  AND 1 PRECEDING) AS pmin FROM dt), "
        "rm2 AS (SELECT "
        " CAST(SUM(CASE WHEN pmax IS NULL OR cnt > pmax THEN 1 ELSE 0 END) "
        "  AS BIGINT) AS rh, "
        " CAST(SUM(CASE WHEN pmin IS NULL OR cnt < pmin THEN 1 ELSE 0 END) "
        "  AS BIGINT) AS rl FROM rc) "
        "SELECT tm.n AS n_days, tm.t AS n_turning, "
        "printf('%.6f', ROUND(CAST(90 * tm.t - 60 * (tm.n - 2) AS DOUBLE) "
        " / SQRT(CAST(90 * (16 * tm.n - 29) AS DOUBLE)), 6)) AS tp_z, "
        "(ABS(CAST(90 * tm.t - 60 * (tm.n - 2) AS DOUBLE) "
        " / SQRT(CAST(90 * (16 * tm.n - 29) AS DOUBLE))) "
        f" > {_Z_95_TWO_SIDED!r}) AS tp_nonrandom_95, "
        "runs AS n_runs, "
        "printf('%.6f', ROUND((CAST(runs AS DOUBLE) "
        " - (1.0 + CAST(2 * n1 * n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))) "
        " / SQRT(CAST(2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) AS DOUBLE) "
        "   / CAST((n1 + n2) * (n1 + n2) * (n1 + n2 - 1) AS DOUBLE)), 6)) "
        " AS runs_z, "
        "rh AS record_highs, rl AS record_lows, "
        f"printf('%.6f', ROUND({hn}, 6)) AS expected_records, "
        f"(CAST(rh AS DOUBLE) > {hn}) AS excess_highs, "
        f"(CAST(rl AS DOUBLE) > {hn}) AS excess_lows "
        "FROM rm, tm, rm2 "
        "WHERE tm.n >= 3 AND n1 > 0 AND n2 > 0 AND 2 * n1 * n2 > n1 + n2"
    )


@register("macro_randomness_report", _randomness_report_sql())
def macro_randomness_report(spark, sf):
    """One-row randomness report of the daily volume series — the
    i.i.d. pre-flight's OTHER half (``macro_serial_report`` reads the
    correlation structure; this one reads the distribution-free
    randomness tests), composing the family's three classical checks
    over ONE shared ``day_totals`` grain: the runs test (sign regimes
    about the median), the turning-point test (local shape), and the
    record counts against their exact harmonic-number expectation.
    Green here pins the COMPOSITION: the oracle re-derives all three
    chains from one day-totals CTE with disjoint names.

    Float discipline: each readout keeps its per-key contract exactly
    (the fixed runs z chain, the respelled turning z, the pinned
    ascending harmonic fold, integer-guarded degenerate cases);
    nothing new is introduced by composition.

    Scale shape: one map-side-combinable fact collapse to the calendar
    day grain (localCheckpointed so the three rollups share ONE
    materialization); every downstream stage is dimension-sized."""
    return randomness_report_rollup(day_totals(_events(spark, sf)))


# --------------------------------------------- cross-correlation (CCF) ----

def ccf_rollup(dt2: DataFrame) -> DataFrame:
    """Fold a (day, x, y) two-series daily grain into the 7-row
    cross-correlogram (lags -3..+3) — shared by
    ``events_cross_correlation`` and its streaming twin (the two-series
    n-scaled exact-covariance contract lives here). x = purchases,
    y = clicks; positive lag = x leads (today's x pairs with y lag
    days LATER)."""
    w = Window.orderBy("day")
    tot = dt2.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
    )
    d = (
        dt2.crossJoin(F.broadcast(tot))
        .select(
            "n",
            F.row_number().over(w).alias("rn"),
            (F.col("n") * F.col("x") - F.col("sx"))
            .cast("decimal(38,0)")
            .alias("dx"),
            (F.col("n") * F.col("y") - F.col("sy"))
            .cast("decimal(38,0)")
            .alias("dy"),
        )
        .localCheckpoint()
    )
    c0 = d.agg(
        F.sum(F.col("dx") * F.col("dx")).alias("c0x"),
        F.sum(F.col("dy") * F.col("dy")).alias("c0y"),
    )
    lags = d.sparkSession.range(-3, 4).select(
        F.col("id").cast("long").alias("lag")
    )
    right = d.select(F.col("rn").alias("rn2"), F.col("dy").alias("dy2"))
    ck = (
        d.crossJoin(F.broadcast(lags))
        .join(right, F.col("rn2") == F.col("rn") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.max("n").alias("n"),
            F.sum(F.col("dx") * F.col("dy2")).alias("ck"),
        )
    )
    j = ck.crossJoin(F.broadcast(c0))
    r = F.col("ck").cast("double") / F.sqrt(
        (F.col("c0x") * F.col("c0y")).cast("double")
    )
    band = F.lit(2.0) / F.sqrt(F.col("n").cast("double"))
    return (
        j.filter(
            (F.col("n") >= 8) & (F.col("c0x") > 0) & (F.col("c0y") > 0)
        )
        .select(
            "lag",
            F.col("ck").cast("long").alias("ccov"),
            _FMT6(r).alias("r"),
            (F.abs(r) > band).alias("outside_band"),
        )
    )


def purchase_click_days(df: DataFrame) -> DataFrame:
    """(day, x, y) per-day purchase/click counts over the UNION of
    active days (a day with only one type counts 0 for the other) —
    the shared two-series grain for ``events_cross_correlation`` and
    its streaming twin (plain SUMs, exactly mergeable)."""
    return (
        df.filter(F.col("event_type").isin("purchase", "click"))
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("long")
            .alias("x"),
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            )
            .cast("long")
            .alias("y"),
        )
    )


def _ccf_sql() -> str:
    """Build the events_cross_correlation oracle: the two-series daily
    grain, n-scaled exact deviations of both series, a lag table
    joined on row offsets, and the identical
    one-sqrt-of-product-one-division readout."""
    return (
        "WITH dt2 AS (SELECT strftime(ts, '%Y-%m-%d') AS day, "
        " CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) "
        "  AS BIGINT) AS x, "
        " CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) "
        "  AS BIGINT) AS y "
        " FROM events WHERE event_type IN ('purchase', 'click') "
        " GROUP BY 1), "
        "tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        " CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy "
        " FROM dt2), "
        "d AS (SELECT n, ROW_NUMBER() OVER (ORDER BY day) AS rn, "
        " CAST(n * x - sx AS HUGEINT) AS dx, "
        " CAST(n * y - sy AS HUGEINT) AS dy FROM dt2, tot), "
        "c0 AS (SELECT CAST(SUM(dx * dx) AS HUGEINT) AS c0x, "
        " CAST(SUM(dy * dy) AS HUGEINT) AS c0y FROM d), "
        "lags AS (SELECT unnest(generate_series(-3, 3)) AS lag), "
        "ck AS (SELECT lag, MAX(a.n) AS n, "
        "  CAST(SUM(a.dx * b.dy) AS HUGEINT) AS ck "
        " FROM d a CROSS JOIN lags JOIN d b ON b.rn = a.rn + lag "
        " GROUP BY lag) "
        "SELECT lag, CAST(ck AS BIGINT) AS ccov, "
        "printf('%.6f', ROUND(CAST(ck AS DOUBLE) "
        " / SQRT(CAST(c0x * c0y AS DOUBLE)), 6)) AS r, "
        "(ABS(CAST(ck AS DOUBLE) / SQRT(CAST(c0x * c0y AS DOUBLE))) "
        " > CAST(2 AS DOUBLE) / SQRT(CAST(n AS DOUBLE))) AS outside_band "
        "FROM ck, c0 WHERE n >= 8 AND c0x > 0 AND c0y > 0"
    )


@register("events_cross_correlation", _ccf_sql())
def events_cross_correlation(spark, sf):
    """Cross-correlogram between the daily purchase and click series at
    lags -3..+3 — the LEAD-LAG diagnostic next to
    ``events_acf_profile``'s within-series correlogram: a peak at a
    positive lag means purchases lead clicks by that many days, at a
    negative lag that clicks lead purchases (the browse-today-buy-
    tomorrow signature every funnel model assumes — here measured, not
    assumed). Days missing one type count 0 for it (the union-of-days
    grain), so the two series share one time index by construction.

    Float discipline: both series' deviations are n-scaled exact
    integers (the ``acv_rollup`` trick on a two-column grain), so
    every cross-product sum C_xy(k) and both denominators C0x/C0y are
    exact DECIMAL(38,0)/HUGEINT; r_k = C_xy(k)/sqrt(C0x*C0y) is ONE
    sqrt of an exact integer product and ONE IEEE division under
    ROUND + %.6f, the exact integer cross-covariance emitted
    alongside; the Bartlett band flag compares |r_k| against
    2/sqrt(n) with the identical op chain on both engines.

    Scale shape: one map-side-combinable fact collapse to the
    two-column daily grain (shared ``purchase_click_days``), a
    localCheckpointed deviation grain joined against the broadcast
    7-row lag table on row offsets, one per-lag aggregate — the
    events_acf_profile plan with a second measure column."""
    return ccf_rollup(purchase_click_days(_events(spark, sf)))


# ------------------------------------- interrupted time series (ITS) ----

def its_rollup(dt: DataFrame) -> DataFrame:
    """Fold a (day, cnt) daily-totals grain into the one-row
    interrupted-time-series readout (segmented OLS around the fixed
    Jan-16 cut) — shared by ``events_interrupted_ts`` and its
    streaming twin (the exact-determinant contract lives here)."""
    anchor = F.lit("2024-01-01").cast("date")
    cut = 15  # Jan-16, the paired_prepost cut
    dd = dt.select(
        F.datediff(F.to_date("day"), anchor).cast("long").alias("t"),
        F.col("cnt").cast("long").alias("y"),
    )

    def seg(c, local):
        s = c.select(
            (F.col("t") - local).alias("s"), F.col("y")
        )
        return s.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("s").cast("long").alias("st"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("s") * F.col("s")).cast("long").alias("stt"),
            F.sum(F.col("s") * F.col("y")).cast("long").alias("sty"),
        )

    pre = seg(dd.filter(F.col("t") < cut), 0)
    post = seg(dd.filter(F.col("t") >= cut), cut)
    p = pre.select(*[F.col(c).alias(f"{c}1") for c in pre.columns])
    q = post.select(*[F.col(c).alias(f"{c}2") for c in post.columns])
    j = p.crossJoin(F.broadcast(q))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    n1, st1, sy1 = F.col("n1"), F.col("st1"), F.col("sy1")
    stt1, sty1 = F.col("stt1"), F.col("sty1")
    n2, st2, sy2 = F.col("n2"), F.col("st2"), F.col("sy2")
    stt2, sty2 = F.col("stt2"), F.col("sty2")
    d1 = dec(n1 * stt1 - st1 * st1)
    d2 = dec(n2 * stt2 - st2 * st2)
    nb1 = dec(n1 * sty1 - st1 * sy1)
    nb2 = dec(n2 * sty2 - st2 * sy2)
    p1 = dec(sy1 * stt1 - st1 * sty1) + F.lit(cut) * nb1
    p2 = dec(sy2 * stt2 - st2 * sty2)
    return (
        j.filter((d1 > 0) & (d2 > 0))
        .select(
            n1.alias("n_pre"),
            n2.alias("n_post"),
            _FMT6(nb1.cast("double") / d1.cast("double")).alias(
                "slope_pre"
            ),
            _FMT6(nb2.cast("double") / d2.cast("double")).alias(
                "slope_post"
            ),
            _FMT6(
                (p2 * d1 - p1 * d2).cast("double")
                / (d1 * d2).cast("double")
            ).alias("level_jump"),
            _FMT6(
                (nb2 * d1 - nb1 * d2).cast("double")
                / (d1 * d2).cast("double")
            ).alias("slope_change"),
        )
    )


def _its_sql() -> str:
    """Build the events_interrupted_ts oracle: per-segment exact OLS
    moments (post re-indexed at the cut), determinant ratios, and the
    cross-multiplied jump/slope-change — each ONE division."""
    seg = (
        "SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(s) AS BIGINT) AS st, CAST(SUM(y) AS BIGINT) AS sy, "
        "CAST(SUM(s * s) AS BIGINT) AS stt, "
        "CAST(SUM(s * y) AS BIGINT) AS sty FROM {src}"
    )
    return (
        "WITH dt AS (SELECT strftime(ts, '%Y-%m-%d') AS day, "
        " CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1), "
        "dd AS (SELECT CAST(CAST(day AS DATE) - DATE '2024-01-01' "
        "  AS BIGINT) AS t, cnt AS y FROM dt), "
        "pre AS (" + seg.format(
            src="(SELECT t AS s, y FROM dd WHERE t < 15)"
        ) + "), "
        "post AS (" + seg.format(
            src="(SELECT t - 15 AS s, y FROM dd WHERE t >= 15)"
        ) + "), "
        "m AS (SELECT "
        " CAST(pre.n * pre.stt - pre.st * pre.st AS HUGEINT) AS d1, "
        " CAST(post.n * post.stt - post.st * post.st AS HUGEINT) AS d2, "
        " CAST(pre.n * pre.sty - pre.st * pre.sy AS HUGEINT) AS nb1, "
        " CAST(post.n * post.sty - post.st * post.sy AS HUGEINT) AS nb2, "
        " CAST(pre.sy * pre.stt - pre.st * pre.sty AS HUGEINT) "
        "  + 15 * CAST(pre.n * pre.sty - pre.st * pre.sy AS HUGEINT) "
        "  AS p1, "
        " CAST(post.sy * post.stt - post.st * post.sty AS HUGEINT) AS p2, "
        " pre.n AS n_pre, post.n AS n_post FROM pre, post) "
        "SELECT n_pre, n_post, "
        "printf('%.6f', ROUND(CAST(nb1 AS DOUBLE) / CAST(d1 AS DOUBLE), "
        " 6)) AS slope_pre, "
        "printf('%.6f', ROUND(CAST(nb2 AS DOUBLE) / CAST(d2 AS DOUBLE), "
        " 6)) AS slope_post, "
        "printf('%.6f', ROUND(CAST(p2 * d1 - p1 * d2 AS DOUBLE) "
        " / CAST(d1 * d2 AS DOUBLE), 6)) AS level_jump, "
        "printf('%.6f', ROUND(CAST(nb2 * d1 - nb1 * d2 AS DOUBLE) "
        " / CAST(d1 * d2 AS DOUBLE), 6)) AS slope_change "
        "FROM m WHERE d1 > 0 AND d2 > 0"
    )


@register("events_interrupted_ts", _its_sql())
def events_interrupted_ts(spark, sf):
    """Interrupted-time-series (segmented regression) analysis of the
    daily volume around the fixed Jan-16 cut — the causal-inference
    workhorse next to ``events_did`` (DiD needs a control group; ITS
    needs only the series' own pre-period trend): fit OLS level+trend
    separately before and after the cut and read the LEVEL JUMP and
    SLOPE CHANGE at the intervention — the two coefficients every
    policy/launch postmortem quotes. The post segment is re-indexed at
    the cut so its intercept IS the post level there; the pre
    prediction is extrapolated one step to the same point.

    Float discipline: per-segment OLS is the events_trend contract —
    five exact BIGINT moments, slope = (n*Sty - St*Sy)/D with
    determinant D = n*Stt - St² exact; the level jump respells as
    (P2*D1 - P1*D2)/(D1*D2) with P1 = (Sy*Stt - St*Sty) + cut*(n*Sty -
    St*Sy) — ALL exact DECIMAL(38,0)/HUGEINT integers (cross products
    < 10^15 at every test SF) — so jump and slope change are each ONE
    correctly-rounded IEEE division under ROUND + %.6f. Degenerate
    segments (< 2 distinct days) are filtered by the identical
    integer determinant guards.

    Scale shape: one map-side-combinable fact collapse to the daily
    grain (shared ``day_totals``), two single-row segment aggregates,
    one 1x1 join — facts touched once."""
    return its_rollup(day_totals(_events(spark, sf)))
