"""Distributed statistics: exact `percentile_disc`-style quantiles
without a global sort, and a deterministic distinct-count sketch
(fixed-threshold hash sampling).

Spark's built-ins offer `percentile_approx` (sketch, not exact) or
`percentile` (exact but funnels values through a single aggregation
buffer per group). Neither is the shape you want on 100 TB when the
value DOMAIN is bounded (lengths, scores, integer cents): aggregate
to a (value, count) table first — the map-side combine collapses the
row count to the number of DISTINCT values — then run the rank
selection over that small table. One shuffle keyed by value, heavy
partial aggregation, and the only ordered pass is a window over
distinct values (thousands of rows), never over the data.

Semantics pinned for cross-engine replay: quantile q (permille, an
integer — no float thresholds anywhere) selects the value at
1-indexed rank ceil(q * n / 1000) of the sorted multiset, i.e. the
smallest value whose running count reaches the rank — exactly SQL's
`percentile_disc`. All arithmetic is integer, so a DuckDB mirror
replaying the same window-cumsum rule matches bit-for-bit.

For continuous domains (floats with ~n distinct values) bin or round
first — the (value, count) table is only small when the domain is.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _shl(col: Column, n: Column) -> Column:
    # F.shiftleft/F.shiftright only accept a LITERAL int shift amount;
    # the SQL builtins take a column — call_function routes to those
    return F.call_function("shiftleft", col, n)


def _shr(col: Column, n: Column) -> Column:
    return F.call_function("shiftright", col, n)


def sketch_distinct(
    df: DataFrame,
    value_col: str,
    by: list[str] | None = None,
    prefix_zeros: int = 2,
) -> DataFrame:
    """Distinct-count ESTIMATE via fixed-threshold hash sampling (the
    bottom-theta / KMV family): keep a value iff its md5 hex digest
    starts with ``prefix_zeros`` zeros (a deterministic
    16^-prefix_zeros Bernoulli sample of the DISTINCT DOMAIN —
    duplicates share their value's hash, so the keep/drop decision is
    per distinct value, not per row), count the distinct survivors
    exactly, and scale back up.

    Why this shape at 100 TB: exact ``countDistinct`` shuffles every
    distinct value; the hash-prefix filter drops (1 - 16^-z) of the
    domain BEFORE the shuffle — a plain predicate, fully map-side —
    so the distinct aggregation runs over a table 16^z times smaller.
    Standard error ≈ 1/sqrt(n_kept) (binomial). Deterministic (md5 of
    the UTF-8 bytes, no RNG, retry-invariant) and exactly replayable
    in any engine with md5: comparing a fixed-width hex PREFIX equals
    comparing the hash numerically, so the DuckDB mirror is
    ``substring(md5(x), 1, z) = '00…'`` — no integer conversion to
    disagree on.

    Returns ``(*by, n_kept, distinct_est)`` with
    ``distinct_est = n_kept * 16^prefix_zeros``.
    """
    if not (1 <= prefix_zeros <= 8):
        raise ValueError("prefix_zeros must be in [1, 8]")
    by = list(by or [])
    zeros = "0" * prefix_zeros
    kept = df.filter(F.col(value_col).isNotNull()).filter(
        F.substring(
            F.md5(F.encode(F.col(value_col), "UTF-8")), 1, prefix_zeros
        )
        == zeros
    )
    scale = 16 ** prefix_zeros
    agg = kept.groupBy(*by).agg(
        F.countDistinct(value_col).alias("n_kept")
    )
    return agg.select(
        *by,
        "n_kept",
        (F.col("n_kept") * F.lit(scale)).cast("long").alias("distinct_est"),
    )


def hdr_bucket(col: Column, sub_bits: int = 4) -> Column:
    """Log-linear histogram bucket id for a POSITIVE integer value —
    the DDSketch/HDR-histogram family: base-2 exponent buckets, each
    split into ``2**sub_bits`` equal linear sub-buckets, giving a
    guaranteed relative error ≤ 2**-sub_bits at any scale with a
    bucket count that grows with log(max), not with n.

    The exponent is derived from ``log2`` but SELF-CORRECTED with
    exact integer comparisons (shiftleft), so a ±1-ulp disagreement
    between Java's and C's log2 at a power-of-two boundary can never
    flip the bucket — the expression is bit-portable across engines
    by construction, which is what lets the DuckDB oracle replay it
    verbatim.

    bucket = e * 2**sub_bits + ((v - 2**e) * 2**sub_bits div 2**e),
    with e = floor(log2(v)); the sub-bucket term is computed as pure
    shifts, exact for every int64 input.
    """
    if not (0 <= sub_bits <= 8):
        raise ValueError("sub_bits must be in [0, 8]")
    v = col.cast("long")
    one = F.lit(1).cast("long")
    # clamp into [0, 62] BEFORE correcting: float log2 of values near
    # 2**63 rounds UP to 63.0, and an uncorrected 1<<63 / 1<<64 either
    # goes negative or wraps (Java masks shift amounts mod 64) — the
    # true exponent of any positive int64 is at most 62, so the clamp
    # loses nothing and keeps every shift in range
    e0 = F.least(
        F.greatest(F.floor(F.log2(v)).cast("int"), F.lit(0)), F.lit(62)
    )
    e = (
        F.when((e0 < 62) & (_shl(one, e0 + 1) <= v), e0 + 1)
        .when(_shl(one, e0) > v, e0 - 1)
        .otherwise(e0)
    )
    lo = _shl(one, e)
    # (v - lo) * 2**sub_bits div 2**e as pure shifts — exact long
    # arithmetic for EVERY int64 input (a double division would lose
    # exactness past 2**53)
    sub = (
        F.when(e >= sub_bits, _shr(v - lo, e - F.lit(sub_bits)))
        .otherwise(_shl(v - lo, F.lit(sub_bits) - e))
        .cast("long")
    )
    return (e.cast("long") * F.lit(1 << sub_bits) + sub).alias("bucket")


def hdr_sketch(
    df: DataFrame,
    value_col: str,
    by: list[str] | None = None,
    sub_bits: int = 4,
) -> DataFrame:
    """Build the mergeable quantile sketch: one hash aggregate keyed by
    (group, bucket) — map-side combine collapses 100 TB of rows to at
    most ~``63 * 2**sub_bits`` buckets per group BEFORE the shuffle,
    and two sketches (per partition, per day, per cluster) merge by
    adding counts, which is exactly what makes this the scale path
    where ``exact_quantiles`` (distinct-VALUE table) stops being small.

    Values must be ≥ 1 (integers — use cents for money); NULLs and
    non-positives are dropped, mirroring percentile_disc's NULL rule.

    Returns ``(*by, bucket, cnt)``.
    """
    by = list(by or [])
    v = F.col(value_col).cast("long")
    return (
        df.filter(v >= 1)
        .select(*by, hdr_bucket(v, sub_bits).alias("bucket"))
        .groupBy(*by, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hdr_quantiles(
    sketch: DataFrame,
    qs_permille: list[int],
    by: list[str] | None = None,
    sub_bits: int = 4,
) -> DataFrame:
    """Answer quantile queries from an ``hdr_sketch``: per-group window
    cumsum over the (tiny) bucket table, same integer rank rule as
    ``exact_quantiles`` (smallest bucket whose cumulative count ≥
    ceil(q * n / 1000)), estimate = the bucket's LOWER BOUND
    ``((2**sub_bits + sub) << e) div 2**sub_bits`` — pure long
    arithmetic, so the estimate (not just the bucket) replays
    bit-for-bit in any engine.

    The window ordering is over the bucket table (≤ ~1k rows/group),
    never over the data — the ordered pass costs nothing regardless of
    input scale. Returns ``(*by, q_permille, est, n)``.
    """
    if not qs_permille:
        raise ValueError("qs_permille must be non-empty")
    if any(q < 1 or q > 1000 for q in qs_permille):
        raise ValueError("quantiles are integer permille in [1, 1000]")
    by = list(by or [])
    w = Window.partitionBy(*by).orderBy(F.col("bucket"))
    cum = sketch.select(
        *by,
        "bucket",
        F.sum("cnt").over(w).alias("_cum"),
        F.sum("cnt").over(Window.partitionBy(*by)).alias("_n"),
    )
    qlit = F.explode(
        F.array(*[F.lit(int(q)) for q in sorted(set(qs_permille))])
    ).alias("q_permille")
    rank = F.expr("(q_permille * _n + 999) div 1000")
    width = 1 << sub_bits
    picked = (
        cum.select(*by, "bucket", "_cum", "_n", qlit)
        .filter(F.col("_cum") >= rank)
        .groupBy(*by, "q_permille")
        .agg(
            F.min("bucket").alias("_b"),
            F.max("_n").cast("long").alias("n"),
        )
    )
    # lower bound = 2**e + sub * 2**(e - sub_bits), as pure shifts —
    # never exceeds the largest input value, so no overflow by
    # construction (unlike ((width + sub) << e), which overflows
    # at high exponents)
    e = F.expr(f"cast(_b div {width} as int)")
    sub = (F.col("_b") % width).cast("long")
    est = _shl(F.lit(1).cast("long"), e) + F.when(
        e >= sub_bits, _shl(sub, e - F.lit(sub_bits))
    ).otherwise(_shr(sub, F.lit(sub_bits) - e))
    return picked.select(
        *by,
        "q_permille",
        est.cast("long").alias("est"),
        "n",
    )


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    qs_permille: list[int],
    by: list[str] | None = None,
) -> DataFrame:
    """Exact quantiles of ``value_col``, optionally per group.

    Returns one row per (group ×) requested quantile:
    ``(*by, q_permille, value)`` where ``value`` is the smallest value
    whose cumulative count ≥ ceil(q_permille * n / 1000).

    Shape: groupBy(value) count → per-group window cumsum over the
    distinct-value table → explode the (tiny, literal) quantile list →
    min value clearing each rank. The window partitions by ``by``
    (single-partition only in the global case, where its input is the
    distinct-value table, not the data).
    """
    if not qs_permille:
        raise ValueError("qs_permille must be non-empty")
    if any(q < 1 or q > 1000 for q in qs_permille):
        raise ValueError("quantiles are integer permille in [1, 1000]")
    by = list(by or [])

    # percentile_disc ignores NULLs; without the filter a NULL group
    # would sort first and win every MIN(value) selection
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*by, value_col)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w = Window.partitionBy(*by).orderBy(F.col(value_col))
    cum = counts.select(
        *by,
        F.col(value_col),
        F.sum("_c").over(w).alias("_cum"),
        F.sum("_c").over(Window.partitionBy(*by)).alias("_n"),
    )
    qlit = F.explode(
        F.array(*[F.lit(int(q)) for q in sorted(set(qs_permille))])
    ).alias("q_permille")
    # rank = ceil(q*n/1000); `div` keeps it in long arithmetic (a
    # double division would lose exactness once q*n nears 2^53)
    rank = F.expr("(q_permille * _n + 999) div 1000")
    return (
        cum.select(*by, value_col, "_cum", "_n", qlit)
        .filter(F.col("_cum") >= rank)
        .groupBy(*by, "q_permille")
        .agg(F.min(value_col).alias("value"))
    )


def _cm_col(v: Column, row: int, width: int) -> Column:
    # md5-derived bucket for count-min row ``row`` — hex→int on 8 hex
    # chars, replayable as CAST('0x'||substr(md5(..),1,8)) anywhere
    return (
        F.conv(
            F.substring(F.md5(F.concat(v, F.lit(f"#{row}"))), 1, 8), 16, 10
        ).cast("long")
        % width
    )


def countmin_sketch(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-min frequency sketch (Cormode–Muthukrishnan 2005): each
    value increments one md5-derived bucket per row; estimates are the
    MIN over rows, never under the true count, over by at most
    ~N/width with probability 1 - 2^-depth.

    Why this shape at 100 TB: the sketch is ONE hash aggregate over
    (row, bucket) — at most ``depth * width`` cells regardless of how
    many distinct values exist — with full map-side combine, and two
    sketches merge by adding cells (same argument as ``hdr_sketch``).
    It answers point frequency queries over a domain too large to
    count exactly (every token / URL / span in a web corpus) with
    bounded memory. Deterministic md5 bucketing — no RNG, retry-
    invariant, replayable by any engine.

    Returns (row, col, cnt) — the sketch cells (absent cell = 0).
    """
    if depth < 1 or width < 2:
        raise ValueError("need depth >= 1 and width >= 2")
    v = F.col(value_col)
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _cm_col(v, i, width).alias("col"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rc")
    )
    return (
        cells.select(F.col("rc.row").alias("row"), F.col("rc.col").alias("col"))
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def countmin_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates from a ``countmin_sketch``: explode
    each probe value into its ``depth`` (row, col) cell keys, read the
    cells through ONE broadcast left join against the whole sketch (a
    missing cell reads 0), and take the MIN per probe row. The single
    join keeps the lookup map-side however large the probe table grows
    — the sketch is the broadcast side by construction (≤ depth*width
    cells), so this works unchanged when "probes" is the full corpus
    being re-scored.

    Probe rows must be distinct (the per-probe grouping keys on all of
    ``probes``' columns). Returns ``probes``' columns plus ``cms_est``.
    """
    v = F.col(value_col)
    pairs = probes.select(
        *probes.columns,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _cm_col(v, i, width).alias("col"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("_rc"),
    ).select(*probes.columns, F.col("_rc.row").alias("row"), F.col("_rc.col").alias("col"))
    return (
        pairs.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(*probes.columns)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long")))
            .cast("long")
            .alias("cms_est")
        )
    )


def hll_bucket_rho(value_col: str, p: int) -> tuple[F.Column, F.Column]:
    """The (bucket, rho) expression pair shared by the batch sketch
    and ``streaming/incremental.streaming_hll`` — one derivation so
    the two surfaces cannot drift."""
    if not (4 <= p <= 14):
        raise ValueError("p must be in [4, 14]")
    wbits = 60 - p
    h = F.conv(
        F.substring(F.md5(F.encode(F.col(value_col), "UTF-8")), 1, 15),
        16,
        10,
    ).cast("long")
    bucket = F.shiftright(h, wbits)
    w = h.bitwiseAND(F.lit((1 << wbits) - 1))
    rho = (
        F.when(w == 0, F.lit(wbits + 1))
        .otherwise(F.lit(wbits + 1) - F.length(F.bin(w)))
        .cast("int")
    )
    return bucket, rho


def hll_sketch(
    df: DataFrame,
    value_col: str,
    p: int = 8,
    by: tuple[str, ...] = (),
) -> DataFrame:
    """HyperLogLog register table (Flajolet et al. 2007): hash each
    value to 60 bits (15 md5 hex chars — comfortably inside a signed
    int64 for both engines), route the top ``p`` bits to one of
    m = 2^p registers, and keep per register the MAX of
    rho = (leading zeros of the remaining 60-p bits) + 1.

    Why this shape at 100 TB: the register table is ONE hash aggregate
    bounded at m rows regardless of cardinality, the MAX combines
    map-side, and two sketches merge by register-wise MAX — the
    textbook mergeable distinct sketch (vs `sketch_distinct`'s
    KMV-style sampling, which keeps a data-dependent survivor set).
    Deterministic md5 bucketing: no RNG, retry-invariant, and exactly
    replayable by any engine with md5 + integer shifts; rho comes from
    the BINARY-STRING length (``bin()``, identical in Spark and
    DuckDB) rather than floor(log2(.)), so no float boundary can
    disagree at exact powers of two.

    Returns ``(bucket, rho)`` — absent bucket = empty register.
    ``by`` keeps one independent sketch per group (grain) — the
    fine-grain side of a mergeable-sketch rollup.
    """
    bucket, rho = hll_bucket_rho(value_col, p)
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*by, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*by, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(registers: DataFrame, by: tuple[str, ...] = ()) -> DataFrame:
    """HLL union: register-wise MAX. Because max is associative and
    commutative, ANY partitioning of the inputs (per day, per shard,
    per stream micro-batch) merges to the identical register table —
    the property that makes the sketch roll up grain-to-grain without
    ever rescanning raw data. ``by`` gives the coarse grain to merge
    INTO (subset of the input's group columns)."""
    return registers.groupBy(*by, "bucket").agg(
        F.max("rho").alias("rho")
    )


def hll_alpha(m: int) -> float:
    """The standard HLL bias-correction constant for m registers."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_estimate(
    registers: DataFrame,
    p: int = 8,
    by: tuple[str, ...] = (),
) -> DataFrame:
    """Cardinality estimate from an ``hll_sketch`` register table.

    The harmonic-mean denominator is accumulated as an EXACT integer:
    each register contributes ``1 << (SCALE - rho)`` with
    SCALE = (60-p)+1 (so the largest possible rho shifts by zero and
    an empty register contributes ``1 << SCALE``) — integer addition
    is order-independent, unlike summing 2^-rho doubles, so Spark's
    arbitrary aggregation order and DuckDB's produce the same bigint.
    The only float ops are one division by that bigint and (in the
    small-range branch) one ln() — both on identical operands in both
    engines, with the result rounded to an integer estimate.

    Small-range correction (E <= 2.5m with empty registers) uses
    linear counting m*ln(m/V); the 60-bit hash needs no large-range
    branch at any cardinality this engine will see.

    Returns one row (per ``by`` group, if given):
    (m, n_regs, zero_regs, denom, hll_est).
    """
    m = 1 << p
    scale = (60 - p) + 1
    num = hll_alpha(m) * m * m * float(1 << scale)
    agg = registers.groupBy(*by).agg(
        F.count(F.lit(1)).cast("long").alias("n_regs"),
        F.sum(_shl(F.lit(1).cast("long"), F.lit(scale) - F.col("rho")))
        .cast("long")
        .alias("denom_used"),
    )
    staged = agg.select(
        *by,
        F.lit(m).cast("long").alias("m"),
        F.col("n_regs"),
        (F.lit(m) - F.col("n_regs")).cast("long").alias("zero_regs"),
        (
            F.col("denom_used")
            + (F.lit(m) - F.col("n_regs")) * F.lit(1 << scale)
        )
        .cast("long")
        .alias("denom"),
    )
    raw = F.lit(num) / F.col("denom")
    small = (raw <= F.lit(2.5 * m)) & (F.col("zero_regs") > 0)
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("zero_regs"))
    return staged.select(
        *by,
        "m",
        "n_regs",
        "zero_regs",
        "denom",
        F.round(F.when(small, linear).otherwise(raw), 0)
        .cast("long")
        .alias("hll_est"),
    )


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    min_count: int,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """EXACT heavy hitters — every value occurring at least
    ``min_count`` times, with its exact count — without ever shuffling
    the full value vocabulary (the web-scale problem: a naive
    ``GROUP BY value HAVING count >= k`` shuffles billions of
    singleton keys to find the few thousand heavy ones).

    Two passes, both bounded:
    1. ``countmin_sketch`` — one hash aggregate into depth×width cells
       (fixed size regardless of domain). Cells with cnt >= min_count
       are collected (bounded by depth×width, and in practice by the
       true heavy-hitter count plus collisions).
    2. The row stream is filtered MAP-SIDE with per-depth IN-lists: a
       row survives iff ALL depth cells of its value are heavy — i.e.
       iff its count-min estimate >= min_count. Since est >= exact
       (one-sided error), NO true heavy hitter is dropped; sketch
       false positives are removed by the exact count that follows,
       which now aggregates only candidate rows.

    The driver transfer is bounded by the sketch size — the same
    bounded-collect contract as the k-means centroid path. Returns
    (value_col, n) ordered (n DESC, value ASC); provably equal to the
    naive full aggregate, which is exactly what the oracle runs."""
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    sk = countmin_sketch(df, value_col, depth=depth, width=width)
    heavy = sk.filter(F.col("cnt") >= min_count).collect()
    cols_by_row: dict[int, list[int]] = {i: [] for i in range(depth)}
    for r in heavy:
        cols_by_row[r["row"]].append(r["col"])
    v = F.col(value_col)
    pred = F.lit(True)
    for i in range(depth):
        cs = cols_by_row[i]
        pred = pred & (
            _cm_col(v, i, width).isin(cs) if cs else F.lit(False)
        )
    return (
        df.filter(pred)
        .groupBy(value_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .filter(F.col("n") >= min_count)
        .orderBy(F.desc("n"), F.asc(value_col))
    )


def transition_counts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    order_col: str = "event_id",
    gap_s: int = 1800,
) -> DataFrame:
    """Session-aware Markov transition counts — the behavioral-model
    primitive (next-action prediction, funnel analysis, synthetic
    session generation): for every user, order events by (ts,
    order_col) — a TOTAL order, so ties cannot flip under retries —
    cut sessions at ``gap_s`` silence (the q_sessionize rule), and
    count (prev_state -> next_state) pairs within sessions plus a
    virtual '__start__' -> first-state transition per session.

    Scale shape (100 TB): ONE shuffle (the per-user window), then a
    hash aggregation over a keyspace bounded by |states|^2 + |states|
    — map-side combine collapses nearly everything before the second
    exchange. Per-user event counts bound the window sort; no
    driver-side state."""
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = us - F.lag(us).over(w)
    prev = F.when(
        gap.isNull() | (gap > gap_s * 1_000_000), F.lit("__start__")
    ).otherwise(F.lag(state_col).over(w))
    return (
        events.select(
            prev.alias("prev_state"), F.col(state_col).alias("next_state")
        )
        .groupBy("prev_state", "next_state")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def profile_table(
    df: DataFrame, columns: list[str] | None = None
) -> DataFrame:
    """Deterministic per-column data profile — (column, n_total,
    n_nonnull, n_distinct, min_norm, max_norm) — the schema-health /
    data-quality pass every ingest pipeline runs before training.

    Cross-engine discipline (CLAUDE.md): min/max are computed on the
    NATIVE column (string ordering of numerics would be wrong) and
    only the RESULT is normalized — doubles to integer micros,
    timestamps to formatted strings — so any SQL engine reproduces
    the row byte-for-byte.

    Scale shape (honest): multiple COUNT(DISTINCT) in one aggregate
    compiles to an Expand that multiplies the scan ``ncols``× before
    the partial agg — the standard exact-profile cost (Spark's own
    ``summary()`` pays it). At 100 TB run it composed with
    ``stratified_sample``, or drop n_distinct for an Expand-free
    single pass. Output is one row per column — driver-safe."""
    cols = columns or df.columns
    dtypes = dict(df.dtypes)

    def _norm_result(c: str, agg):
        t = dtypes[c]
        if t in ("double", "float"):
            return F.round(agg * 1_000_000).cast("long").cast("string")
        if t.startswith("timestamp"):
            return F.date_format(agg, "yyyy-MM-dd HH:mm:ss")
        return agg.cast("string")

    aggs = [F.count(F.lit(1)).cast("long").alias("__n_total")]
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count(col).cast("long").alias(f"{c}__nonnull"),
            F.countDistinct(col).cast("long").alias(f"{c}__distinct"),
            _norm_result(c, F.min(col)).alias(f"{c}__min"),
            _norm_result(c, F.max(col)).alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args += [
            F.lit(c),
            F.col(f"{c}__nonnull"),
            F.col(f"{c}__distinct"),
            F.col(f"{c}__min"),
            F.col(f"{c}__max"),
        ]
    return one.select(
        "__n_total",
        F.stack(
            F.lit(len(cols)), *stack_args
        ).alias("column", "n_nonnull", "n_distinct", "min_norm", "max_norm"),
    ).select(
        "column",
        F.col("__n_total").alias("n_total"),
        "n_nonnull",
        "n_distinct",
        "min_norm",
        "max_norm",
    )


def rollup_cascade(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value_cents",
) -> DataFrame:
    """Multi-resolution time rollup as a CASCADE of continuous
    aggregates — the hypertable pattern: hourly buckets aggregate the
    RAW events (the only corpus-sized pass), daily buckets aggregate
    the hourly rows (24× smaller), weekly buckets aggregate the daily
    rows. Correct because count and integer sum are decomposable
    (the same partial-merge law Spark's own map-side combine uses);
    the win at 100 TB is that coarser grains never re-scan raw data —
    re-deriving weekly straight from events would cost three full
    scans instead of one.

    The hourly level is localCheckpointed: all three grains hang off
    it, and without the cut Spark would recompute the raw aggregate
    once per branch of the output union.

    ``value_col`` must already be an integer measure (cents/micros
    discipline — float sums are not associativity-stable across
    partitionings). Returns
    (grain 'hour'|'day'|'week', bucket_start, key, n_events, value)
    with bucket_start formatted 'yyyy-MM-dd HH:mm:ss'.
    """
    fmt = "yyyy-MM-dd HH:mm:ss"

    def lvl(df, trunc_to, src_ts):
        return df.groupBy(
            F.date_trunc(trunc_to, F.col(src_ts)).alias("_b"),
            F.col(key_col),
        ).agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("_v").cast("long").alias("_v"),
        )

    base = events.select(
        F.col(ts_col).alias("_ts"),
        F.col(key_col),
        F.lit(1).cast("long").alias("n_events"),
        F.col(value_col).cast("long").alias("_v"),
    )
    hourly = (
        base.groupBy(
            F.date_trunc("hour", "_ts").alias("_b"), F.col(key_col)
        )
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("_v").cast("long").alias("_v"),
        )
        .localCheckpoint(eager=False)
    )
    daily = lvl(hourly, "day", "_b").localCheckpoint(eager=False)
    weekly = lvl(daily, "week", "_b")

    def out(df, grain):
        return df.select(
            F.lit(grain).alias("grain"),
            F.date_format("_b", fmt).alias("bucket_start"),
            F.col(key_col),
            "n_events",
            F.col("_v").alias("value"),
        )

    return (
        out(hourly, "hour")
        .unionByName(out(daily, "day"))
        .unionByName(out(weekly, "week"))
    )
