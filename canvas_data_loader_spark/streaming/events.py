"""Streaming operators over the ``events`` table.

The reference's hourly cron re-list-and-diff loop (README.md:31-33 +
dump ordering/ledger, src/main.rs) is batch-incremental ingestion; its
Spark-native analog is a Structured Streaming file source with
``Trigger.AvailableNow`` — each trigger processes exactly the files
not yet seen (the checkpoint is the ledger).

For finite test runs, the helpers run a streaming query to completion
against a memory sink and return the result as a DataFrame, so the
same operator is checkable against a batch/DuckDB oracle.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# events.ts has shipped as both TIMESTAMP(NANOS) and timestamp[us]
# parquet across testdata generations. The file streaming source needs
# an explicit schema, so probe the actual parquet footer (batch read,
# metadata-only) and declare ts accordingly: NANOS arrives as int64
# nanos (legacy conf) and converts with exact integer division;
# timestamp[us] arrives as TIMESTAMP_NTZ and just casts to the
# session-UTC instant type. Declaring LongType over a timestamp[us]
# file silently yields raw micros mis-divided by 1000 — every event
# lands in 1970 and watermarks/windows are garbage (observed driver
# failure mode, round 3).
def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", ts_type, True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )


def _probe_ts_is_long(spark: SparkSession, path: str) -> bool:
    """True iff ts arrives as raw int64 nanos (legacy NANOS parquet).

    Reads the footer of EVERY file, not a merged batch-read schema: a
    directory mixing testdata generations (NANOS files next to
    timestamp[us] files) would make a merged-schema probe pick one
    representation and silently misread the other kind — micros
    div-1000'd into 1970, or nanos read as micros. Mixed directories
    fail loudly here instead; normalize the files before streaming.
    Falls back to the batch-read probe for non-local paths pyarrow
    can't reach.
    """
    try:
        import glob as _glob
        import os as _os

        import pyarrow.parquet as _pq

        files = (
            [path]
            if _os.path.isfile(path)
            # recursive: partition-subdirectory layouts
            # (e.g. date=.../part-*.parquet) must reach the footers too
            else sorted(
                _glob.glob(
                    _os.path.join(path, "**", "*.parquet"), recursive=True
                )
            )
        )
        kinds = {str(_pq.read_schema(f).field("ts").type) for f in files}
        if not kinds:
            raise ValueError(f"no parquet files under {path!r}")
        if len(kinds) > 1:
            raise ValueError(
                f"events files under {path!r} mix ts representations "
                f"{sorted(kinds)}; a single stream schema cannot read both "
                "— normalize the directory first"
            )
        return kinds.pop().startswith("timestamp[ns")
    except (ImportError, OSError, ValueError) as e:
        if isinstance(e, ValueError) and (
            "mix ts representations" in str(e)
            or "no parquet files" in str(e)
        ):
            raise  # these loud, specific failures are the contract
        # anything pyarrow couldn't reach or decode (missing lib,
        # remote path, ArrowInvalid subclasses OSError but keep the
        # net wide): the batch-read probe remains the safety net
        return dict(spark.read.parquet(path).dtypes)["ts"] == "bigint"


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source incremental ingest of events parquet.

    ``path`` may be a single file; the file streaming source requires a
    directory basePath, so split into (dir, glob filter).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ts_is_long = _probe_ts_is_long(spark, path)
    base, _, fname = path.rpartition("/")
    reader = spark.readStream.schema(
        _events_schema(T.LongType() if ts_is_long else T.TimestampNTZType())
    )
    if fname.endswith(".parquet"):
        reader = reader.option("pathGlobFilter", fname)
        path = base
    stream = reader.parquet(path)
    if ts_is_long:
        return stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


def _run_to_memory(
    stream_df: DataFrame, output_mode: str, state_partitions: int = 8
) -> DataFrame:
    """Drive a finite streaming query to completion via a memory sink.

    A streaming query latches ``spark.sql.shuffle.partitions`` at its
    first checkpoint and every micro-batch then commits one state-store
    delta PER partition — with a vanilla 200-partition session that is
    200 small file commits per trigger for kilobytes of state (measured
    2x+ of wall time on the finite test runs). Size state partitions to
    state volume, not to the session's batch-shuffle width: bounded here
    to ``state_partitions`` for the finite sources; a production stream
    sizes it to peak keys-per-trigger instead. The session conf is
    restored after the (synchronous, AvailableNow) run completes.
    """
    spark = stream_df.sparkSession
    name = "s_" + uuid.uuid4().hex[:12]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    try:
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(min(int(prev), state_partitions)),
        )
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        # the finite run is over and the memory sink holds the result;
        # the checkpoint is dead state — without this, every bench/test
        # invocation leaked a directory of state-store deltas
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


def tumbling_counts(
    stream: DataFrame, window_len: str = "1 hour", run: bool = True
) -> DataFrame:
    """Tumbling-window count+sum per event_type.

    Complete-mode output over a finite source equals the batch
    ``groupBy(window(...))`` — which is what the oracle checks.
    """
    agg = stream.groupBy(
        F.window("ts", window_len).alias("win"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
    out = agg.select(
        F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        "event_type",
        "n",
        "total",
    )
    return _run_to_memory(out, "complete") if run else out


def sliding_counts(
    stream: DataFrame,
    window_len: str = "1 hour",
    slide: str = "30 minutes",
    run: bool = True,
) -> DataFrame:
    """Sliding-window event counts per event_type."""
    agg = stream.groupBy(
        F.window("ts", window_len, slide).alias("win"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    out = agg.select(
        F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        "event_type",
        "n",
    )
    return _run_to_memory(out, "complete") if run else out


def windowed_with_watermark(
    stream: DataFrame,
    window_len: str = "1 hour",
    watermark: str = "2 hours",
    run: bool = True,
) -> DataFrame:
    """Watermarked tumbling agg in append mode: only windows older than
    the watermark emit; late rows beyond it are dropped. On a finite
    ordered source the watermark ends at max(ts) - delay, so the last
    window(s) stay open and are withheld — that withholding IS the
    semantics under test."""
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_len).alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "n",
        )
    )
    return _run_to_memory(agg, "append") if run else agg


def streaming_dedup_counts(
    stream: DataFrame, watermark: str = "24 hours", run: bool = True
) -> DataFrame:
    """Streaming dedup by event_id (state bounded by the watermark),
    then per-type counts — the streaming analog of the reference's
    idempotent re-import skip (ledger A25)."""
    deduped = stream.withWatermark("ts", watermark).dropDuplicates(["event_id"])
    agg = deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    return _run_to_memory(agg, "complete") if run else agg


def stateful_user_sessions(
    stream: DataFrame, gap_minutes: int = 30, run: bool = True
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    session accounting with an arbitrary-gap rule that windowed aggs
    can't express (a session ends only when ``gap_minutes`` pass with
    no activity — unbounded session length).

    State per user: (n_events, n_sessions, last_ts_us). Each trigger
    merges the user's new micro-batch (sorted by ts, event_id) into the
    running counts and emits one summary row in update mode. Grouping
    shuffles by user_id once; state lives in the state store, sized by
    #distinct users, not #events — the correct shape at 100 TB.

    Streaming analog of q36's batch sessionization (ref has no
    counterpart; cf. SURVEY.md §2 Tier B streaming rows).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    out_schema = (
        "user_id bigint, n_events bigint, n_sessions bigint, last_ts_us bigint"
    )
    state_schema = "n_events bigint, n_sessions bigint, last_ts_us bigint"

    def update(key, pdf_iter, state: GroupState):
        n_events, n_sessions, last_ts = (
            state.get if state.exists else (0, 0, None)
        )
        rows = pd.concat(list(pdf_iter), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        for ts in rows["ts"]:
            ts_us = int(ts.value // 1_000)  # pandas Timestamp ns -> us
            if last_ts is None or ts_us - last_ts > gap_us:
                n_sessions += 1
            n_events += 1
            last_ts = ts_us
        state.update((int(n_events), int(n_sessions), int(last_ts)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n_events],
                "n_sessions": [n_sessions],
                "last_ts_us": [last_ts],
            }
        )

    out = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_to_memory(out, "update") if run else out


def session_window_counts(
    stream: DataFrame, gap: str = "30 minutes", run: bool = True
) -> DataFrame:
    """Built-in session windows (merging-window state) per user: the
    declarative counterpart of ``stateful_user_sessions`` — use this
    when the per-session output (start/end/count) is what you need;
    use the applyInPandasWithState variant when the per-user rollup
    must carry custom state across sessions.

    Complete-mode output on a finite source equals the batch
    ``groupBy(session_window(...))`` — oracle-checkable via the SQL
    gaps-and-islands rewrite (session end = last event + gap,
    end-exclusive)."""
    agg = (
        stream.withWatermark("ts", "0 seconds")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("win_end"),
            "n",
        )
    )
    return _run_to_memory(agg, "complete") if run else agg


def stream_stream_click_purchase(
    spark: SparkSession, path: str, within: str = "30 minutes", run: bool = True
) -> DataFrame:
    """Stream-stream interval join: clicks joined to the same user's
    purchases that land within ``within`` AFTER the click. Both sides
    carry watermarks so the join state is bounded: a click can be
    dropped from state once the purchase-side watermark passes
    click.ts + within (Spark derives the state retention from the
    interval condition — unbounded joins without it are rejected).
    On a finite AvailableNow source the emitted set equals the batch
    interval join, which is what the oracle checks."""
    clicks = (
        read_events_stream(spark, path)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        read_events_stream(spark, path)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    j = clicks.join(
        purchases,
        F.expr(
            f"c_user = p_user AND p_ts > c_ts AND p_ts <= c_ts + interval {within}"
        ),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        F.date_format("c_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
    )
    return _run_to_memory(j, "append") if run else j

def stream_static_enrich(
    spark: SparkSession,
    path: str,
    dim,
    run: bool = True,
) -> DataFrame:
    """Stream-static enrichment join + streaming aggregate: the events
    stream joined to a BATCH dimension table (the most common
    production streaming shape — enrich a fact stream with slowly
    changing reference data), then counted per dimension attribute.

    The static side needs no watermark and holds no state: Spark
    re-plans the batch side per micro-batch (picking up dim updates
    between triggers) and broadcasts it under AQE like any batch join.
    Only the post-join aggregation keeps state, keyed by the (small)
    dimension attribute. On a finite AvailableNow source the
    complete-mode result equals the batch join+groupBy, which is what
    the oracle checks."""
    ev = read_events_stream(spark, path)
    joined = ev.join(
        F.broadcast(dim), ev["user_id"] == dim["c_custkey"], "inner"
    )
    agg = joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        # sum the DECIMAL operands (exact, associative) so streaming
        # accumulation order can't shift the float result vs the oracle
        F.sum(F.col("value").cast("decimal(27,4)")).alias("total_value"),
    )
    return _run_to_memory(agg, "complete") if run else agg


def streaming_dedup_within_watermark(
    stream: DataFrame, watermark: str = "24 hours", run: bool = True
) -> DataFrame:
    """Streaming dedup via ``dropDuplicatesWithinWatermark`` — the
    state-TTL-bounded variant (Spark 3.5+). Unlike plain
    ``dropDuplicates`` (q44), whose per-key state lives FOREVER (an
    unbounded state store once the key space is unbounded — the thing
    that kills long-running jobs at 100 TB), this guarantees
    single-emission only for duplicates arriving within the watermark
    delay of each other and EVICTS key state as the watermark passes:
    bounded state, the production setting for at-scale streams whose
    duplicates are caused by near-in-time redelivery (source retries,
    at-least-once sinks). On this finite ordered source every
    duplicate is within-delay, so the result equals exact dedup — the
    oracle can check it relationally."""
    deduped = stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    agg = deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    return _run_to_memory(agg, "complete") if run else agg
