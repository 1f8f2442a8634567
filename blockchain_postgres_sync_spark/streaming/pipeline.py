"""Streaming orchestration: readStream → foreachBatch → atomic store commit.

Reproduces the reference consumer's lifecycle (SURVEY.md §3.1) Spark-first:

- S2 micro-batcher: Structured Streaming file source (one event file ≈ one
  update batch; trigger + maxFilesPerTrigger bound batch size).
- per batch (mod.rs:190-251): fold the updates into runs — consecutive
  appends (blocks/microblocks) and rollbacks — and apply them in order
  (driver-side segmentation over ≤ a few hundred rows of metadata, never
  over data).
- appends (mod.rs:253-357): extract blocks / typed txs / children / SCD
  updates / tickers / waves_data, merge into the store, normalize the
  microblock tail (squash, T2), re-derive SCD chains (W1), and re-run the
  incremental candle recompute from the batch watermark (A4).
- rollback (mod.rs:794-863): drop rows above the target block uid, re-derive
  chains (reopen repair), recompute candles from the first affected minute.
- T1 atomicity: all staged tables promote in ONE manifest swap per batch
  (streaming/store.py) — the transaction analog.

Scale notes: blocks are a tiny dimension (1 row/block) so the squash window
and rollback lookups are cheap; tx/candle merges rewrite only rows above the
watermark — with height-bucket partitioning the rewritten partition set is
the speculative tail, O(1) per batch.  SCD rechaining (appends AND
rollback) touches only keys whose logs changed — unchanged chains pass
through via a broadcast anti-join — so its cost follows batch size /
reorg depth, not dimension size.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..constants import CANDLE_CASCADE, INTERVALS, UID_HEIGHT_MULTIPLIER
from ..ingest import (
    classify_txs,
    extract_asset_origins,
    extract_asset_updates,
    extract_blocks,
    extract_children,
    extract_raw_txs,
    extract_ticker_updates,
    extract_waves_data,
)
from ..operators.candles import (
    cascade_tail_exact_onepass,
    minute_candles,
    scale_prices,
    trunc_ts,
)
from ..operators.scd import chain_superseded_by
from ..plans.views import decimals_view
from .store import TableStore

TX_NAMES = [f"txs_{n}" for n in range(1, 19)]
CHILD_NAMES = [
    "txs_11_transfers", "txs_12_data", "txs_16_args", "txs_16_payment",
    "txs_18_args", "txs_18_payment",
]
CANDLE_TABLES = ["candles_1m"] + [f"candles_{dst}" for _, dst in CANDLE_CASCADE]

#: fact tables are partitioned by height bucket; per batch only buckets at or
#: above the speculative tail are rewritten (everything below is hardlinked
#: forward by the store).  1000 blocks/bucket ≈ bounded, navigable partitions
#: at mainnet heights (~3M blocks → ~3k partitions).
HEIGHT_BUCKET = 1000


def _hb(height_col: Column | str) -> Column:
    # plain INT bucket values: Spark's partition-directory type inference
    # reads them back as int, so written and reread layouts agree (a padded
    # string would round-trip as int and fork duplicate partition dirs)
    col = F.col(height_col) if isinstance(height_col, str) else height_col
    return F.floor(col / F.lit(HEIGHT_BUCKET)).cast("int")


def _hb_value(height: int) -> int:
    return height // HEIGHT_BUCKET


def _empty(spark: SparkSession, like: DataFrame) -> DataFrame:
    return spark.createDataFrame([], like.schema)


def _run_parallel(tasks, max_workers: int = 8) -> None:
    """Run independent staged-table writes concurrently.  At micro-batch
    sizes each write job's wall time is dominated by fixed scheduling +
    parquet-commit overhead, so N sequential writes cost ~N × floor;
    concurrent job submission (the documented multi-job Spark pattern)
    collapses that to ~1 floor and, on a real cluster, fills executors a
    single small job would leave idle.  Safe for DISTINCT tables only:
    TableStore versions are per-name, and nothing here reads a table
    another task in the same group writes."""
    tasks = [t for t in tasks if t is not None]
    if not tasks:
        return
    if len(tasks) == 1:
        tasks[0]()
        return
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(max_workers, len(tasks))) as ex:
        for f in [ex.submit(t) for t in tasks]:
            f.result()


def _read_or_empty(store: TableStore, name: str, like: DataFrame) -> DataFrame:
    existing = store.read_or_none(name)
    return existing if existing is not None else _empty(store.spark, like)


# ------------------------------------------------------------ squash (T2)


def normalize_squash(
    blocks: DataFrame,
    tx_tables: dict[str, DataFrame],
    settled_below: int | None = None,
) -> tuple[DataFrame, dict[str, DataFrame]]:
    """Wholesale microblock-tail normalization.

    Every microblock below the latest key block folds into its preceding key
    block: the key block takes the last folded id (total-block id,
    pg.rs:151-158) and referencing rows re-point their block_uid
    (pg.rs:216-223).  Microblocks above the latest key block are the live
    tail and stay.  One pass, pure window algebra — equivalent to the
    reference performing a squash at every key-block arrival.

    ``settled_below`` (the previous batch's last key-block uid) bounds the
    anchoring window to rows ABOVE it: everything at or below is already
    normalized (all key rows, ids final — a settled block never changes
    again), so the only unpartitioned window sorts the speculative tail +
    this batch's rows, never O(history).  Tail rows preceding any new key
    block anchor to ``settled_below`` itself, which can therefore still
    absorb folded ids.
    """
    if settled_below is None:
        head = blocks.filter(F.lit(False))
        tail = blocks
    else:
        head = blocks.filter(F.col("uid") <= settled_below)
        tail = blocks.filter(F.col("uid") > settled_below)
    w = Window.orderBy("uid").rowsBetween(Window.unboundedPreceding, 0)
    anchored = tail.withColumn(
        "anchor",
        F.coalesce(
            F.max(F.when(F.col("time_stamp").isNotNull(), F.col("uid"))).over(w),
            F.lit(settled_below).cast("long"),
        ),
    )
    last_key = tail.filter(F.col("time_stamp").isNotNull()).agg(
        F.max("uid")
    ).collect()[0][0]
    if last_key is None:
        return blocks, tx_tables

    settled = anchored.filter(F.col("uid") <= last_key)
    total_ids = settled.groupBy("anchor").agg(F.max_by("id", "uid").alias("_total_id"))
    key_rows = settled.filter(F.col("time_stamp").isNotNull()).drop("anchor").unionByName(head)
    new_blocks = (
        key_rows.join(
            F.broadcast(total_ids), key_rows.uid == total_ids.anchor, "left"
        )
        .select(
            "uid",
            F.coalesce(F.col("_total_id"), F.col("id")).alias("id"),
            "height",
            "time_stamp",
        )
        .unionByName(blocks.filter(F.col("uid") > last_key))
    )
    mapping = (
        anchored.filter((F.col("uid") <= last_key) & F.col("time_stamp").isNull())
        .select(F.col("uid").alias("block_uid"), F.col("anchor"))
    )
    new_tables = {}
    for name, df in tx_tables.items():
        joined = df.join(F.broadcast(mapping), "block_uid", "left")
        new_tables[name] = joined.withColumn(
            "block_uid", F.coalesce(F.col("anchor"), F.col("block_uid"))
        ).drop("anchor")
    return new_blocks, new_tables


# ------------------------------------------------------------ candles (A4)


def _interval_starts(spark: SparkSession, since_ts: _dt.datetime) -> dict[str, _dt.datetime]:
    """Truncate the watermark to every interval's start (per-interval start,
    pg.rs:776-803) — pure driver-side datetime math, no Spark job.

    Mirrors ``trunc_ts`` exactly: every fixed-width interval (60 s .. 12 h)
    divides a day evenly, so the epoch floor equals flooring the
    seconds-of-day — timezone-free; calendar floors are midnight / Monday /
    first-of-month (== date_trunc under the UTC-pinned session).  Pinned
    against the Spark expressions by
    tests/test_pipeline.py::test_interval_starts_match_trunc_ts."""
    names = ["1m"] + [dst for _, dst in CANDLE_CASCADE]
    t = since_ts.replace(microsecond=0)
    midnight = t.replace(hour=0, minute=0, second=0)
    out: dict[str, _dt.datetime] = {}
    for ivl in names:
        kind, arg = INTERVALS[ivl]
        if kind == "secs":
            secs = int(arg)
            sod = (t - midnight).seconds
            out[ivl] = midnight + _dt.timedelta(seconds=sod - sod % secs)
        elif arg == "day":
            out[ivl] = midnight
        elif arg == "week":
            out[ivl] = midnight - _dt.timedelta(days=midnight.weekday())
        else:  # month
            out[ivl] = midnight.replace(day=1)
    return out


def recompute_candles(store: TableStore, since_ts: _dt.datetime) -> None:
    """Incremental candle maintenance (pg.rs:660-815): re-derive the minute
    level from trades at/after the watermark, then cascade each interval
    from the merged source level, replacing only the affected time range
    (range-replace ≡ the reference's keyed upsert, because the recompute
    regenerates every key in the range).

    All 13 intervals live in ONE store table ``candles`` partitioned by
    ``p_ib = interval|yyyy-MM`` (the engine analog of the reference's single
    candles table with its interval column, up.sql:368-385).  The whole
    recompute is ONE union plan — each level chains from the previous
    level's in-plan frame (AQE reuses the shared exchanges) — and lands in
    ONE partitioned write; per-interval month boundaries decide which
    partitions are replaced vs hardlinked.  vs the 13-table form this cuts
    per-batch candle maintenance from 13 read+write jobs to one write, the
    difference between ~50 and ~100 events/s end-to-end at the bench size.
    """
    spark = store.spark
    starts = _interval_starts(spark, since_ts)

    asset_updates = store.read_or_none("asset_updates")
    if asset_updates is None:
        return
    decimals = decimals_view(asset_updates, spark)
    txs7 = store.read_or_none("txs_7")
    if txs7 is None:
        return
    trades = scale_prices(txs7, decimals).select(
        "uid", "time_stamp", "amount_asset_id", "price_asset_id",
        "sender", "height", "amount", "price",
    )
    stored_all = store.read_or_none("candles")

    def stored_level(ivl: str) -> DataFrame | None:
        if stored_all is None:
            return None
        return stored_all.filter(F.col("interval") == ivl).drop("p_ib")

    intervals = ["1m"] + [dst for _, dst in CANDLE_CASCADE]
    replace_month = {ivl: starts[ivl].strftime("%Y-%m") for ivl in intervals}

    # Recomputed minute tail, materialized eagerly (localCheckpoint): it
    # feeds BOTH the one-pass rollup kernel and the final content union —
    # lazy caching leaves the single write job racing its own branches.
    # The tail is tiny (the A4 window), so the checkpoint is cheap; it is
    # not executor-loss-resilient, but the store commit is transactional so
    # a lost batch simply replays.
    new_minute = minute_candles(
        trades, since_ts=F.lit(starts["1m"]).cast("timestamp")
    ).localCheckpoint(eager=True)
    stored_1m = stored_level("1m")
    if stored_1m is None:
        merged_1m = new_minute
    else:
        merged_1m = stored_1m.filter(
            F.col("time_start") < F.lit(starts["1m"]).cast("timestamp")
        ).unionByName(new_minute)

    # All 12 rollups in ONE applyInPandas stage (exact python-int math, no
    # bounds): kernel input = merged minute level from min(starts) on.  The
    # widest truncation is USUALLY the month floor, but the week floor
    # (Monday) can precede it — e.g. watermark Wed 2026-04-01 gives
    # starts['1w'] = 2026-03-30 < starts['1M'] = 2026-04-01 — and the
    # re-emitted 1w candle needs those pre-month minutes.  Feeding extra
    # minutes is safe: per-level emission inside the kernel filters to
    # time_start >= starts[dst], and the two levels whose parents could go
    # partial below min(starts) (1w, 1M) are terminal in CANDLE_CASCADE.
    # Replaces the former per-level rollup chain (12 eager checkpoint jobs
    # per batch — the measured bottleneck of the whole streaming path).
    cascade_floor = F.lit(min(starts.values())).cast("timestamp")
    tail_levels = cascade_tail_exact_onepass(
        merged_1m.filter(F.col("time_start") >= cascade_floor).drop("interval"),
        starts,
    )

    # written content = recomputed rows (minute + kernel levels) plus each
    # interval's boundary-month tail (stored rows in a replaced month but
    # before that interval's watermark) — one stored-table scan for all 13
    content = new_minute.unionByName(tail_levels)
    if stored_all is not None:
        cond = F.lit(False)
        for ivl in intervals:
            cond = cond | (
                (F.col("interval") == ivl)
                & (F.date_format("time_start", "yyyy-MM") >= replace_month[ivl])
                & (F.col("time_start") < F.lit(starts[ivl]).cast("timestamp"))
            )
        content = content.unionByName(stored_all.drop("p_ib").filter(cond))
    content = content.withColumn(
        "p_ib",
        F.concat_ws("|", F.col("interval"), F.date_format("time_start", "yyyy-MM")),
    )

    def replaced(value: str) -> bool:
        ivl, _, month = value.partition("|")
        rf = replace_month.get(ivl)
        return rf is None or month >= rf

    store.stage_range_replace("candles", content, "p_ib", replaced)


def read_all_candles(store: TableStore) -> DataFrame:
    """The `candles` table (all 13 intervals; physical partitioning by
    interval|month mirrors up.sql:368-385's interval column + indexes)."""
    df = store.read_or_none("candles")
    if df is None:
        raise KeyError("no candles table in store")
    return df.drop("p_ib")


# ------------------------------------------------------------ appends


def apply_appends(
    store: TableStore,
    seg_updates: DataFrame,
    asset_storage_address: str = "",
    chain_id: int = 87,
) -> _dt.datetime | None:
    """Merge one run of block/microblock updates into the store
    (mod.rs:253-357).  Returns the candle watermark (min exchange-tx
    timestamp in the segment) if any exchange txs arrived."""
    spark = store.spark

    new_blocks = extract_blocks(seg_updates)
    new_raw = extract_raw_txs(seg_updates, chain_id=chain_id)

    # ---- speculative-tail floor: only height buckets at/above it are
    # touched this batch.  The tail = microblocks above the last stored key
    # block (their block_uids may re-point on squash) plus this batch's new
    # heights; everything below is sealed forever (a settled block_uid never
    # changes again), so its partitions hardlink forward untouched.
    stored_blocks = store.read_or_none("blocks_microblocks")
    new_min_agg = new_blocks.agg(F.min("height").alias("_newmin"))
    if stored_blocks is None:
        prev_key = None
        row = new_min_agg.collect()[0]
        h_floor_row = row["_newmin"]
    else:
        # prev key uid + stored-tail min height + new min height in ONE
        # driver round trip (blocks is a tiny dimension; the 1-row agg
        # cross-joins cost nothing next to a second scheduled job)
        pk = stored_blocks.filter(F.col("time_stamp").isNotNull()).agg(
            F.max("uid").alias("_pk")
        )
        row = (
            stored_blocks.crossJoin(pk)
            .agg(
                F.max("_pk").alias("_pk"),
                F.min(
                    F.when(
                        F.col("uid")
                        > F.coalesce(F.col("_pk"), F.lit(-(1 << 62)).cast("long")),
                        F.col("height"),
                    )
                ).alias("_tailmin"),
            )
            .crossJoin(new_min_agg)
            .collect()[0]
        )
        prev_key = row["_pk"]
        floors = [h for h in (row["_tailmin"], row["_newmin"]) if h is not None]
        h_floor_row = min(floors) if floors else None
    h_floor = int(h_floor_row) if h_floor_row is not None else 0
    rb = _hb_value(h_floor)

    def _tail(name: str, like: DataFrame) -> DataFrame:
        """Stored rows in the affected buckets only (partition-pruned read).
        ``like`` must already carry the p_hb column."""
        existing = store.read_or_none(name)
        if existing is None:
            return _empty(spark, like)
        return existing.filter(F.col("p_hb") >= rb)

    # cross-batch uid continuation (W3): a height's sequence continues where
    # the stored txs for that height left off (the reference's stateful
    # TxUidGenerator, convert.rs:45-72).  New heights live in the tail
    # buckets, so the pruned read suffices.
    tail_uid_frames = []
    for n in TX_NAMES:
        t = store.read_or_none(n)
        if t is not None:
            tail_uid_frames.append(
                t.filter(F.col("p_hb") >= rb).select("uid", "height")
            )
    if tail_uid_frames:
        union_uids = tail_uid_frames[0]
        for t in tail_uid_frames[1:]:
            union_uids = union_uids.unionByName(t)
        base = union_uids.groupBy("height").agg(
            (F.max(F.col("uid") % UID_HEIGHT_MULTIPLIER) + 1).alias("_base")
        )
        new_raw = (
            new_raw.join(F.broadcast(base), "height", "left")
            .withColumn("uid", F.col("uid") + F.coalesce(F.col("_base"), F.lit(0)))
            .drop("_base")
        )
    new_raw = new_raw.persist()

    # typed tables + children: tail-scoped merge, range-replace staging.
    # Lease-cancel resolution (J1) looks up the compact (id, uid) store so
    # cancels of leases ingested in EARLIER batches resolve, matching the
    # reference's lookup against the full txs table (pg.rs:472-484).
    typed_new = classify_txs(new_raw, prior_ids=store.read_or_none("tx_ids"))
    children_new = extract_children(new_raw)

    # batch metadata in ONE job (present tx types + SCD-input flags +
    # candle watermark — previously three separate collects per batch, a
    # measured ~15% of streaming wall time in driver round-trips): a table
    # with no stored version and no rows of its type this batch needs no
    # staging — the common case for most of the 18 typed tables in any one
    # batch (the reference likewise only INSERTs types that occurred).
    # Tables that already exist must still restage: squash can re-point
    # their tail block_uids.  The watermark min is over new_raw's type-7
    # rows — identical to min over typed_new[7], whose projection keeps
    # time_stamp untouched.
    meta_row = (
        seg_updates.agg(
            F.max(
                F.size(F.coalesce(F.col("asset_updates"), F.array())) > 0
            ).alias("has_au"),
            F.max(
                F.size(F.coalesce(F.col("data_entries"), F.array())) > 0
            ).alias("has_de"),
            F.max(F.col("waves_quantity").isNotNull()).alias("has_wd"),
        )
        .crossJoin(
            new_raw.agg(
                F.collect_set("tx_type").alias("_types"),
                F.min(
                    F.when(F.col("tx_type") == 7, F.col("time_stamp"))
                ).alias("_wm"),
            )
        )
        .collect()[0]
    )
    present_types = {int(t) for t in meta_row["_types"]}

    def _untouched(name: str, tx_type: int) -> bool:
        return not store.exists(name) and tx_type not in present_types

    merged_tx: dict[str, DataFrame] = {}
    for n, df in typed_new.items():
        name = f"txs_{n}"
        if _untouched(name, n):
            continue
        merged_tx[name] = _tail(name, df.withColumn("p_hb", _hb("height"))).unionByName(
            df.withColumn("p_hb", _hb("height"))
        )
    child_frames: dict[str, DataFrame] = {}
    for name, df in children_new.items():
        parent_type = int(name.split("_")[1])
        if _untouched(name, parent_type):
            continue
        new_part = df.withColumn("p_hb", _hb("height"))
        child_frames[name] = _tail(name, new_part).unionByName(new_part)
    _run_parallel(
        [
            (lambda n=n, f=f: store.stage_range_replace(n, f, "p_hb", rb))
            for n, f in child_frames.items()
        ]
    )

    # blocks (tiny dimension: full rewrite) + squash normalization over the
    # block_uid-bearing tail frames
    blocks = _read_or_empty(store, "blocks_microblocks", new_blocks).unionByName(new_blocks)
    blocks, merged_tx = normalize_squash(blocks, merged_tx, settled_below=prev_key)

    # compact id->uid lookup for J1 (post-squash so block_uids are settled):
    # the tail buckets are rebuilt from the merged typed frames, sealed
    # buckets hardlink forward like every other height-partitioned table.
    # blocks + every merged typed table + tx_ids write concurrently: all
    # distinct tables, all fully-defined frames (tx_ids reads the merged
    # FRAMES, not their staged versions)
    id_frames = [
        df.select("id", "uid", "block_uid", "p_hb") for df in merged_tx.values()
    ]
    new_ids = None
    if id_frames:
        new_ids = id_frames[0]
        for f in id_frames[1:]:
            new_ids = new_ids.unionByName(f)
    _run_parallel(
        [lambda: store.stage("blocks_microblocks", blocks)]
        + [
            (lambda n=n, f=f: store.stage_range_replace(n, f, "p_hb", rb))
            for n, f in merged_tx.items()
        ]
        + (
            [lambda: store.stage_range_replace("tx_ids", new_ids, "p_hb", rb)]
            if new_ids is not None
            else []
        )
    )

    # SCD logs: asset updates + tickers.  Chains are per-key independent, so
    # only keys with updates in THIS batch rechain (W1 + the UNNEST close
    # join J6, pg.rs:225-256); untouched keys' chain rows pass through — at
    # scale the rechain cost follows batch size, not dimension size.
    # batch-content flags (which slowly-changing inputs does this segment
    # actually carry?) ride the consolidated metadata job above
    flags = meta_row

    def _scd(log_name: str, chained_name: str, new_rows: DataFrame, has_new: bool) -> None:
        if store.exists(log_name) and not has_new:
            # no updates this batch: both the log and the chained table are
            # already current — restaging would rewrite full history per
            # batch for nothing
            return
        log = _read_or_empty(store, log_name, new_rows).unionByName(new_rows)
        store.stage(log_name, log)
        stored_chain = store.read_or_none(chained_name)
        if stored_chain is None:
            store.stage(chained_name, chain_superseded_by(log, key="asset_id", uid="uid"))
            return
        affected = new_rows.select("asset_id").distinct()
        unchanged = stored_chain.join(F.broadcast(affected), "asset_id", "left_anti")
        rechained = chain_superseded_by(
            log.join(F.broadcast(affected), "asset_id", "left_semi"),
            key="asset_id", uid="uid",
        )
        store.stage(chained_name, unchanged.unionByName(rechained))

    new_au = extract_asset_updates(seg_updates)
    new_tick = extract_ticker_updates(seg_updates, asset_storage_address)
    new_wd = extract_waves_data(seg_updates)
    stored_wd = store.read_or_none("waves_data")

    def _asset_chain_and_origins() -> None:
        _scd("asset_updates_log", "asset_updates", new_au, bool(flags["has_au"]))
        # asset_origins: first-wins (S6); txs_3 may not exist yet (no issue
        # tx ever seen) — origins are then empty by definition.  Only
        # restage when this batch could have changed them (new asset
        # updates or issue txs).  Chained after the asset log stage: it
        # reads the staged asset_updates_log.
        au_log = store.read("asset_updates_log")
        txs3 = store.read_or_none("txs_3")
        if txs3 is not None and (
            not store.exists("asset_origins")
            or bool(flags["has_au"])
            or 3 in present_types
        ):
            store.stage("asset_origins", extract_asset_origins(au_log, txs3))

    def _tickers() -> None:
        _scd(
            "asset_tickers_log", "asset_tickers", new_tick,
            bool(flags["has_de"]),
        )

    def _waves() -> None:
        # waves_data: dedupe on quantity (S6); skip the full-history
        # rewrite when the batch carries no supply rows
        wd = new_wd
        if stored_wd is None or bool(flags["has_wd"]):
            if stored_wd is not None:
                wd = wd.join(
                    stored_wd.select("quantity"), "quantity", "left_anti"
                )
                wd = stored_wd.unionByName(wd)
            store.stage("waves_data", wd)

    # three independent table families (asset chain feeds only
    # asset_origins, chained inside its own task)
    _run_parallel([_asset_chain_and_origins, _tickers, _waves])

    new_raw.unpersist()
    if meta_row["_wm"] is None:
        return None
    return meta_row["_wm"].replace(second=0, microsecond=0)


# ------------------------------------------------------------ rollback (T3)


def apply_rollback(store: TableStore, ref_id: str) -> _dt.datetime | None:
    """Roll back to block ``ref_id`` (mod.rs:794-863).  Returns the candle
    repair watermark (min timestamp of deleted exchange txs)."""
    blocks = store.read_or_none("blocks_microblocks")
    if blocks is None:
        return None
    row = blocks.filter(F.col("id") == ref_id).select("uid").collect()
    if not row:
        return None
    return rollback_to_uid(store, row[0]["uid"])


def rollback_to_uid(store: TableStore, boundary: int) -> _dt.datetime | None:
    """Drop every row above block uid ``boundary`` across all tables — the
    shared core of reorg rollback (by block id) and the T4 startup ladder
    (by height).  Returns the candle repair watermark."""
    blocks = store.read("blocks_microblocks")
    deleted_ts = None
    txs7 = store.read_or_none("txs_7")
    if txs7 is not None:
        r = (
            txs7.filter(F.col("block_uid") > boundary)
            .agg(F.min("time_stamp").alias("m"))
            .collect()[0]
        )
        deleted_ts = r["m"]

    # affected buckets start at the boundary block's height: buckets above
    # vanish, the boundary bucket is rewritten, everything below hardlinks
    # forward (partition form of DELETE WHERE block_uid > $1, pg.rs:392-398)
    b_height = blocks.filter(F.col("uid") == boundary).select("height").collect()
    rb = _hb_value(int(b_height[0]["height"])) if b_height else _hb_value(0)

    store.stage("blocks_microblocks", blocks.filter(F.col("uid") <= boundary))
    for name in [*TX_NAMES, "tx_ids"]:
        df = store.read_or_none(name)
        if df is None:
            continue
        survivors = df.filter(
            (F.col("p_hb") >= rb) & (F.col("block_uid") <= boundary)
        )
        store.stage_range_replace(name, survivors, "p_hb", rb)
    for name in CHILD_NAMES:
        df = store.read_or_none(name)
        if df is None:
            continue
        # children carry no block_uid: bound via their parent's surviving
        # uids within the affected buckets
        parent = f"txs_{name.split('_')[1]}"
        pdf = store.read(parent).filter(F.col("p_hb") >= rb)
        survivors = df.filter(F.col("p_hb") >= rb).join(
            pdf.select(F.col("uid").alias("tx_uid")), "tx_uid", "left_semi"
        )
        store.stage_range_replace(name, survivors, "p_hb", rb)

    for log_name, chained in (
        ("asset_updates_log", "asset_updates"),
        ("asset_tickers_log", "asset_tickers"),
    ):
        log = store.read_or_none(log_name)
        if log is None:
            continue
        survivors = log.filter(F.col("block_uid") <= boundary)
        store.stage(log_name, survivors)
        # affected-keys-only rechain, mirroring the appends path (_scd):
        # chains are per-key independent, and a key none of whose rows are
        # deleted keeps an identical per-key log — its stored chain rows
        # pass through untouched.  Only keys with rows ABOVE the boundary
        # (the reference's DELETE .. RETURNING feed, pg.rs:225-256) rechain,
        # so rollback cost follows reorg depth, not dimension size.
        stored_chain = store.read_or_none(chained)
        if stored_chain is None:
            store.stage(
                chained, chain_superseded_by(survivors, key="asset_id", uid="uid")
            )
            continue
        affected = (
            log.filter(F.col("block_uid") > boundary).select("asset_id").distinct()
        )
        unchanged = stored_chain.join(F.broadcast(affected), "asset_id", "left_anti")
        rechained = chain_superseded_by(
            survivors.join(F.broadcast(affected), "asset_id", "left_semi"),
            key="asset_id", uid="uid",
        )
        store.stage(chained, unchanged.unionByName(rechained))

    wd = store.read_or_none("waves_data")
    if wd is not None:
        heights = store.read("blocks_microblocks").select("height").distinct()
        store.stage(
            "waves_data",
            wd.join(F.broadcast(heights), "height", "left_semi"),
        )

    if deleted_ts is None:
        return None
    return deleted_ts.replace(second=0, microsecond=0)


# ------------------------------------------------ startup rollback ladder (T4)


def startup_rollback(
    store: TableStore, depth: int = 1, step: int = 500
) -> int | None:
    """Defensive restart ladder (mod.rs:122-137 via get_blocks_rollback_to,
    pg.rs:80-112; defaults config/consumer.rs:18-24): on every consumer
    start, roll the store back ``depth`` blocks below the current height in
    ``step``-sized rungs, so a batch the previous process may have written
    without fully settling is discarded and re-ingested.

    Ladder heights mirror the reference exactly: step = min(step, depth),
    rungs at current-step, current-2*step, ... (staying above current-depth)
    and finally current-depth itself; stored blocks AT those heights become
    (uid, height) targets processed in descending uid order, each rung a
    bounded incremental delete instead of one huge one.  All rungs + the
    single candle repair commit atomically as one store transaction
    (the reference wraps the whole ladder in one Postgres transaction).

    Returns the height ingestion should resume from (last rung height + 1),
    or None when the store is empty (resume from the configured start).
    """
    blocks = store.read_or_none("blocks_microblocks")
    if blocks is None:
        return None
    cur_row = blocks.agg(F.max("height")).collect()[0][0]
    if cur_row is None:
        return None
    current = int(cur_row)
    step = min(step, depth)
    starting = max(current - step, 0)
    final = max(current - depth, 0)
    heights = list(range(starting, final, -step))
    heights.append(final)
    ladder = (
        blocks.filter(F.col("height").isin(heights))
        .select("uid", "height")
        .orderBy(F.desc("uid"))
        .collect()
    )
    if not ladder:
        return None
    watermark: _dt.datetime | None = None
    for rung in ladder:
        wm = rollback_to_uid(store, rung["uid"])
        if wm is not None:
            watermark = wm if watermark is None else min(watermark, wm)
    if watermark is not None:
        recompute_candles(store, watermark)
    store.commit()
    return int(ladder[-1]["height"]) + 1


# ------------------------------------------------------------ batch driver


def process_batch(
    store: TableStore,
    batch_df: DataFrame,
    asset_storage_address: str = "",
    chain_id: int = 87,
) -> None:
    """One foreachBatch invocation: segment the updates into append runs and
    rollbacks (mod.rs:200-230), apply in order, recompute candles once per
    segment that needs it, commit atomically (T1)."""
    meta = (
        batch_df.select("seq", "kind", "ref_id").orderBy("seq").collect()
    )
    if not meta:
        return
    segments: list[tuple[str, int, int] | tuple[str, str]] = []
    run_start = None
    for m in meta:
        if m["kind"] in ("block", "microblock"):
            if run_start is None:
                run_start = m["seq"]
            run_end = m["seq"]
        else:  # rollback closes any open run
            if run_start is not None:
                segments.append(("appends", run_start, run_end))
                run_start = None
            segments.append(("rollback", m["ref_id"]))
    if run_start is not None:
        segments.append(("appends", run_start, run_end))

    for seg in segments:
        if seg[0] == "appends":
            _, lo, hi = seg
            watermark = apply_appends(
                store,
                batch_df.filter((F.col("seq") >= lo) & (F.col("seq") <= hi)),
                asset_storage_address,
                chain_id=chain_id,
            )
        else:
            watermark = apply_rollback(store, seg[1])
        if watermark is not None:
            recompute_candles(store, watermark)
    store.commit()


def run_stream(
    spark: SparkSession,
    events_dir: str,
    store_root: str,
    asset_storage_address: str = "",
    max_files_per_trigger: int = 1,
    start_rollback_depth: int = 1,
    rollback_step: int = 500,
    chain_id: int = 87,
) -> None:
    """S2: file-source stream over an events directory (one JSON file ≈ one
    update batch), available-now trigger (drain then stop).

    Startup performs the T4 defensive rollback ladder first (mod.rs:122-137;
    ``start_rollback_depth``/``rollback_step`` mirror config/consumer.rs:
    18-24): the store's speculative tail is discarded so updates re-delivered
    after a crash reconstruct it.  The file source's checkpoint governs which
    event files are re-read; a crash between store commit and checkpoint
    advance re-delivers the batch, and the ladder + idempotent merges absorb
    the overlap.  Set ``start_rollback_depth=0`` to skip (trusted shutdown).
    """
    if start_rollback_depth > 0:
        startup_rollback(
            TableStore(spark, store_root),
            depth=start_rollback_depth,
            step=rollback_step,
        )
    from ..sources.live_updates import file_updates

    stream = file_updates(spark, events_dir, max_files_per_trigger)

    def _fb(batch_df: DataFrame, _batch_id: int) -> None:
        process_batch(
            TableStore(spark, store_root), batch_df, asset_storage_address,
            chain_id=chain_id,
        )

    q = (
        stream.writeStream.foreachBatch(_fb)
        .option("checkpointLocation", f"{store_root}/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
