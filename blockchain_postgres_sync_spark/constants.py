"""Engine constants mirroring the reference's semantics.

Citations into /root/reference:
- MAX_UID sentinel for open SCD-2 rows: src/lib/consumer/repo/pg.rs:31
  (``i64::MAX - 1`` = 9223372036854775806).
- WAVES sentinel asset (empty asset-id bytes): src/lib/waves.rs:79-85;
  decimals view constant row: migrations/.../up.sql:420-430.
- Deterministic uid ``height * 100000 + seq``: src/lib/consumer/models/txs/
  convert.rs:45-72 (per-height sequence) and mod.rs:41.
- Candle interval cascade: src/lib/consumer/models/candles.rs:39-52.
- Interval truncation: migrations/.../up.sql:496-528 (`_to_raw_timestamp`,
  `_trunc_ts_by_secs`): epoch-floor for sub-day, date_trunc for 1d/1w/1M.
"""

from __future__ import annotations

MAX_UID = 9_223_372_036_854_775_806  # pg.rs:31: open end of an SCD-2 chain
WAVES_ASSET_ID = "WAVES"
WAVES_DECIMALS = 8
UID_HEIGHT_MULTIPLIER = 100_000  # convert.rs:52-58: < 100000 txs per height

# interval name -> truncation spec: ("secs", n) epoch-floor, or
# ("trunc", unit) for calendar units (up.sql:496-519).
INTERVALS: dict[str, tuple[str, object]] = {
    "1m": ("secs", 60),
    "5m": ("secs", 300),
    "15m": ("secs", 900),
    "30m": ("secs", 1800),
    "1h": ("secs", 3600),
    "2h": ("secs", 7200),
    "3h": ("secs", 10800),
    "4h": ("secs", 14400),
    "6h": ("secs", 21600),
    "12h": ("secs", 43200),
    "1d": ("trunc", "day"),
    "1w": ("trunc", "week"),
    "1M": ("trunc", "month"),
}

# (source_interval, destination_interval) re-aggregation cascade,
# exactly models/candles.rs:39-52 (CANDLE_INTERVALS).
CANDLE_CASCADE: list[tuple[str, str]] = [
    ("1m", "5m"),
    ("5m", "15m"),
    ("15m", "30m"),
    ("30m", "1h"),
    ("1h", "2h"),
    ("1h", "3h"),
    ("2h", "4h"),
    ("3h", "6h"),
    ("6h", "12h"),
    ("12h", "1d"),
    ("1d", "1w"),
    ("1d", "1M"),
]

ALL_INTERVALS: list[str] = ["1m"] + [dst for _, dst in CANDLE_CASCADE]

# Money/price columns: Postgres NUMERIC -> DecimalType with enough scale that
# price scaling (price * 10^dec, pg.rs:708-713) and quote_volume sums stay
# exact (SURVEY.md §7.4 hard part 2).
CANDLE_DECIMAL_PRECISION = 38
CANDLE_DECIMAL_SCALE = 10
