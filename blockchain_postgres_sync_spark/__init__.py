"""PySpark-native analytics engine with the query and data-processing
capabilities of wavesplatform/blockchain-postgres-sync (data-service-consumer).

The reference (/root/reference, Rust + Diesel + PostgreSQL) is a streaming
blockchain ETL whose query surface is its schema: 18 typed transaction tables,
SCD-2 asset history, OHLCV candles over 13 tumbling intervals, and three SQL
views.  This package re-expresses every operator Spark-first (DataFrame / SQL /
Structured Streaming) — see SURVEY.md for the operator-by-operator mapping.

Layout:
    session       SparkSession factory (UTC, AQE, sane shuffle defaults)
    constants     MAX_UID, WAVES sentinel, candle interval cascade
    schemas       explicit StructTypes for every table (never inferSchema)
    functions/    scalar function surface: codecs (base58/base64), waves
                  address derivation, text analysis, vector math
    operators/    uids (deterministic W3), scd (SCD-2 W1/A8), candles (A1-A4),
                  dedup (exact/minhash/simhash), similarity (ANN)
    sources/      event-batch decode (S3), table loaders
    plans/        views (decimals/tickers/assets), the benchmark catalog
    streaming/    foreachBatch pipeline (T1), reorg: squash + rollback (T2/T3)
"""

__version__ = "0.1.0"
