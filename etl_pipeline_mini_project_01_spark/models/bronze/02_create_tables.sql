-- Bronze landing table: cleaned events + lineage columns (reference
-- bronze DDL at models/bronze/02_create_bronze_tables.sql declares every
-- column explicitly; so do we). External parquet, partitioned by
-- date_key - the engine's replacement for the reference's b-tree indexes
-- is partition pruning + parquet min/max skipping.
CREATE TABLE IF NOT EXISTS bronze.events (
    event_id BIGINT,
    ts TIMESTAMP_NTZ,
    user_id BIGINT,
    event_type STRING,
    value DOUBLE,
    props STRING,
    date_key INT,
    ingestion_timestamp TIMESTAMP_NTZ,
    pipeline_run_id STRING,
    data_version STRING
) USING PARQUET
PARTITIONED BY (date_key)
LOCATION '${OUT_DIR}/bronze/events';
