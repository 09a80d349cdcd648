-- Silver star schema (reference models/silver/*.sql: dim_date,
-- dim_account SCD2, fact): explicit columns, external parquet over the
-- pipeline's atomic-swap locations.
CREATE TABLE IF NOT EXISTS silver.dim_date (
    date_key INT,
    full_date DATE,
    year INT,
    quarter INT,
    month INT,
    month_name STRING,
    week INT,
    day_of_month INT,
    day_of_week INT,
    day_name STRING,
    is_weekend BOOLEAN
) USING PARQUET
LOCATION '${OUT_DIR}/silver/dim_date';

CREATE TABLE IF NOT EXISTS silver.dim_account (
    c_custkey BIGINT,
    c_name STRING,
    c_nationkey INT,
    c_acctbal DOUBLE,
    c_mktsegment STRING,
    valid_from TIMESTAMP_NTZ,
    valid_to TIMESTAMP_NTZ,
    is_current BOOLEAN,
    account_key INT
) USING PARQUET
LOCATION '${OUT_DIR}/silver/dim_account';

CREATE TABLE IF NOT EXISTS silver.fact (
    event_natural_key BIGINT,
    date_key INT,
    account_key INT,
    event_type STRING,
    value DOUBLE,
    ingestion_timestamp TIMESTAMP_NTZ,
    pipeline_run_id STRING
) USING PARQUET
LOCATION '${OUT_DIR}/silver/fact';
