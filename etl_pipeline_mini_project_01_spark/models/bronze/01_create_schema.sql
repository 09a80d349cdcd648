-- S9 layer DDL, executed in lexical order by sources/ddl.py (mirrors the
-- reference's model_executor running models/bronze/*.sql,
-- /root/reference/src/loader/model_executor.py:32-110).
CREATE DATABASE IF NOT EXISTS bronze;
