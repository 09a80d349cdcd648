"""S9: literal DDL-script executor.

The reference executes `.sql` model files in lexical order per layer
(/root/reference/src/loader/model_executor.py:32-110: bronze -> silver ->
gold, sorted filenames, statement-by-statement with per-file logging).
The engine mirrors that exactly with `spark.sql`: the DDL files under
`etl_pipeline_mini_project_01_spark/models/` declare the medallion
catalog (databases + explicit-schema external parquet tables) and the
executor is the pipeline's step 0.

`${VAR}` placeholders in the scripts are substituted from the caller's
mapping (the reference parameterizes schema names the same way via its
config object).
"""

from __future__ import annotations

import os
from glob import glob

from pyspark.sql import SparkSession

LAYERS = ("bronze", "silver", "gold")

#: Default models dir: the package's own DDL scripts.
MODELS_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "models")


def split_statements(script: str) -> list[str]:
    """Strip `--` comment lines, then split on ';', dropping empties.
    (Engine DDL carries no ';' inside literals; the reference's splitter
    makes the same assumption for its model files.)"""
    sql = "\n".join(line for line in script.splitlines()
                    if not line.strip().startswith("--"))
    return [chunk.strip() for chunk in sql.split(";") if chunk.strip()]


def execute_ddl_scripts(spark: SparkSession,
                        substitutions: dict[str, str] | None = None,
                        models_dir: str = MODELS_DIR,
                        layers: tuple[str, ...] = LAYERS,
                        recreate: bool = False) -> dict[str, int]:
    """Run every models/<layer>/*.sql in layer order, files lexically
    within a layer, statements in file order. Returns per-file statement
    counts (the reference logs the same execution report).

    `recreate=True` drops each layer database first (S8 drop-recreate,
    the reference model executor's default) so CREATE ... IF NOT EXISTS
    cannot pin a table to a stale LOCATION across runs.
    """
    report: dict[str, int] = {}
    for layer in layers:
        if recreate:
            spark.sql(f"DROP DATABASE IF EXISTS {layer} CASCADE")
        for path in sorted(glob(os.path.join(models_dir, layer, "*.sql"))):
            with open(path, encoding="utf-8") as fh:
                text = fh.read()
            for key, val in (substitutions or {}).items():
                text = text.replace("${" + key + "}", val)
            stmts = split_statements(text)
            for stmt in stmts:
                spark.sql(stmt)
            report[f"{layer}/{os.path.basename(path)}"] = len(stmts)
    return report
