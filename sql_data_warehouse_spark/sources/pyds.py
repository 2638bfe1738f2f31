"""PySpark 4 custom Python DataSource for TxnTable.

Exposes the manifest-log tables (sources/txn.py) through the native
reader API::

    register_txn_datasource(spark)
    df = (spark.read.format("txn")
          .option("path", root)
          .option("version", "3")              # optional time travel
          .option("prune", "price_cents:0:99") # optional stats pruning
          .load())

Why a custom source instead of ``spark.read.parquet(*files)``: the
data source owns the snapshot resolution — readers get manifest
isolation, version selection, and file-stats pruning *inside* the
scan, one ``InputPartition`` per committed file, so Spark schedules
exactly the surviving files with normal task parallelism and each
partition streams Arrow RecordBatches (no Python row loop).

Everything (DataSource, Reader, Partition) is defined INSIDE the
factory function: the grading/driver harness imports this package by
file path, so Spark workers cannot import it by name — cloudpickle
ships locally-defined classes by value, module-level ones by
reference (see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_ARROW_TO_DDL = {
    "int64": "bigint",
    "int32": "int",
    "double": "double",
    "float": "float",
    "string": "string",
    "large_string": "string",
    "bool": "boolean",
    "timestamp[us]": "timestamp",
    "timestamp[ns]": "timestamp",
    "date32[day]": "date",
    "binary": "binary",
}


def register_txn_datasource(spark: SparkSession) -> None:
    """Register the ``txn`` format on this session (idempotent)."""
    if getattr(spark, "_wh_txn_ds_registered", False):
        return

    from pyspark.sql.datasource import (
        DataSource, DataSourceReader, InputPartition,
    )

    arrow_to_ddl = dict(_ARROW_TO_DDL)

    class _TxnFilePartition(InputPartition):
        def __init__(self, path: str):
            self.path = path

    class _TxnReader(DataSourceReader):
        def __init__(self, options, ddl_cols):
            self._options = options
            self._ddl_cols = ddl_cols  # [(name, ddl_type)] declared order

        def partitions(self):
            import json
            import os

            root = self._options["path"]
            mdir = os.path.join(root, "_txn")
            versions = sorted(
                int(n[1:-5]) for n in os.listdir(mdir)
                if n.startswith("v") and n.endswith(".json"))
            v = int(self._options.get("version", versions[-1]))
            with open(os.path.join(mdir, f"v{v:08d}.json")) as fh:
                manifest = json.load(fh)
            files = manifest["files"]
            prune = self._options.get("prune")
            if prune:
                col, lo, hi = prune.split(":")
                lo, hi = float(lo), float(hi)
                kept = []
                for f in files:
                    s = f.get("stats", {}).get(col)
                    if (s is None or s["min"] is None
                            or not (float(s["max"]) < lo
                                    or float(s["min"]) > hi)):
                        kept.append(f)
                files = kept
            return [
                _TxnFilePartition(os.path.join(root, f["path"]))
                for f in files
            ]

        def read(self, partition):
            import pyarrow.parquet as pq

            table = pq.read_table(partition.path)
            # align to the declared schema (order + evolution: a file
            # written before a schema-evolving merge lacks new cols)
            import pyarrow as pa

            cols = []
            for name, _ in self._ddl_cols:
                if name in table.column_names:
                    cols.append(table.column(name))
                else:
                    cols.append(pa.nulls(len(table)))
            yield from pa.table(
                cols, names=[n for n, _ in self._ddl_cols]).to_batches()

    class TxnDataSource(DataSource):
        @classmethod
        def name(cls):
            return "txn"

        def schema(self):
            import json
            import os

            import pyarrow.parquet as pq

            root = self.options["path"]
            mdir = os.path.join(root, "_txn")
            versions = sorted(
                int(n[1:-5]) for n in os.listdir(mdir)
                if n.startswith("v") and n.endswith(".json"))
            v = int(self.options.get("version", versions[-1]))
            with open(os.path.join(mdir, f"v{v:08d}.json")) as fh:
                manifest = json.load(fh)
            # union of file schemas, first-seen order (schema evolution)
            seen: dict[str, str] = {}
            for f in manifest["files"]:
                sch = pq.read_schema(os.path.join(root, f["path"]))
                for field in sch:
                    if field.name not in seen:
                        seen[field.name] = arrow_to_ddl.get(
                            str(field.type), str(field.type))
            self._ddl_cols = list(seen.items())
            return ", ".join(f"{n} {t}" for n, t in self._ddl_cols)

        def reader(self, schema):
            return _TxnReader(self.options, self._ddl_cols)

    spark.dataSource.register(TxnDataSource)
    spark._wh_txn_ds_registered = True
