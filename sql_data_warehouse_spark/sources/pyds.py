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
factory function: when this package is imported by file path (e.g. a
driver that loads ``__spark_entry__.py`` directly from a foreign
cwd), Spark workers cannot import it by module name — cloudpickle
ships locally-defined classes by value but module-level ones by
reference, so only the closure form survives.
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
                    try:
                        skip = (s is not None and s["min"] is not None
                                and (float(s["max"]) < lo
                                     or float(s["min"]) > hi))
                    except (TypeError, ValueError):
                        skip = False  # non-numeric stats: never skip
                    if not skip:
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


def register_events_replay_source(spark: SparkSession) -> None:
    """Register the ``events_replay`` STREAMING Python data source:
    replays an events parquet directory in (ts, event_id) order as
    bounded micro-batches with explicit offset management.

    The simple-reader variant reads on the driver (fine for a replay
    fixture; a production feed implements the partition-planning
    ``streamReader`` instead). Python stream sources don't support
    Trigger.AvailableNow — Spark falls back to ONE batch per start —
    so consumers drain with restart loops against one checkpoint;
    offsets persist, and an exactly-once file sink accumulates across
    restarts (gated end-to-end by ``stream_replay_user_totals``).
    """
    if getattr(spark, "_wh_replay_ds_registered", False):
        return

    from pyspark.sql.datasource import (
        DataSource, SimpleDataSourceStreamReader,
    )

    class EventsReplaySource(DataSource):
        @classmethod
        def name(cls):
            return "events_replay"

        def schema(self):
            return ("event_id bigint, ts timestamp, user_id bigint, "
                    "event_type string, value double, props string")

        def simpleStreamReader(self, schema):
            path = self.options["path"]
            batch_rows = int(self.options.get("batch_rows", "5000"))
            # Spark's Arrow schema for TimestampType is tz-aware with
            # the SESSION timezone id; the registered consumer passes
            # it via .option("tz", ...) so the batch schema matches
            # under any driver session, not just UTC ones.
            tz = self.options.get("tz", "UTC")

            class _Reader(SimpleDataSourceStreamReader):
                # Serves each offset range as Arrow RecordBatches —
                # the runner's ``records_to_arrow_batches`` forwards
                # RecordBatch iterators untouched, so the backlog
                # crosses the Python→JVM boundary columnar instead of
                # one pickled row at a time (guide §4: the row path
                # paid to_pylist + a Python tuple sort + per-row
                # serialization; the Arrow path is a native sort_by +
                # zero-copy slices). Offsets are unchanged: row
                # position in the (ts, event_id)-sorted backlog, a
                # total order, so batches are bit-identical to the
                # row implementation's.
                def __init__(self):
                    self._table = None

                def _data(self):
                    if self._table is None:
                        import pyarrow as pa
                        import pyarrow.dataset as ds

                        t = ds.dataset(path, format="parquet").to_table(
                            columns=["event_id", "ts", "user_id",
                                     "event_type", "value", "props"])
                        # parquet INT96 timestamps arrive as naive ns;
                        # Spark expects tz-aware µs from Arrow sources
                        # (values are µs-precision UTC instants written
                        # by Spark, so the cast is lossless and the
                        # naive→tz attach reads them as the same
                        # instants Spark wrote)
                        ts_idx = t.schema.get_field_index("ts")
                        t = t.set_column(
                            ts_idx, pa.field("ts", pa.timestamp("us", tz)),
                            t.column("ts").cast(pa.timestamp("us", tz)))
                        self._table = t.sort_by(
                            [("ts", "ascending"), ("event_id", "ascending")])
                    return self._table

                def _slice_batches(self, pos, end):
                    if end <= pos:
                        return iter([])
                    return iter(self._data().slice(pos, end - pos)
                                .to_batches())

                def initialOffset(self):
                    return {"pos": 0}

                def read(self, start):
                    pos = start["pos"]
                    end = min(pos + batch_rows, self._data().num_rows)
                    return self._slice_batches(pos, end), {"pos": end}

                def readBetweenOffsets(self, start, end):
                    return self._slice_batches(start["pos"], end["pos"])

            return _Reader()

    spark.dataSource.register(EventsReplaySource)
    spark._wh_replay_ds_registered = True
