"""``spark.read.format("shmr")`` — the reference's native partition
files as a first-class Spark data source (Spark 4 Python DataSource
API).

The reference's storage model (SURVEY.md §1): a dataset is a sorted
glob of newline-delimited files, one record per line, codec by
convention (ND-JSON default / CSV / raw text —
/root/reference/shmr/funcs.py:7-25), transparent gzip/bz2 by extension
(/root/reference/shmr/misc.py:6-20), optional header rows
(--skip_nrows, /root/reference/shmr/partition.py:31-33), and a
``<stem>.meta`` sidecar carrying ``{"n_records": N}``
(/root/reference/shmr/partition_writer.py:64-85).

This source maps that model onto Spark's:

- one InputPartition per FILE — exactly the reference's unit of
  parallelism (one xargs process per partition ≙ one Spark task);
- codec/skip_nrows as read options; gz/bz2 resolved per file;
- the writer emits one ``part-NNNNN.json[.gz]`` per Spark partition
  WITH the ``.meta`` sidecar, so output datasets are valid inputs for
  the reference CLI itself (and for our compat CLI's memoized count).

Options (read): ``path`` (file or glob), ``codec`` = json|csv|text
(default json), ``skip_nrows`` (per file, default 0).
Schema: pass one explicitly for json/csv; defaults are
``value string`` (text) and inference-free all-string columns are NOT
guessed — json without a schema infers from the first file's first
1000 lines (driver-side, one small read).

Usage:
    spark.dataSource.register(ShmrDataSource)
    df = (spark.read.format("shmr").schema("a int, b string")
          .option("codec", "json").load("/data/part-*.json.gz"))
    df.write.format("shmr").option("codec", "json").save("/out")
"""

from __future__ import annotations

import bz2
import glob as globmod
import gzip
import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType, _parse_datatype_string


def _open_by_ext(path: str, mode: str):
    if path.endswith(".gz"):
        return gzip.open(path, mode)
    if path.endswith(".bz2"):
        return bz2.open(path, mode)
    return open(path, mode)


def _expand(path: str) -> list[str]:
    paths = sorted(globmod.glob(path)) if any(c in path for c in "*?[") else [path]
    if not paths:
        raise FileNotFoundError(f"no partition matches: {path}")
    return paths


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ShmrReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.codec = options.get("codec", "json")
        self.skip_nrows = int(options.get("skip_nrows", 0))
        self.paths = _expand(options["path"])

    def partitions(self) -> Sequence[InputPartition]:
        # one task per file — the reference's parallelism unit
        return [_FilePartition(p) for p in self.paths]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        import csv as csvmod
        import io as iomod

        names = self.schema_.fieldNames()
        with _open_by_ext(partition.path, "rb") as f:
            for _ in range(self.skip_nrows):
                next(f, None)
            if self.codec == "json":
                for line in f:
                    rec = json.loads(line)
                    yield tuple(rec.get(n) for n in names)
            elif self.codec == "csv":
                for line in f:
                    row = next(csvmod.reader(iomod.StringIO(line.decode())))
                    yield tuple(row[: len(names)])
            elif self.codec == "text":
                for line in f:
                    yield (line.decode().rstrip("\r\n"),)
            else:
                raise ValueError(f"unknown codec: {self.codec}")


class _WroteFile(WriterCommitMessage):
    def __init__(self, path: str, n: int):
        self.path = path
        self.n = n


class ShmrWriter(DataSourceWriter):
    def __init__(self, schema: StructType, options: dict, overwrite: bool):
        self.schema_ = schema
        self.path = options["path"]
        self.codec = options.get("codec", "json")
        self.compression = options.get("compression", "")  # "", gz, bz2
        self.overwrite = overwrite

    def write(self, iterator) -> _WroteFile:
        import csv as csvmod
        import io as iomod

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        names = self.schema_.fieldNames()
        ext = {"json": "json", "csv": "csv", "text": "txt"}[self.codec]
        suffix = f".{self.compression}" if self.compression else ""
        out = os.path.join(self.path, f"part-{pid:05d}.{ext}{suffix}")
        os.makedirs(self.path, exist_ok=True)
        n = 0
        with _open_by_ext(out, "wb") as g:
            for row in iterator:
                if self.codec == "json":
                    line = json.dumps(
                        dict(zip(names, row)), separators=(",", ":")
                    ).encode()
                elif self.codec == "csv":
                    buf = iomod.StringIO()
                    csvmod.writer(buf).writerow(list(row))
                    line = buf.getvalue().rstrip("\r\n").encode()
                else:
                    line = str(row[0]).encode()
                g.write(line + b"\n")
                n += 1
        # .meta sidecar — the reference's count memo
        # (/root/reference/shmr/partition_writer.py:64-85)
        stem = out
        for e in (".gz", ".bz2"):
            if stem.endswith(e):
                stem = stem[: -len(e)]
        with open(os.path.splitext(stem)[0] + ".meta", "w") as m:
            json.dump({"n_records": n}, m)
        return _WroteFile(out, n)

    def commit(self, messages) -> None:
        total = sum(m.n for m in messages)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            json.dump({"n_records": total, "n_files": len(messages)}, f)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class ShmrDataSource(DataSource):
    """Register with ``spark.dataSource.register(ShmrDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "shmr"

    def schema(self):
        codec = self.options.get("codec", "json")
        if codec == "text":
            return "value string"
        if codec == "json":
            # driver-side inference from a bounded sample of the first
            # file (explicit schemas are the production path)
            first = _expand(self.options["path"])[0]
            keys: dict[str, str] = {}
            with _open_by_ext(first, "rb") as f:
                for _ in range(int(self.options.get("skip_nrows", 0))):
                    next(f, None)
                for i, line in enumerate(f):
                    if i >= 1000:
                        break
                    rec = json.loads(line)
                    if not isinstance(rec, dict):
                        raise ValueError(
                            "schema inference needs object records; pass an "
                            "explicit schema for scalar/array ND-JSON"
                        )
                    for k, v in rec.items():
                        t = (
                            "bigint"
                            if isinstance(v, bool) is False and isinstance(v, int)
                            else "double"
                            if isinstance(v, float)
                            else "boolean"
                            if isinstance(v, bool)
                            else "string"
                        )
                        prev = keys.get(k)
                        if prev is None:
                            keys[k] = t
                        elif prev != t:
                            # widen int→double, anything else → string
                            keys[k] = (
                                "double"
                                if {prev, t} == {"bigint", "double"}
                                else "string"
                            )
            if not keys:
                raise ValueError("cannot infer schema from an empty partition")
            return ", ".join(f"{k} {t}" for k, t in keys.items())
        raise ValueError(f"codec {codec} requires an explicit schema")

    def reader(self, schema) -> ShmrReader:
        if isinstance(schema, str):
            schema = _parse_datatype_string(schema)
        return ShmrReader(schema, dict(self.options))

    def writer(self, schema, overwrite: bool) -> ShmrWriter:
        if isinstance(schema, str):
            schema = _parse_datatype_string(schema)
        return ShmrWriter(schema, dict(self.options), overwrite)
