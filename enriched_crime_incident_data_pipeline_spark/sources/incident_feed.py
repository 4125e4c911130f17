"""Custom Python STREAMING DataSource: the reference's incremental
incident poller as a first-class Spark structured-streaming source.

The reference polls the PD activity page and ingests incidents past
its ``MAX(incident_ts)`` watermark
(`/root/reference/src/scrape/normanpd.py:23-27`,
`src/db/incidents.py` conflict-skip insert).  The engine's file-source
streams already model the per-file arrival shape; THIS source models
the poller itself with the Spark 4 Python ``DataSourceStreamReader``
API — offsets, range partitions, executor-side reads, replayable
commits — so the ingest is exactly-once by construction instead of
by conflict-skip:

- **offset** = ``{"max_id": N}``, the high-water incident id (the
  reference's watermark, made a real streaming offset).
- **latestOffset** lists the spool directory only — feed files are
  named ``upto-<maxid>.jsonl`` by the producer (a real poller
  publishes its high-water mark), so advancing the offset reads NO
  data on the driver.
- **partitions(start, end)** splits the (start, end] id range into
  fixed-width slices — one executor task per slice, no driver loop.
- **read(partition)** runs on executors: scan spool files whose
  name-declared max id exceeds the slice start, parse JSON lines,
  emit rows with ``start < incident_id <= end``.  Re-reading a range
  is deterministic on the append-only spool, which is what makes
  checkpoint replay exactly-once.

Hermetic by design (the engine's standing boundary): the spool is
local JSON-lines files written by a driver-side fetch step; the
network never enters the engine.  Schema:
``incident_id bigint, ts string, location string, nature string``.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_SCHEMA = "incident_id bigint, ts string, location string, nature string"


class _IdRange(InputPartition):
    def __init__(self, path: str, start: int, end: int) -> None:
        self.path = path
        self.start = start
        self.end = end


def _spool_files(path: str) -> list[str]:
    return sorted(glob.glob(os.path.join(path, "upto-*.jsonl")))


def _file_max_id(f: str) -> int:
    stem = os.path.basename(f)
    return int(stem[len("upto-") : -len(".jsonl")])


class IncidentFeedStreamReader(DataSourceStreamReader):
    def __init__(self, path: str, slice_width: int) -> None:
        self._path = path
        self._width = slice_width

    def initialOffset(self) -> dict:
        return {"max_id": -1}

    def latestOffset(self) -> dict:
        files = _spool_files(self._path)
        if not files:
            return {"max_id": -1}
        return {"max_id": max(_file_max_id(f) for f in files)}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        lo, hi = start["max_id"], end["max_id"]
        if hi <= lo:
            # no new data this trigger: one empty slice keeps the
            # batch well-formed
            return [_IdRange(self._path, lo, lo)]
        out = []
        s = lo
        while s < hi:
            e = min(s + self._width, hi)
            out.append(_IdRange(self._path, s, e))
            s = e
        return out

    def read(self, partition: _IdRange) -> Iterator[tuple]:
        # executor-side: only files whose declared max id can contain
        # ids past the slice start are opened (name-carried skip
        # bound — the spool twin of parquet min/max pruning)
        for f in _spool_files(partition.path):
            if _file_max_id(f) <= partition.start:
                continue
            with open(f) as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    r = json.loads(line)
                    rid = int(r["incident_id"])
                    if partition.start < rid <= partition.end:
                        yield (
                            rid,
                            r.get("ts"),
                            r.get("location"),
                            r.get("nature"),
                        )

    def commit(self, end: dict) -> None:
        # the spool is append-only; nothing to clean up. A production
        # spool would garbage-collect files wholly below `end` here.
        pass


class IncidentFeedDataSource(DataSource):
    """``spark.readStream.format("incident_feed").option("path", dir)``
    → incremental incident rows, offset = high-water incident id."""

    @classmethod
    def name(cls) -> str:
        return "incident_feed"

    def schema(self) -> str:
        return _SCHEMA

    def streamReader(self, schema) -> IncidentFeedStreamReader:
        path = self.options.get("path")
        if not path:
            raise ValueError("incident_feed source requires a path")
        width = int(self.options.get("slice_width", "1000"))
        return IncidentFeedStreamReader(path, width)


def write_spool_file(path: str, rows: list[dict]) -> str:
    """Producer helper: append one poll's rows as ``upto-<maxid>.jsonl``
    (the name carries the new high-water mark). Rows must all exceed
    the spool's current max id — the append-only contract replay
    depends on."""
    os.makedirs(path, exist_ok=True)
    if not rows:
        raise ValueError(
            "cannot spool an empty poll: the file NAME carries the new "
            "high-water mark, so an empty batch has no offset to publish "
            "(skip the poll instead)"
        )
    max_id = max(int(r["incident_id"]) for r in rows)
    existing = _spool_files(path)
    if existing:
        prev = max(_file_max_id(f) for f in existing)
        lo = min(int(r["incident_id"]) for r in rows)
        if lo <= prev:
            raise ValueError(
                f"spool append-only violation: new min id {lo} <= "
                f"published high-water {prev}"
            )
    out = os.path.join(path, f"upto-{max_id}.jsonl")
    tmp = out + ".tmp"
    with open(tmp, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    os.replace(tmp, out)
    return out
