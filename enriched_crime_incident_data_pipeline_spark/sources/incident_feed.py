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
- **partitions(start, end)** maps the (start, end] id range onto the
  spool files it intersects — both bounds of every file's id range
  are carried by file NAMES under the append-only contract, so each
  slice reads exactly one file (``slice_width`` optionally splits a
  file's range further) — one executor task per slice, no driver
  loop.
- **read(partition)** runs on executors: parse the slice's file with
  pyarrow's native JSONL reader, filter ``start < incident_id <=
  end`` columnar, yield Arrow RecordBatches.  Re-reading a range is
  deterministic on the append-only spool, which is what makes
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
    def __init__(
        self, path: str, start: int, end: int, file: str | None = None
    ) -> None:
        self.path = path
        self.start = start
        self.end = end
        # the one spool file this slice reads (r10 optimization: the
        # append-only contract gives every file a name-declared id
        # range, so a slice never needs to scan the whole spool);
        # None = the empty well-formed slice of a no-new-data trigger
        self.file = file


def _spool_files(path: str) -> list[str]:
    # NUMERIC sort by the name-carried max id: partitions() derives
    # each file's lower bound from the PREVIOUS file's max id and
    # early-breaks, so a lexicographic sort ("upto-12" < "upto-9")
    # would silently drop rows whenever max ids cross a digit-count
    # boundary.
    return sorted(
        glob.glob(os.path.join(path, "upto-*.jsonl")), key=_file_max_id
    )


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
        # r10 optimization: slices are FILE-ALIGNED. The append-only
        # producer contract (enforced by ``write_spool_file``) means
        # file i's ids lie in (max_{i-1}, max_i] — both bounds carried
        # by file NAMES — so the id range (lo, hi] maps onto exactly
        # the files it intersects, each slice reads ONE file, and no
        # slice ever re-scans the rest of the spool (the r9 shape cut
        # the range into fixed-width slices that each re-parsed every
        # overlapping file: O(spool) JSON work per slice).
        # ``slice_width`` (when set) still splits a single file's
        # range for intra-file parallelism; default is one slice per
        # file — at scale the producer bounds poll size, so files are
        # the natural parallel unit.
        lo, hi = start["max_id"], end["max_id"]
        out: list[InputPartition] = []
        if hi > lo:
            prev: int | None = None  # name-declared min bound (exclusive)
            for f in _spool_files(self._path):
                fhi = _file_max_id(f)
                flo = prev
                prev = fhi
                if fhi <= lo:
                    continue
                if flo is not None and flo >= hi:
                    break  # files are sorted by max id: all later ones out of range
                s = lo if flo is None else max(lo, flo)
                e = min(hi, fhi)
                if e <= s:
                    continue
                width = self._width if self._width > 0 else (e - s)
                c = s
                while c < e:
                    d = min(c + width, e)
                    out.append(_IdRange(self._path, c, d, file=f))
                    c = d
        if not out:
            # no new data this trigger: one empty slice keeps the
            # batch well-formed
            return [_IdRange(self._path, lo, lo)]
        return out

    def read(self, partition: _IdRange) -> Iterator:
        # executor-side, vectorized (r10): the slice's ONE file is
        # parsed by pyarrow's native JSONL reader, range-filtered
        # columnar, and yielded as Arrow RecordBatches — no per-line
        # ``json.loads`` and no per-row tuple pickling across the
        # Python-source boundary. A malformed file falls back to the
        # r9 line-loop (same rows, built into one RecordBatch so the
        # yield type stays uniform).
        if partition.file is None or partition.start >= partition.end:
            return
        import pyarrow as pa

        schema = pa.schema(
            [
                ("incident_id", pa.int64()),
                ("ts", pa.string()),
                ("location", pa.string()),
                ("nature", pa.string()),
            ]
        )
        try:
            import pyarrow.json as pj

            tbl = pj.read_json(
                partition.file,
                read_options=pj.ReadOptions(use_threads=False),
                parse_options=pj.ParseOptions(
                    explicit_schema=schema,
                    unexpected_field_behavior="ignore",
                ),
            )
        except Exception:
            tbl = self._read_file_lines(partition.file, schema)
        import pyarrow.compute as pc

        ids = tbl.column("incident_id")
        sel = tbl.filter(
            pc.and_(
                pc.greater(ids, pa.scalar(partition.start, pa.int64())),
                pc.less_equal(ids, pa.scalar(partition.end, pa.int64())),
            )
        )
        for batch in sel.to_batches():
            if batch.num_rows:
                yield batch

    @staticmethod
    def _read_file_lines(f: str, schema) -> "object":
        """Line-loop fallback (exact r9 semantics, batched): skip
        blank lines, ``json.loads`` the rest."""
        import pyarrow as pa

        ids: list[int] = []
        tss: list[str | None] = []
        locs: list[str | None] = []
        nats: list[str | None] = []
        with open(f) as fh:
            for line in fh:
                if not line.strip():
                    continue
                r = json.loads(line)
                ids.append(int(r["incident_id"]))
                tss.append(r.get("ts"))
                locs.append(r.get("location"))
                nats.append(r.get("nature"))
        return pa.table(
            [
                pa.array(ids, pa.int64()),
                pa.array(tss, pa.string()),
                pa.array(locs, pa.string()),
                pa.array(nats, pa.string()),
            ],
            schema=schema,
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
        # 0 = one slice per spool file (default; see partitions());
        # a positive width additionally splits each file's id range.
        # NOTE (ADVICE r10): intra-file sub-slices each parse the
        # WHOLE file and range-filter columnar, so a file split k ways
        # is parsed k times — use slice_width only when one file's
        # range is too large for a single task and the k-fold parse is
        # cheaper than the lost parallelism.
        width = int(self.options.get("slice_width", "0"))
        return IncidentFeedStreamReader(path, width)


def write_spool_frame(path: str, pdf) -> str:
    """Vectorized producer twin of :func:`write_spool_file` for bulk
    polls: a pandas DataFrame with columns ``incident_id / ts /
    location / nature`` is rendered to JSONL by ``to_json`` (one
    native call, no per-row ``json.dumps``) under the same
    append-only contract and atomic-rename publish."""
    os.makedirs(path, exist_ok=True)
    if len(pdf) == 0:
        raise ValueError(
            "cannot spool an empty poll: the file NAME carries the new "
            "high-water mark, so an empty batch has no offset to publish "
            "(skip the poll instead)"
        )
    max_id = int(pdf["incident_id"].max())
    existing = _spool_files(path)
    if existing:
        prev = max(_file_max_id(f) for f in existing)
        lo = int(pdf["incident_id"].min())
        if lo <= prev:
            raise ValueError(
                f"spool append-only violation: new min id {lo} <= "
                f"published high-water {prev}"
            )
    out = os.path.join(path, f"upto-{max_id}.jsonl")
    tmp = out + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(pdf.to_json(orient="records", lines=True))
        fh.write("\n")
    os.replace(tmp, out)
    return out


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
