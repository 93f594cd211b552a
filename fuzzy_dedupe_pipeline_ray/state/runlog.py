"""Per-stage run log — the analog of the reference's ``dedupe_log`` table
(``main.py:119-142``: stage_name/status/start/end/records/duration/error),
extended with per-partition lineage rows (partition_id ≥ 0; −1 = stage
total) per FIXTURES.md §3."""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq

SCHEMA = pa.schema([
    ("stage_name", pa.string()),
    ("status", pa.string()),
    ("start_time", pa.timestamp("us")),
    ("end_time", pa.timestamp("us")),
    ("records_processed", pa.int64()),
    ("duration_ms", pa.int64()),
    ("error_message", pa.string()),
    ("partition_id", pa.int32()),
])


class RunLog:
    def __init__(self):
        self.rows: list[dict] = []

    def log_stage(self, stage_name: str, status: str, start: float, end: float,
                  records: int, error: "str | None" = None,
                  partitions: "list[dict] | None" = None) -> None:
        def ts(t):
            return datetime.datetime.fromtimestamp(t, tz=datetime.timezone.utc).replace(tzinfo=None)

        self.rows.append({
            "stage_name": stage_name, "status": status,
            "start_time": ts(start), "end_time": ts(end),
            "records_processed": records,
            "duration_ms": int((end - start) * 1000),
            "error_message": error, "partition_id": -1,
        })
        for p in partitions or []:
            self.rows.append({
                "stage_name": stage_name, "status": status,
                "start_time": ts(start), "end_time": ts(end),
                "records_processed": p["rows"],
                "duration_ms": int((end - start) * 1000),
                "error_message": None, "partition_id": p["partition_id"],
            })

    def to_table(self) -> pa.Table:
        if not self.rows:
            return SCHEMA.empty_table()
        cols = {f.name: [r[f.name] for r in self.rows] for f in SCHEMA}
        return pa.table(cols, schema=SCHEMA)

    def write(self, path: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        pq.write_table(self.to_table(), path)
