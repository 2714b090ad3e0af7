"""Append-only JSONL metrics log (reference `metrics_logging.py:8-40`):
each record gets a `_stamp` epoch-time; the reader skips torn trailing
lines."""

import json
import os
import time


class MetricsLogger:
    def __init__(self, fname, reinitialize=False):
        self.fname = str(fname)
        self.reinitialize = reinitialize
        if os.path.exists(self.fname) and reinitialize:
            print(f"{self.fname} exists, deleting")
            os.remove(self.fname)

    def log(self, record=None, **kwargs):
        """Assumes a single process; records are JSON-serializable."""
        record = {} if record is None else dict(record)
        record.update(kwargs)
        record["_stamp"] = time.time()
        with open(self.fname, "a") as f:
            f.write(json.dumps(record, ensure_ascii=True) + "\n")


def read_records(fname):
    """Load all records from the file, skipping torn trailing lines
    (reference `metrics_logging.py:30-40`)."""
    skipped = 0
    records = []
    with open(fname, "r") as f:
        for line in f:
            if not line.endswith("\n"):
                skipped += 1
                continue
            try:
                records.append(json.loads(line.strip()))
            except ValueError:
                skipped += 1
    if skipped:
        print(f"skipped {skipped} torn/corrupt lines in {fname}")
    return records
