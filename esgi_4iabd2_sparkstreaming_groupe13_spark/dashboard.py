"""Dashboard read path — parity with ``taxi_dashboard.py`` (reference
entry point 3, SURVEY §3.3), minus the Streamlit chrome.

The reference dashboard polls the four output directories, loads the
two most-recent batch files per directory (O5), defensively projects
display columns (P8), and renders top-locations sorted by trip_count
(O4). This module reproduces that contract as plain data (dict /
DataFrame) so any front end — Streamlit, a notebook, a JSON API — can
render it; ``render_text`` is the built-in zero-dependency view.

Spark is deliberately NOT used here: like the reference, the read path
is a lightweight out-of-engine consumer (pandas over NDJSON files).
"""

from __future__ import annotations

import json
from pathlib import Path

import pandas as pd

OUTPUT_DIRS = ["raw", "pickup_agg", "dropoff_agg", "combined_agg"]

#: Display columns per directory (P8 intersection semantics —
#: ``taxi_dashboard.py:143-155``).
DISPLAY_COLUMNS = {
    "raw": [
        "batch_id",
        "tpep_pickup_datetime",
        "PULocationID",
        "DOLocationID",
        "trip_distance",
        "fare_amount",
        "total_amount",
    ],
    "pickup_agg": ["PULocationID", "batch_id", "trip_count", "aggregation_type"],
    "dropoff_agg": ["DOLocationID", "batch_id", "trip_count", "aggregation_type"],
    "combined_agg": ["location_id", "batch_id", "trip_count", "aggregation_type"],
}


def latest_batch_files(directory: str, max_batches: int = 2) -> list[Path]:
    """O5 (``taxi_dashboard.py:18-29``): newest ``max_batches`` NDJSON
    files by mtime."""
    d = Path(directory)
    if not d.is_dir():
        return []
    candidates = list(d.glob("*.json"))
    # idempotent-sink layout: files live under batch_id=N/ partitions
    candidates += list(d.glob("batch_id=*/*.json"))
    files = sorted(
        (p for p in candidates if p.is_file()),
        key=lambda p: p.stat().st_mtime,
        reverse=True,
    )
    return files[:max_batches]


def load_ndjson(files: list[Path]) -> pd.DataFrame:
    """F9/U2: parse NDJSON lines, concat (``taxi_dashboard.py:33-52``)."""
    frames = []
    for f in files:
        rows = []
        with open(f) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    rows.append(json.loads(line))
        if rows:
            frames.append(pd.DataFrame(rows))
    if not frames:
        return pd.DataFrame()
    return pd.concat(frames, ignore_index=True)


def project_display(df: pd.DataFrame, name: str) -> pd.DataFrame:
    """P8: keep only display columns that actually arrived."""
    wanted = DISPLAY_COLUMNS.get(name, list(df.columns))
    present = [c for c in wanted if c in df.columns]
    return df[present] if present else df


def top_locations(df: pd.DataFrame, key: str, k: int = 10) -> pd.DataFrame:
    """O4 (``taxi_dashboard.py:174,193``): busiest locations view."""
    if df.empty or key not in df.columns or "trip_count" not in df.columns:
        return pd.DataFrame()
    return (
        df.groupby(key, as_index=False)["trip_count"]
        .sum()
        .sort_values(
            by=["trip_count", key], ascending=[False, True], ignore_index=True
        )
        .head(k)
    )


def snapshot(processed_dir: str, max_batches: int = 2) -> dict:
    """One dashboard refresh: latest data + top-k views per directory."""
    out: dict = {"dirs": {}}
    for name in OUTPUT_DIRS:
        files = latest_batch_files(f"{processed_dir}/{name}", max_batches)
        df = load_ndjson(files)
        if not df.empty and "batch_id" in df.columns:
            df = df.sort_values(by="batch_id", ascending=False, ignore_index=True)
        entry: dict = {
            "files": [f.name for f in files],
            "rows": int(len(df)),
            "data": project_display(df, name),
        }
        key = {
            "pickup_agg": "PULocationID",
            "dropoff_agg": "DOLocationID",
            "combined_agg": "location_id",
        }.get(name)
        if key:
            entry["top_locations"] = top_locations(df, key)
        out["dirs"][name] = entry
    return out


def render_text(snap: dict, k: int = 5) -> str:
    """Zero-dependency text rendering of a snapshot."""
    lines = []
    for name, entry in snap["dirs"].items():
        lines.append(f"== {name}: {entry['rows']} rows from {entry['files']}")
        top = entry.get("top_locations")
        if top is not None and not top.empty:
            lines.append(top.head(k).to_string(index=False))
    return "\n".join(lines)
