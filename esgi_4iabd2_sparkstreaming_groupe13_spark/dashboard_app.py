"""Streamlit rendering of the dashboard — parity with the reference's
``taxi_dashboard.py:96-206`` (sidebar freshness + producer diagnostics,
two-column layout, pickup/dropoff tabs with tables and bar charts,
auto-refresh loop).

Split in two layers so the render is testable without Streamlit (the
container has no ``streamlit``; the import is gated):

* :func:`build_view_model` — pure snapshot → display shaping (timestamp
  formatting, ``*LocationID`` → ``location_id`` rename, trip_count
  descending sort). Unit-tested.
* :func:`render_streamlit` / :func:`main` — the Streamlit chrome, a
  1:1 re-expression of the reference layout over the view model.

Run with::

    streamlit run -m esgi_4iabd2_sparkstreaming_groupe13_spark.dashboard_app -- --processed-dir data/processed
"""

from __future__ import annotations

import time
from datetime import datetime
from pathlib import Path

import pandas as pd

try:
    from .dashboard import OUTPUT_DIRS, latest_batch_files, snapshot
except ImportError:
    # `streamlit run <path>` executes the file as __main__ with no
    # parent package (docker/Dockerfile.dashboard). Depending on
    # whether the launcher put the repo root or the package dir on
    # sys.path, exactly one of these succeeds.
    try:
        from esgi_4iabd2_sparkstreaming_groupe13_spark.dashboard import (  # type: ignore
            OUTPUT_DIRS,
            latest_batch_files,
            snapshot,
        )
    except ImportError:
        from dashboard import (  # type: ignore
            OUTPUT_DIRS,
            latest_batch_files,
            snapshot,
        )

try:  # pragma: no cover - exercised only where streamlit is installed
    import streamlit as st

    HAS_STREAMLIT = True
except ImportError:  # pragma: no cover
    st = None
    HAS_STREAMLIT = False

REFRESH_INTERVAL = 5  # seconds — taxi_dashboard.py:15

#: Raw-trip columns the reference displays (taxi_dashboard.py:143-147).
RAW_DISPLAY = [
    "batch_id",
    "VendorID",
    "tpep_pickup_datetime",
    "PULocationID",
    "DOLocationID",
    "passenger_count",
    "trip_distance",
    "fare_amount",
]


def format_timestamp(value) -> str:
    """taxi_dashboard.py formats epoch-ish/ISO values for display;
    anything unparseable renders as-is."""
    if value is None or (isinstance(value, float) and pd.isna(value)):
        return ""
    try:
        return pd.Timestamp(value).strftime("%Y-%m-%d %H:%M:%S")
    except (ValueError, TypeError):
        return str(value)


def _agg_view(df: pd.DataFrame, location_col: str) -> pd.DataFrame:
    """Rename to location_id + sort by trip_count desc
    (taxi_dashboard.py:169-177 / 188-196)."""
    if df.empty:
        return df
    if location_col in df.columns:
        df = df.rename(columns={location_col: "location_id"})
    if "location_id" in df.columns and "trip_count" in df.columns:
        df = df.sort_values(
            by=["trip_count", "location_id"],
            ascending=[False, True],
            ignore_index=True,
        )
    return df


def build_view_model(processed_dir: str, max_batches: int = 2) -> dict:
    """Everything the front end needs, as plain data.

    Keys: ``raw`` (display-projected trips, formatted timestamps),
    ``pickup`` / ``dropoff`` (location_id + trip_count, sorted),
    ``last_batch_age_sec`` (None until a batch arrives), ``files``.
    """
    snap = snapshot(processed_dir, max_batches)
    raw = snap["dirs"]["raw"]["data"].copy()
    for ts_col in ("tpep_pickup_datetime", "tpep_dropoff_datetime"):
        if ts_col in raw.columns:
            raw[ts_col] = raw[ts_col].map(format_timestamp)
    raw_cols = [c for c in RAW_DISPLAY if c in raw.columns]
    raw = raw[raw_cols] if raw_cols else raw

    newest_mtime: float | None = None
    for name in OUTPUT_DIRS:
        for f in latest_batch_files(f"{processed_dir}/{name}", 1):
            m = f.stat().st_mtime
            newest_mtime = m if newest_mtime is None else max(newest_mtime, m)

    return {
        "raw": raw,
        "pickup": _agg_view(
            snap["dirs"]["pickup_agg"]["data"].copy(), "PULocationID"
        ),
        "dropoff": _agg_view(
            snap["dirs"]["dropoff_agg"]["data"].copy(), "DOLocationID"
        ),
        "last_batch_age_sec": (
            None
            if newest_mtime is None
            else int(datetime.now().timestamp() - newest_mtime)
        ),
        "files": {
            name: snap["dirs"][name]["files"] for name in OUTPUT_DIRS
        },
    }


def render_streamlit(
    processed_dir: str, debug_file: str | None = None
) -> None:  # pragma: no cover - needs streamlit
    """One refresh of the reference layout (taxi_dashboard.py:96-206)."""
    if not HAS_STREAMLIT:
        raise RuntimeError(
            "streamlit is not installed; use dashboard.render_text() for "
            "the zero-dependency view, or pip install streamlit"
        )
    vm = build_view_model(processed_dir)

    st.title("🚕 Dashboard Taxi NYC - Streaming")
    st.sidebar.header("État du pipeline")
    if vm["last_batch_age_sec"] is not None:
        st.sidebar.text(f"Il y a {vm['last_batch_age_sec']} secondes")
    else:
        st.sidebar.warning("Aucun batch reçu pour l'instant")

    if debug_file and Path(debug_file).exists():
        st.sidebar.subheader("Diagnostic Producer")
        lines = Path(debug_file).read_text().splitlines()[-20:]
        st.sidebar.text_area(
            "Derniers batchs envoyés", "\n".join(lines), height=200
        )

    auto_refresh = st.sidebar.checkbox("Rafraîchissement automatique", value=True)
    if st.button("Rafraîchir les données"):
        st.rerun()

    col1, col2 = st.columns(2)
    with col1:
        st.subheader("📊 Derniers trajets reçus")
        if not vm["raw"].empty:
            st.dataframe(vm["raw"], use_container_width=True)
            st.text(f"Total des trajets affichés: {len(vm['raw'])}")
        else:
            st.info("Aucune donnée brute disponible. Attendez le prochain batch...")
    with col2:
        st.subheader("📍 Aggrégations par lieu")
        tab1, tab2 = st.tabs(["📥 Lieux de prise en charge", "📤 Lieux de dépose"])
        for tab, key in ((tab1, "pickup"), (tab2, "dropoff")):
            with tab:
                df = vm[key]
                if not df.empty and "location_id" in df.columns:
                    st.dataframe(df, use_container_width=True)
                    st.bar_chart(df.set_index("location_id")["trip_count"])
                else:
                    st.info("Aucune donnée d'agrégation disponible.")

    if auto_refresh:
        time.sleep(REFRESH_INTERVAL)
        st.rerun()


def main() -> None:  # pragma: no cover - needs streamlit
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--processed-dir", default="data/processed")
    ap.add_argument("--debug-file", default="data/debug/sent_batches.txt")
    args, _ = ap.parse_known_args()
    render_streamlit(args.processed_dir, args.debug_file)


if __name__ == "__main__":
    main()
