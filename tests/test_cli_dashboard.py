"""CLI + dashboard read-path tests (reference service parity)."""

from __future__ import annotations

import json

from esgi_4iabd2_sparkstreaming_groupe13_spark import dashboard
from esgi_4iabd2_sparkstreaming_groupe13_spark.cli import build_parser


def test_cli_parser_covers_three_services():
    p = build_parser()
    for argv, fn_name in [
        (["producer", "--source", "s.csv", "--out", "o"], "_producer"),
        (["consumer", "--input", "i", "--out", "o"], "_consumer"),
        (["dashboard", "--input", "i"], "_dashboard"),
        (["publish", "--source", "s", "--out", "o"], "_publish"),
        (["verify", "--input", "i"], "_verify"),
        (["compact", "--input", "i"], "_compact"),
        (
            ["rollup", "--input", "i", "--state", "s",
             "--checkpoint", "c", "--kind", "hist"],
            "_rollup",
        ),
    ]:
        args = p.parse_args(argv)
        assert args.fn.__name__ == fn_name


def _write_ndjson(path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_dashboard_snapshot_latest_two_and_topk(tmp_path):
    agg_dir = tmp_path / "pickup_agg"
    import os
    import time

    for i in range(4):  # 4 batch files; only newest 2 must load
        _write_ndjson(
            agg_dir / f"batch{i}.json",
            [
                {
                    "PULocationID": 100 + i,
                    "batch_id": str(i),
                    "trip_count": 10 + i,
                    "aggregation_type": "pickup_location",
                }
            ],
        )
        mtime = time.time() - (10 - i)
        os.utime(agg_dir / f"batch{i}.json", (mtime, mtime))

    snap = dashboard.snapshot(str(tmp_path), max_batches=2)
    entry = snap["dirs"]["pickup_agg"]
    assert entry["rows"] == 2  # O5: newest two files only
    assert set(entry["files"]) == {"batch2.json", "batch3.json"}
    top = entry["top_locations"]
    # O4: sorted by count desc
    assert list(top["trip_count"]) == sorted(top["trip_count"], reverse=True)


def test_dashboard_defensive_projection(tmp_path):
    """P8: missing columns don't break the view."""
    _write_ndjson(
        tmp_path / "raw" / "b0.json",
        [{"batch_id": "0", "unexpected_col": 1, "fare_amount": 12.5}],
    )
    snap = dashboard.snapshot(str(tmp_path))
    data = snap["dirs"]["raw"]["data"]
    assert "unexpected_col" not in data.columns
    assert "fare_amount" in data.columns


def test_dashboard_empty_dirs_ok(tmp_path):
    snap = dashboard.snapshot(str(tmp_path))
    assert all(e["rows"] == 0 for e in snap["dirs"].values())
    assert dashboard.render_text(snap)  # renders without error


def test_dashboard_app_view_model(tmp_path):
    """dashboard_app.build_view_model: reference display shaping
    (taxi_dashboard.py:137-196) — timestamp formatting, location_id
    rename, trip_count desc sort — without streamlit installed."""
    from esgi_4iabd2_sparkstreaming_groupe13_spark import dashboard_app

    _write_ndjson(
        tmp_path / "raw" / "b0.json",
        [
            {
                "batch_id": "0",
                "VendorID": 1,
                "tpep_pickup_datetime": "2024-01-01T08:00:00.000Z",
                "PULocationID": 100,
                "DOLocationID": 200,
                "trip_distance": 1.5,
                "fare_amount": 10.0,
                "total_amount": 14.0,
            }
        ],
    )
    _write_ndjson(
        tmp_path / "pickup_agg" / "b0.json",
        [
            {"PULocationID": 101, "batch_id": "0", "trip_count": 5},
            {"PULocationID": 102, "batch_id": "0", "trip_count": 9},
        ],
    )
    vm = dashboard_app.build_view_model(str(tmp_path))
    assert vm["raw"].loc[0, "tpep_pickup_datetime"] == "2024-01-01 08:00:00"
    assert "location_id" in vm["pickup"].columns  # renamed
    assert list(vm["pickup"]["trip_count"]) == [9, 5]  # desc sort
    assert vm["last_batch_age_sec"] is not None
    assert vm["dropoff"].empty


def test_dashboard_app_render_requires_streamlit(tmp_path):
    from esgi_4iabd2_sparkstreaming_groupe13_spark import dashboard_app

    if dashboard_app.HAS_STREAMLIT:  # pragma: no cover
        import pytest

        pytest.skip("streamlit installed; render path exercised manually")
    import pytest

    with pytest.raises(RuntimeError, match="streamlit is not installed"):
        dashboard_app.render_streamlit(str(tmp_path))


def test_cli_consumer_defaults_idempotent():
    """VERDICT r10 item 5: the CLI defaults to idempotent sinks;
    --plain-appends opts back into reference-parity appends."""
    p = build_parser()
    args = p.parse_args(["consumer", "--input", "a", "--out", "b"])
    assert args.plain_appends is False  # → idempotent_sinks=True
    args = p.parse_args(
        ["consumer", "--input", "a", "--out", "b", "--plain-appends"]
    )
    assert args.plain_appends is True


def test_dashboard_app_imports_without_package_context(tmp_path):
    """docker/Dockerfile.dashboard launches the view with
    `streamlit run <path>`, which executes the file as __main__ with no
    parent package — the module must import in that mode too (the
    streamlit import itself is gated, so import-time succeeds without
    the library)."""
    import runpy
    import sys

    path = "esgi_4iabd2_sparkstreaming_groupe13_spark/dashboard_app.py"
    saved = list(sys.path)
    try:
        sys.path.insert(0, ".")  # repo root, as the docker WORKDIR has
        mod = runpy.run_path(path, run_name="not_main")
        assert "snapshot" in mod and "OUTPUT_DIRS" in mod
    finally:
        sys.path[:] = saved
