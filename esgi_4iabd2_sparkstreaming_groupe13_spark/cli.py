"""Service entry points — the reference's three Docker services
(``docker-compose.yml:3-50``) as subcommands of one CLI:

  python -m esgi_4iabd2_sparkstreaming_groupe13_spark producer  --source trips.csv --out data/streaming
  python -m esgi_4iabd2_sparkstreaming_groupe13_spark consumer  --in data/streaming --out data/processed
  python -m esgi_4iabd2_sparkstreaming_groupe13_spark dashboard --in data/processed

producer  ≙ MainProducer.scala (paced NDJSON replay, Spark-native)
consumer  ≙ MainConsumer.scala (Structured Streaming, 4 sinks)
dashboard ≙ taxi_dashboard.py (polling read path, text rendering)
"""

from __future__ import annotations

import argparse
import sys
import time


def _producer(args: argparse.Namespace) -> int:
    from .session import get_spark
    from .sources.batch import load_trip_csv
    from .streaming.producer import replay_to_ndjson

    spark = get_spark(app_name="taxi-producer")
    trips = load_trip_csv(spark, args.source)
    n = trips.count()
    if n == 0:
        print("ERROR_NO_DATA_FOUND: source has no rows", file=sys.stderr)
        return 1
    print(f"loaded {n} trips from {args.source}")
    published = replay_to_ndjson(
        trips,
        stage_dir=args.stage,
        output_dir=args.out,
        batch_size=args.batch_size,
        interval_seconds=args.interval,
        max_batches=args.max_batches,
        debug_file=args.debug_file,
    )
    print(f"published {len(published)} batch files to {args.out}")
    return 0


def _consumer(args: argparse.Namespace) -> int:
    from .config import ConsumerConfig
    from .session import get_spark
    from .streaming.processor import start_consumer

    spark = get_spark(app_name="taxi-consumer")
    cfg = ConsumerConfig(
        input_dir=args.input,
        output_dir=args.out,
        checkpoint_dir=args.checkpoint or f"{args.out}/checkpoints/raw",
        max_files_per_trigger=args.max_files_per_trigger,
        trigger_seconds=args.trigger,
        enable_console=args.console,
        # CLI default: idempotent (VERDICT r10 item 5) — the library
        # dataclass default stays False for reference parity; operators
        # who want the reference's plain-append semantics opt out.
        idempotent_sinks=not args.plain_appends,
    )
    query = start_consumer(spark, cfg, available_now=args.available_now)
    print(f"consumer started: {args.input} -> {args.out}")
    query.awaitTermination()
    return 0


def _dashboard(args: argparse.Namespace) -> int:
    from .dashboard import render_text, snapshot

    while True:
        snap = snapshot(args.input, max_batches=args.max_batches)
        print("\033[2J\033[H" if args.watch else "", end="")
        print(render_text(snap))
        if not args.watch:
            return 0
        time.sleep(args.refresh)


def _prep(args: argparse.Namespace) -> int:
    import json

    from .operators.caching import release_cached
    from .operators.pipeline import PrepConfig, prep_corpus
    from .operators.publish import publish_dataset
    from .session import get_spark

    spark = get_spark(app_name="prep")
    docs = spark.read.parquet(args.source)
    cfg = PrepConfig(
        text_col=args.text_col,
        id_col=args.id_col,
        gopher_rules=[] if args.no_gopher else None,
        quality_min=None if args.no_quality else args.quality_min,
        near_dup_threshold=args.near_dup_threshold,
        redact=not args.no_redact,
        train_pct=args.train_pct,
        val_pct=args.val_pct,
        shuffle=not args.no_shuffle,
    )
    prepared, report = prep_corpus(docs, cfg)
    if report["output_docs"] == 0:
        print(
            "prep: 0 documents survived the pipeline — with short-"
            "document corpora the published Gopher word floor drops "
            "everything; consider --no-gopher or custom thresholds",
            file=sys.stderr,
        )
    manifest = publish_dataset(prepared, args.out)
    release_cached()
    report["published_rows"] = manifest["row_count"]
    print(json.dumps(report, sort_keys=True))
    return 0


def _publish(args: argparse.Namespace) -> int:
    from .operators.publish import publish_dataset
    from .session import get_spark

    spark = get_spark(app_name="publish")
    df = spark.read.format(args.format).load(args.source)
    manifest = publish_dataset(df, args.out, fmt=args.format)
    print(
        f"published {manifest['row_count']} rows -> {args.out} "
        f"(checksum {manifest['checksum_xor_xxhash64']})"
    )
    return 0


def _verify(args: argparse.Namespace) -> int:
    from .operators.publish import verify_manifest
    from .session import get_spark

    spark = get_spark(app_name="verify")
    try:
        checks = verify_manifest(spark, args.input)
    except Exception as exc:  # unreadable/emptied dataset is a FAIL, not a crash
        print(f"verify failed to read {args.input}: {exc}", file=sys.stderr)
        return 1
    for name, ok in checks.items():
        print(f"{name}: {'PASS' if ok else 'FAIL'}")
    return 0 if checks["ok"] else 1


def _compact(args: argparse.Namespace) -> int:
    from .operators.maintenance import compact_directory
    from .session import get_spark

    spark = get_spark(app_name="compact")
    stats = compact_directory(
        spark,
        args.input,
        fmt=args.format,
        target_file_bytes=args.target_mb << 20,
    )
    print(
        f"compacted {args.input}: {stats['files_before']} -> "
        f"{stats['files_after']} files ({stats['rows']} rows)"
    )
    return 0


def _rollup(args: argparse.Namespace) -> int:
    from .session import get_spark
    from .streaming import rollup as R

    spark = get_spark(app_name="rollup")
    if args.kind == "agg":
        q = R.start_rollup_maintenance(
            spark, args.input, args.state, args.checkpoint,
            available_now=True,
        )
        q.awaitTermination()
        out = R.serve_rollup(spark, args.state)
    else:
        q = R.start_hist_rollup(
            spark, args.input, args.state, args.checkpoint,
            lo=args.lo, hi=args.hi, n_bins=args.bins,
            available_now=True,
        )
        q.awaitTermination()
        out = R.serve_hist_quantiles(
            spark, args.state, [0.5, 0.95, 0.99],
            args.lo, args.hi, args.bins,
        )
    out.orderBy(out.columns[0]).show(50, truncate=False)
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="esgi_4iabd2_sparkstreaming_groupe13_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("producer", help="replay a trip CSV as paced NDJSON batches")
    pr.add_argument("--source", required=True, help="trip CSV path")
    pr.add_argument("--out", required=True, help="watched streaming directory")
    pr.add_argument("--stage", default="data/stage", help="staging directory")
    pr.add_argument("--batch-size", type=int, default=10)
    pr.add_argument("--interval", type=float, default=10.0, help="seconds between batches")
    pr.add_argument("--max-batches", type=int, default=None)
    pr.add_argument(
        "--debug-file",
        default=None,
        help="K5 producer tap: append per-batch debug blocks here "
        "(e.g. data/debug/sent_batches.txt; the dashboard sidebar "
        "tails it)",
    )
    pr.set_defaults(fn=_producer)

    co = sub.add_parser("consumer", help="consume NDJSON batches, write 4 output dirs")
    co.add_argument("--input", required=True, help="watched streaming directory")
    co.add_argument("--out", required=True, help="processed output directory")
    co.add_argument("--checkpoint", default=None)
    co.add_argument("--max-files-per-trigger", type=int, default=1)
    co.add_argument("--trigger", type=float, default=10.0)
    co.add_argument("--console", action="store_true", help="console sink debug mode")
    co.add_argument(
        "--available-now",
        action="store_true",
        help="drain existing files then exit (test/batch mode)",
    )
    co.add_argument(
        "--plain-appends",
        action="store_true",
        help="reference-parity plain appends (at-least-once per sink "
        "dir on crash-replay). Default is idempotent sinks: each sink "
        "partitioned by batch_id with dynamic partition overwrite, so "
        "a replayed micro-batch replaces its own partition "
        "(exactly-once per directory).",
    )
    co.set_defaults(fn=_consumer)

    da = sub.add_parser("dashboard", help="poll processed outputs, render top-locations")
    da.add_argument("--input", required=True, help="processed output directory")
    da.add_argument("--max-batches", type=int, default=2)
    da.add_argument("--refresh", type=float, default=5.0)
    da.add_argument("--watch", action="store_true", help="poll forever (like the reference)")
    da.set_defaults(fn=_dashboard)

    pp = sub.add_parser(
        "prep",
        help="run the full corpus-prep pipeline (filter → dedup → "
        "scrub → split/shuffle) and publish atomically",
    )
    pp.add_argument("--source", required=True, help="documents parquet path")
    pp.add_argument("--out", required=True, help="publish target path")
    pp.add_argument("--text-col", default="text")
    pp.add_argument("--id-col", default="doc_id")
    pp.add_argument("--quality-min", type=float, default=0.5)
    pp.add_argument(
        "--no-gopher", action="store_true",
        help="skip the Gopher rule filter (the published word floor "
        "drops everything on short-document corpora)",
    )
    pp.add_argument(
        "--no-quality", action="store_true",
        help="skip the trained quality-scorer gate",
    )
    pp.add_argument("--near-dup-threshold", type=float, default=0.9)
    pp.add_argument("--no-redact", action="store_true")
    pp.add_argument("--train-pct", type=int, default=90)
    pp.add_argument("--val-pct", type=int, default=5)
    pp.add_argument("--no-shuffle", action="store_true")
    pp.set_defaults(fn=_prep)

    pu = sub.add_parser(
        "publish",
        help="atomically publish a dataset with an audit manifest",
    )
    pu.add_argument("--source", required=True, help="input dataset path")
    pu.add_argument("--out", required=True, help="publish target path")
    pu.add_argument("--format", default="parquet")
    pu.set_defaults(fn=_publish)

    ve = sub.add_parser(
        "verify",
        help="verify a published dataset against its _MANIFEST.json "
        "(exit 1 on any failed check)",
    )
    ve.add_argument("--input", required=True, help="published dataset path")
    ve.set_defaults(fn=_verify)

    cp = sub.add_parser(
        "compact",
        help="rewrite a sink directory into target-sized files (swap-in)",
    )
    cp.add_argument("--input", required=True, help="sink directory")
    cp.add_argument("--format", default="json")
    cp.add_argument("--target-mb", type=int, default=128)
    cp.set_defaults(fn=_compact)

    ro = sub.add_parser(
        "rollup",
        help="drain an NDJSON event dir into the persisted incremental "
        "state (exactly-once ledger) and print the served rollup",
    )
    ro.add_argument("--input", required=True, help="NDJSON event directory")
    ro.add_argument("--state", required=True, help="state-table root path")
    ro.add_argument("--checkpoint", required=True)
    ro.add_argument(
        "--kind", choices=["agg", "hist"], default="agg",
        help="agg = counts/sum/min/max/HLL; hist = quantile histogram",
    )
    ro.add_argument("--lo", type=float, default=0.0)
    ro.add_argument("--hi", type=float, default=500.0)
    ro.add_argument("--bins", type=int, default=100)
    ro.set_defaults(fn=_rollup)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
