"""Tokenizer-shard exporter tests (operators/shards.py): assignment
invariants, the dir-per-shard physical layout, manifest/verify
round-trip, tamper detection, and publish-crash recovery."""

from __future__ import annotations

import json
import shutil
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from esgi_4iabd2_sparkstreaming_groupe13_spark.operators import corpus, shards
from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.publish import (
    MANIFEST_NAME,
    heal_publish,
)


def _docs(spark, n=60, words_lo=5, words_hi=40):
    """Deterministic corpus with varied token counts."""
    rows = [
        (i, " ".join(f"w{i}_{j}" for j in range(words_lo + (i * 7) % (words_hi - words_lo))))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


BUDGET = 64
PER_SHARD = 256


def _assigned(spark):
    packed = corpus.pack_sequences(
        _docs(spark), "text", "doc_id", budget_tokens=BUDGET
    )
    return shards.assign_token_shards(packed, tokens_per_shard=PER_SHARD)


def test_assignment_invariants(spark):
    rows = _assigned(spark).collect()
    assert len(rows) == 60
    # a bin never splits across shards
    bin_shards = {}
    for r in rows:
        bin_shards.setdefault(r.bin_id, set()).add(r.shard_id)
    assert all(len(s) == 1 for s in bin_shards.values())
    # shard ids dense from 0, monotone in bin order
    by_bin = sorted(bin_shards.items())
    shard_seq = [next(iter(s)) for _, s in by_bin]
    assert shard_seq[0] == 0
    assert all(b - a in (0, 1) for a, b in zip(shard_seq, shard_seq[1:]))
    # next-fit overshoot contract: a shard STARTS below the budget
    # boundary, so its total < PER_SHARD + its largest bin
    shard_tokens: dict[int, int] = {}
    shard_max_bin: dict[int, int] = {}
    bin_tokens: dict[int, int] = {}
    for r in rows:
        shard_tokens[r.shard_id] = shard_tokens.get(r.shard_id, 0) + r.n_tokens
        bin_tokens[r.bin_id] = bin_tokens.get(r.bin_id, 0) + r.n_tokens
    for b, (s,) in ((b, tuple(v)) for b, v in bin_shards.items()):
        shard_max_bin[s] = max(shard_max_bin.get(s, 0), bin_tokens[b])
    assert len(shard_tokens) > 1  # the fixture actually multi-shards
    for s, tot in shard_tokens.items():
        assert tot < PER_SHARD + shard_max_bin[s], (s, tot)
    # every shard except the last is "full": adding its successor's
    # first bin would cross the budget — i.e. it holds >= PER_SHARD
    # minus one bin's worth of slack by construction (start < k*B ...
    # checked via start offsets): recompute starts
    order = sorted(bin_tokens)
    start = 0
    for b in order:
        expect = start // PER_SHARD
        assert next(iter(bin_shards[b])) == expect
        start += bin_tokens[b]


def test_assignment_deterministic_and_matches_summary(spark):
    a1 = {tuple(r) for r in _assigned(spark).collect()}
    a2 = {tuple(r) for r in _assigned(spark).collect()}
    assert a1 == a2
    summ = {
        r.shard_id: (r.n_docs, r.n_tokens)
        for r in shards.shard_summary(_assigned(spark)).collect()
    }
    docs_per_shard: dict[int, int] = {}
    toks_per_shard: dict[int, int] = {}
    for (_, n_tok, _, sid) in a1:
        docs_per_shard[sid] = docs_per_shard.get(sid, 0) + 1
        toks_per_shard[sid] = toks_per_shard.get(sid, 0) + n_tok
    assert summ == {
        s: (docs_per_shard[s], toks_per_shard[s]) for s in docs_per_shard
    }


def test_export_layout_manifest_verify(spark, tmp_path):
    out = str(tmp_path / "shards_out")
    manifest = shards.export_token_shards(
        _docs(spark),
        out,
        budget_tokens=BUDGET,
        tokens_per_shard=PER_SHARD,
        split="train",
    )
    # dir-per-shard layout, ids dense from 0
    dirs = sorted(p.name for p in Path(out).glob("shard_id=*"))
    assert dirs == sorted(f"shard_id={i}" for i in range(manifest["n_shards"]))
    assert manifest["n_shards"] > 1
    assert manifest["row_count"] == 60
    assert manifest["split"] == "train"
    # manifest file sizes describe the real bytes
    for sid, entry in manifest["shards"].items():
        for fname, size in entry["files"].items():
            assert (Path(out) / f"shard_id={sid}" / fname).stat().st_size == size
        assert entry["files"], sid
    # totals line up with the logical assignment
    toks = {
        str(r.shard_id): r.n_tokens
        for r in shards.shard_summary(_assigned(spark)).collect()
    }
    assert {k: v["n_tokens"] for k, v in manifest["shards"].items()} == toks
    # verify gate passes on the untouched tree
    checks = shards.verify_shards(spark, out)
    assert checks["ok"], checks
    # shard files are internally ordered: a loader streams bins in order
    one = spark.read.parquet(f"{out}/shard_id=0")
    seq = [r.bin_id for r in one.collect()]
    assert seq == sorted(seq)


def test_verify_detects_tamper_and_deletion(spark, tmp_path):
    out = str(tmp_path / "shards_tamper")
    manifest = shards.export_token_shards(
        _docs(spark), out, budget_tokens=BUDGET, tokens_per_shard=PER_SHARD
    )
    # delete one shard's files -> row_count + shards mismatch
    victim = sorted(Path(out).glob("shard_id=*"))[1]
    shutil.rmtree(victim)
    checks = shards.verify_shards(spark, out)
    assert not checks["ok"]
    assert checks["mismatched_shards"] == [victim.name.split("=")[1]]


def test_export_atomic_replace_and_crash_recovery(spark, tmp_path):
    out = str(tmp_path / "shards_atomic")
    m1 = shards.export_token_shards(
        _docs(spark, n=30), out, budget_tokens=BUDGET, tokens_per_shard=PER_SHARD
    )
    # re-export over the same path: fully replaced, no stale siblings
    m2 = shards.export_token_shards(
        _docs(spark, n=60), out, budget_tokens=BUDGET, tokens_per_shard=PER_SHARD
    )
    assert m2["row_count"] == 60
    assert not list(Path(out).parent.glob("shards_atomic__*"))
    assert shards.verify_shards(spark, out)["ok"]
    # crash simulation: a COMPLETE stage (manifest present) left behind
    # with the target missing is promoted by heal_publish
    target = Path(out)
    stage = target.with_name(target.name + "__stage_99999999999999999999_deadbeef")
    target.rename(stage)
    heal_publish(out)
    assert target.exists() and not stage.exists()
    assert shards.verify_shards(spark, out)["ok"]
    # an INCOMPLETE stage (no manifest) is discarded, target untouched
    bad = target.with_name(target.name + "__stage_99999999999999999998_cafecafe")
    bad.mkdir()
    (bad / "part-junk.parquet").write_bytes(b"junk")
    m3 = shards.export_token_shards(
        _docs(spark, n=30), out, budget_tokens=BUDGET, tokens_per_shard=PER_SHARD
    )
    assert m3["row_count"] == 30
    assert not bad.exists()


def test_export_empty_corpus(spark, tmp_path):
    out = str(tmp_path / "shards_empty")
    empty = _docs(spark).filter(F.lit(False))
    manifest = shards.export_token_shards(
        empty, out, budget_tokens=BUDGET, tokens_per_shard=PER_SHARD
    )
    assert manifest["n_shards"] == 0
    assert manifest["row_count"] == 0
    with open(Path(out) / MANIFEST_NAME) as fh:
        assert json.load(fh)["shards"] == {}


def test_assign_rejects_bad_budget(spark):
    with pytest.raises(ValueError, match="positive"):
        shards.assign_token_shards(_assigned(spark), tokens_per_shard=0)


def test_unpin_env_refused_by_correctness_entry_points(spark, tmp_path, monkeypatch):
    """SPARK_GRAFT_UNPIN_LOCAL is a bench-only bypass of the layout
    pin; correctness-bearing entry points must hard-fail rather than
    silently run under the AQE layout race it re-exposes."""
    import pytest as _pytest

    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators import (
        incremental as inc,
    )
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.shards import (
        export_token_shards,
    )

    monkeypatch.setenv("SPARK_GRAFT_UNPIN_LOCAL", "1")
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(RuntimeError, match="correctness-bearing"):
        export_token_shards(docs, str(tmp_path / "t"))
    ev = spark.createDataFrame([(1, 2.0)], "k long, v double")
    with _pytest.raises(RuntimeError, match="correctness-bearing"):
        inc.maintain_hist_state(
            ev, ["k"], "v", 0.0, 10.0, 5, str(tmp_path / "s"), 0
        )


def test_verify_shards_reads_columns_from_manifest(spark, tmp_path):
    """The manifest records which columns its content checksums cover;
    verify must use them (not positional guessing), so an export whose
    id/text names differ from the defaults still verifies."""
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.shards import (
        export_token_shards,
        verify_shards,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2}") for i in range(20)],
        "item_id long, body string",
    )
    path = str(tmp_path / "shards")
    manifest = export_token_shards(
        docs, path, text_col="body", id_col="item_id", budget_tokens=5
    )
    assert manifest["id_col"] == "item_id"
    assert manifest["text_col"] == "body"
    checks = verify_shards(spark, path)
    assert checks["ok"], checks


def test_verify_shards_legacy_manifest_tries_both_orderings(spark, tmp_path):
    """ADVICE r10: a legacy manifest (no id_col/text_col) is verified
    by trying BOTH positional orderings of the two data columns, and
    the report surfaces which guess it used — a wrong first guess no
    longer shows up as opaque per-shard checksum mismatches."""
    import json as _json

    docs = spark.createDataFrame(
        [(i, f"w{i} w{i + 1} w{i + 2}") for i in range(20)],
        "item_id long, body string",
    )
    path = str(tmp_path / "shards_legacy")
    shards.export_token_shards(
        docs, path, text_col="body", id_col="item_id", budget_tokens=5
    )
    mpath = Path(path) / MANIFEST_NAME
    with open(mpath) as fh:
        m = _json.load(fh)
    del m["id_col"], m["text_col"]
    with open(mpath, "w") as fh:
        _json.dump(m, fh)
    checks = shards.verify_shards(spark, path)
    assert checks["ok"], checks
    assert checks["column_guess"]["positional"] is True
    assert {checks["column_guess"]["id_col"], checks["column_guess"]["text_col"]} == {
        "item_id",
        "body",
    }

    # manifest whose checksums were computed under the SWAPPED roles:
    # only the second ordering satisfies it — verify must find it
    swapped = shards._audit_shards(spark, path, text_col="item_id", id_col="body")
    m2 = dict(m)
    m2.update(
        {
            "n_shards": swapped["n_shards"],
            "row_count": swapped["row_count"],
            "total_tokens": swapped["total_tokens"],
            "shards": swapped["shards"],
        }
    )
    with open(mpath, "w") as fh:
        _json.dump(m2, fh)
    checks2 = shards.verify_shards(spark, path)
    assert checks2["ok"], checks2
    assert checks2["column_guess"]["id_col"] == "body"


def test_verify_shards_legacy_both_orderings_fail_reports_fewest(
    spark, tmp_path
):
    """ADVICE r11: when NO positional ordering satisfies a legacy
    manifest, the report must reflect the ordering with the FEWEST
    mismatches (the plausible real corruption), not whichever guess
    ran last, and must disclose that both orderings were tried."""
    import json as _json

    docs = spark.createDataFrame(
        [(i, f"w{i} w{i + 1} w{i + 2}") for i in range(20)],
        "item_id long, body string",
    )
    path = str(tmp_path / "shards_legacy_bad")
    # tokens_per_shard forced low so the export spans SEVERAL shards —
    # with one shard both orderings tie at 1 mismatch and the
    # fewest-mismatch selection is untestable
    shards.export_token_shards(
        docs,
        path,
        text_col="body",
        id_col="item_id",
        budget_tokens=5,
        tokens_per_shard=20,
    )
    mpath = Path(path) / MANIFEST_NAME
    with open(mpath) as fh:
        m = _json.load(fh)
    del m["id_col"], m["text_col"]
    # corrupt ONE shard checksum: the correct ordering now has exactly
    # one mismatch; the swapped ordering mismatches (nearly) all
    corrupt_key = sorted(m["shards"])[0]
    m["shards"][corrupt_key] = dict(
        m["shards"][corrupt_key], content_checksum=-1
    )
    with open(mpath, "w") as fh:
        _json.dump(m, fh)
    checks = shards.verify_shards(spark, path)
    assert not checks["ok"]
    # the report reflects the fewest-mismatch ordering: only the
    # genuinely corrupt shard, attributed under the right columns
    assert checks["mismatched_shards"] == [corrupt_key], checks
    assert checks["column_guess"]["id_col"] == "item_id"
    assert checks["column_guess"]["text_col"] == "body"
    tried = checks["orderings_tried"]
    assert len(tried) == 2
    by_id = {t["id_col"]: t["n_mismatched"] for t in tried}
    assert by_id["item_id"] == 1
    assert by_id["body"] > 1
