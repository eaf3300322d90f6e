"""Registered Python reference oracles for the queries DuckDB cannot
express (VERDICT r10 item 2).

Four registry entries were rows-only because their semantics are not
ANSI-SQL-shaped: an iterative argmax loop (q_bpe_merges), an
Arrow-batched binary feature extractor (q_media_features), an
iterative clustering model (q_kmeans_cells), and an approximate
search tier (q_ann_ivf). Each gets an INDEPENDENT pure-Python /
numpy / DuckDB reference here — recomputed from the parquet inputs
(never from engine internals), compared exactly against the Spark
result — so `scripts/oracle_check.py` reports pass/fail for them
instead of a rows-only shrug.

Checker contract: ``check(spark_pdf, sf_dir) -> list[str]`` — empty
list = pass; each string names one discrepancy. Determinism ground
rules mirrored from the engine (all documented in the operators):

* vector arithmetic is double-precision with SEQUENTIAL element
  order (`similarity.dot_expr` folds left-to-right), replicated here
  with an explicit per-dimension accumulation loop — bit-identical,
  not merely close;
* `F.round(x, 6)` (Spark: BigDecimal.valueOf(double) + HALF_UP over
  the shortest decimal repr) is replicated with
  Decimal(repr(x)).quantize(1e-6, ROUND_HALF_UP) — Python's repr is
  the same shortest-roundtrip decimal class;
* string tie-breaks are ASCII-only in these queries, where Spark's
  UTF8-binary ordering equals Python's code-point ordering.
"""

from __future__ import annotations

import hashlib
import os
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd

#: engine data-format constants mirrored (not imported) so the
#: reference stays independent of the implementation under test
_WORD_END = "</w>"
_BPE_TRAIN_MERGES = 24
_MEDIA_N = 96
_ANN_QUERY_IDS = [0, 1, 2, 3, 4]
_ANN_K = 5
_ANN_STRIDE = 50
_ANN_NPROBE = 4


# --------------------------------------------------------------------
# shared exact-compare
# --------------------------------------------------------------------

def _diff(expected: pd.DataFrame, actual: pd.DataFrame, float_exact: bool = True) -> list[str]:
    """Order-insensitive exact comparison, same convention as
    scripts/oracle_check.py: sorted columns, sorted rows, exact values
    (floats included — the engine's determinism rules make them
    bit-identical)."""
    problems: list[str] = []
    if sorted(expected.columns) != sorted(actual.columns):
        return [
            f"columns: expected={sorted(expected.columns)} "
            f"actual={sorted(actual.columns)}"
        ]
    if len(expected) != len(actual):
        problems.append(f"rowcount: expected={len(expected)} actual={len(actual)}")
        return problems
    cols = sorted(expected.columns)
    e = expected[cols].sort_values(by=cols, ignore_index=True)
    a = actual[cols].sort_values(by=cols, ignore_index=True)
    for col in cols:
        ev, av = e[col], a[col]
        if ev.dtype.kind == "f" or av.dtype.kind == "f":
            ok = ((ev.isna() & av.isna()) | (ev.to_numpy() == av.to_numpy())).all()
        else:
            ok = ev.astype(object).equals(av.astype(object))
        if not ok:
            bad = [
                (i, ev.iloc[i], av.iloc[i])
                for i in range(len(ev))
                if not (
                    (pd.isna(ev.iloc[i]) and pd.isna(av.iloc[i]))
                    or ev.iloc[i] == av.iloc[i]
                )
            ][:3]
            problems.append(f"col {col}: mismatch, e.g. {bad}")
    return problems


def _read_parquet(path: str, sql: str | None = None) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    try:
        q = sql or f"SELECT * FROM read_parquet('{path}')"
        return con.execute(q.replace("$P", path)).df()
    finally:
        con.close()


# --------------------------------------------------------------------
# q_bpe_merges — pure-Python BPE trainer over DuckDB word counts
# --------------------------------------------------------------------

def _ref_merge_word(syms: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_bpe_train(word_counts: dict[str, int], num_merges: int):
    words = {w: list(w) + [_WORD_END] for w in word_counts}
    merges = []
    for rank in range(num_merges):
        pairs: Counter = Counter()
        for w, syms in words.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, cnt))
        words = {w: _ref_merge_word(s, a, b) for w, s in words.items()}
    return merges


def check_bpe_merges(spark_pdf: pd.DataFrame, sf_dir: str) -> list[str]:
    """Expected merge table from an independent trainer: DuckDB does
    the corpus tokenization (same [a-z0-9]+ rule as token_array_sql),
    pure Python runs the argmax loop with the engine's documented
    tie-break (count DESC, then lexicographic (sym_left, sym_right))."""
    wc = _read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        "SELECT t AS word, count(*) AS cnt FROM ("
        "  SELECT unnest(list_filter("
        "    string_split_regex(lower(text), '[^a-z0-9]+'),"
        "    t -> len(t) > 0)) AS t"
        "  FROM read_parquet('$P')"
        ") GROUP BY t",
    )
    counts = dict(zip(wc["word"], wc["cnt"].astype(int)))
    merges = _ref_bpe_train(counts, _BPE_TRAIN_MERGES)
    expected = pd.DataFrame(
        merges, columns=["rank", "sym_left", "sym_right", "pair_count"]
    ).astype({"rank": "int64", "pair_count": "int64"})
    return _diff(expected, spark_pdf)


# --------------------------------------------------------------------
# q_media_features — hashlib reconstruction of the synthetic payloads
# --------------------------------------------------------------------

def check_media_features(spark_pdf: pd.DataFrame, sf_dir: str) -> list[str]:
    """synth_media(n=96) payloads are md5(str(id)) hex repeated 4× →
    64 bytes; the fake decode emits an 8-bin (byte & 7) histogram.
    Recompute every output field from hashlib + numpy."""
    rows = []
    kinds = ["image", "audio", "video"]
    for mid in range(_MEDIA_N):
        payload = bytes.fromhex(hashlib.md5(str(mid).encode()).hexdigest() * 4)
        buf = np.frombuffer(payload, dtype=np.uint8)
        hist = np.bincount(buf & 7, minlength=8).astype(np.float64)
        f0 = np.float32(hist[0] / hist.sum())
        rows.append((mid, kinds[mid % 3], len(payload), 64, f0))
    expected = pd.DataFrame(
        rows, columns=["media_id", "kind", "n_bytes", "width", "f0"]
    ).astype({"media_id": "int64", "n_bytes": "int64", "width": "int32"})
    actual = spark_pdf.copy()
    actual["f0"] = actual["f0"].astype(np.float32)
    expected["f0"] = expected["f0"].astype(np.float32)
    actual["width"] = actual["width"].astype("int32")
    return _diff(expected, actual)


# --------------------------------------------------------------------
# shared vector math — bit-exact mirror of similarity.dot_expr
# --------------------------------------------------------------------

def _seq_dot(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Left-to-right fold of elementwise double products, vectorized
    over ROWS of `a` (2-D) against one vector `b` (1-D) — each
    accumulation step is `acc + a[:, j] * b[j]` in float64, the exact
    sequence `F.aggregate(zip_with(a, b, x*y), 0.0, acc+v)` performs
    per row."""
    acc = np.zeros(a.shape[0], dtype=np.float64)
    for j in range(a.shape[1]):
        acc = acc + a[:, j] * b[j]
    return acc


def _seq_norm(a: np.ndarray) -> np.ndarray:
    acc = np.zeros(a.shape[0], dtype=np.float64)
    for j in range(a.shape[1]):
        acc = acc + a[:, j] * a[:, j]
    return np.sqrt(acc)


def _round6(x: float) -> float:
    """Spark F.round(x, 6): HALF_UP over the shortest decimal repr."""
    return float(
        Decimal(repr(float(x))).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )


def _load_embeddings(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    pdf = _read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        "SELECT vec_id, embedding FROM read_parquet('$P') ORDER BY vec_id",
    )
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    # float32 storage → float64 per element, same as the cast("double")
    mat = np.stack(
        [np.asarray(v, dtype=np.float32).astype(np.float64) for v in pdf["embedding"]]
    )
    return ids, mat


def _assign_cells(
    mat: np.ndarray, cent_ids: np.ndarray, cent_mat: np.ndarray
) -> np.ndarray:
    """Nearest-centroid by cosine, ties → smallest cell_id (the
    row_number window's (csim DESC, cell_id ASC) order). Returns the
    winning cell_id per row of `mat`."""
    norms = _seq_norm(mat)
    order = np.argsort(cent_ids)  # ascending cell_id → first argmax wins ties
    best_sim = np.full(mat.shape[0], -np.inf)
    best_cell = np.zeros(mat.shape[0], dtype=np.int64)
    for idx in order:
        c = cent_mat[idx]
        csim = _seq_dot(mat, c) / (norms * _seq_norm(c[None, :])[0])
        take = csim > best_sim  # strict: earlier (smaller) id keeps ties
        best_sim = np.where(take, csim, best_sim)
        best_cell = np.where(take, cent_ids[idx], best_cell)
    return best_cell


def check_kmeans_cells(spark_pdf: pd.DataFrame, sf_dir: str) -> list[str]:
    """Serve-path check for the trained quantizer: read the persisted
    centroid MODEL TABLE (the fit itself is pinned by
    tests/test_corpus.py's planted-cluster + determinism suite),
    recompute every vector's nearest-centroid assignment in numpy with
    the engine's exact fold order and tie-break, and compare per-cell
    member counts."""
    from .queries import KMEANS_K, _kmeans_model_path  # lazy: avoid cycle

    model = _kmeans_model_path(sf_dir)
    if not os.path.exists(os.path.join(model, "_SUCCESS")):
        return [f"persisted centroid model missing at {model}"]
    cents = _read_parquet(
        model, "SELECT cell_id, cvec FROM read_parquet('$P/*.parquet')"
    )
    if len(cents) != KMEANS_K:
        return [f"model has {len(cents)} centroids, expected {KMEANS_K}"]
    cent_ids = cents["cell_id"].to_numpy(dtype=np.int64)
    cent_mat = np.stack([np.asarray(v, dtype=np.float64) for v in cents["cvec"]])
    _, mat = _load_embeddings(sf_dir)
    cells = _assign_cells(mat, cent_ids, cent_mat)
    uniq, counts = np.unique(cells, return_counts=True)
    expected = pd.DataFrame({"cell_id": uniq, "n_members": counts}).astype(
        {"cell_id": "int64", "n_members": "int64"}
    )
    return _diff(expected, spark_pdf)


def check_ann_ivf(spark_pdf: pd.DataFrame, sf_dir: str) -> list[str]:
    """Full exact replication of the stride-seeded IVF search: the
    every-50th-vector centroid set, cosine cell assignment, top-4
    probed cells per query, exact cosine rank (rounded 6 dp, ties →
    neighbor_id) inside the probed subset. Deterministic end to end,
    so the comparison is exact — not a recall floor."""
    ids, mat = _load_embeddings(sf_dir)
    cent_mask = ids % _ANN_STRIDE == 0
    cent_ids, cent_mat = ids[cent_mask], mat[cent_mask]
    cells = _assign_cells(mat, cent_ids, cent_mat)

    norms = _seq_norm(mat)
    cent_norms = _seq_norm(cent_mat)
    rows = []
    for qid in _ANN_QUERY_IDS:
        qpos = int(np.where(ids == qid)[0][0])
        qvec = mat[qpos]
        qnorm = norms[qpos]
        # top-nprobe cells: (csim DESC, cell_id ASC)
        csim = _seq_dot(cent_mat, qvec) / (cent_norms * qnorm)
        probe_order = sorted(
            range(len(cent_ids)), key=lambda i: (-csim[i], cent_ids[i])
        )[:_ANN_NPROBE]
        probed = {int(cent_ids[i]) for i in probe_order}
        cand = [
            i
            for i in range(len(ids))
            if int(cells[i]) in probed and ids[i] != qid
        ]
        scored = [
            (
                _round6(
                    _seq_dot(mat[i][None, :], qvec)[0] / (qnorm * norms[i])
                ),
                int(ids[i]),
            )
            for i in cand
        ]
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rank, (cos, nid) in enumerate(scored[:_ANN_K], start=1):
            rows.append((qid, nid, cos, rank))
    expected = pd.DataFrame(
        rows, columns=["query_id", "neighbor_id", "cosine", "rank"]
    ).astype({"query_id": "int64", "neighbor_id": "int64", "rank": "int64"})
    return _diff(expected, spark_pdf)


# --------------------------------------------------------------------
# q_media_decode — pixel/sample-formula ground truth for REAL decode
# --------------------------------------------------------------------

_DECODE_N = 48


def check_media_decode(spark_pdf: pd.DataFrame, sf_dir: str) -> list[str]:
    """synth_real_media's content formulas are mirrored here (never the
    decoder): expected luminance/amplitude histograms are computed from
    the raw pixel/sample arrays, so a decoder bug at ANY stage (inflate,
    filter reversal, chunk walk, PCM framing) breaks the match."""
    rows = []
    for mid in range(_DECODE_N):
        if mid % 2 == 0:  # PNG: mirrored pixel formula
            h, w, ch = 3 + mid % 4, 4 + mid % 5, 1 + mid % 4
            y, x, c = np.meshgrid(
                np.arange(h), np.arange(w), np.arange(ch), indexing="ij"
            )
            px = ((mid * 7 + y * 13 + x * 3 + c * 29) % 256).astype(np.uint8)
            lum = px[:, :, : (1 if ch <= 2 else 3)].mean(axis=2)
            hist = np.bincount(
                (lum.astype(np.int64) >> 5).ravel(), minlength=8
            ).astype(np.float64)
            kind = "image"
        else:  # WAV: mirrored sample formula
            n, ch = 32 + mid % 7, 1 + mid % 2
            k, c = np.meshgrid(np.arange(n), np.arange(ch), indexing="ij")
            frames = ((mid * 31 + k * 17 + c * 11) * 97) % 65536 - 32768
            hist = np.bincount(
                ((frames.astype(np.int64) + 32768) >> 13).ravel(), minlength=8
            ).astype(np.float64)
            kind = "audio"
        feat = hist / hist.sum()
        for dim in range(8):
            rows.append((mid, kind, dim, np.float32(feat[dim])))
    expected = pd.DataFrame(
        rows, columns=["media_id", "kind", "dim", "value"]
    ).astype({"media_id": "int64", "dim": "int32", "value": "float32"})
    actual = spark_pdf.copy()
    actual["value"] = actual["value"].astype("float32")
    actual["dim"] = actual["dim"].astype("int32")
    return _diff(expected, actual)


_PHASH_N_CONTENTS, _PHASH_VARIANTS = 20, 3


def _mirror_phash_bits(cells: np.ndarray) -> int:
    """Independent bit-pack: numpy dot against powers of two (the
    engine loops bit-by-bit in pure Python) then two's-complement fold."""
    bits = (cells >= cells.mean()).ravel().astype(object)
    v = int((bits * (2 ** np.arange(bits.size, dtype=object))).sum())
    return v - (1 << 64) if v >= 1 << 63 else v


def _mirror_bounds(n: int, k: int) -> list[tuple[int, int]]:
    """Mirror of the engine's deterministic block grid, written against
    the SPEC (floor boundaries, nearest sample on upsample) rather than
    by calling the engine helper."""
    out = []
    for i in range(k):
        lo = min(i * n // k, n - 1)
        hi = min(max((i + 1) * n // k, lo + 1), n)
        out.append((lo, hi))
    return out


def check_media_phash(spark_pdf: pd.DataFrame, sf_dir: str) -> list[str]:
    """The re-encode fixture's content formulas are mirrored here and
    perceptually hashed by an independent implementation (block grid
    from the spec, numpy bit-pack vs the engine's Python loop), then
    grouped in pandas — so a bug in PNG/WAV decode, the hash, OR the
    (kind, phash) window grouping breaks the match."""
    recs = []
    for cid in range(_PHASH_N_CONTENTS):
        if cid % 2 == 0:
            h, w, ch = 8 + cid % 5, 8 + cid % 7, 1 + cid % 4
            idx = np.arange(h * w * ch, dtype=np.uint64) + np.uint64(
                cid * 97003 + 1
            )
            v = (idx * np.uint64(2654435761)) % np.uint64(2**32)
            px = (
                ((v >> np.uint64(16)) % np.uint64(256))
                .astype(np.uint8)
                .reshape(h, w, ch)
            )
            lum = px[:, :, : (1 if ch <= 2 else 3)].astype(np.float64).mean(axis=2)
            cells = np.array(
                [
                    [
                        lum[r0:r1, c0:c1].mean()
                        for (c0, c1) in _mirror_bounds(lum.shape[1], 8)
                    ]
                    for (r0, r1) in _mirror_bounds(lum.shape[0], 8)
                ]
            )
            phash = _mirror_phash_bits(cells)
            kind = "image"
        else:
            n, ch = 200 + cid % 50, 1 + cid % 2
            idx = np.arange(n * ch, dtype=np.uint64) + np.uint64(
                cid * 40503 + 7
            )
            v = (idx * np.uint64(2654435761)) % np.uint64(2**32)
            frames = (
                (((v >> np.uint64(12)) % np.uint64(65536)).astype(np.int64) - 32768)
                .astype(np.int16)
                .reshape(n, ch)
            )
            mono = frames.astype(np.float64).mean(axis=1)
            blocks = np.array(
                [mono[lo:hi].mean() for (lo, hi) in _mirror_bounds(mono.shape[0], 64)]
            )
            phash = _mirror_phash_bits(blocks)
            kind = "audio"
        for vix in range(_PHASH_VARIANTS):
            recs.append((cid * _PHASH_VARIANTS + vix, kind, phash))
    exp = pd.DataFrame(recs, columns=["media_id", "kind", "phash"])
    grp = exp.groupby(["kind", "phash"])["media_id"]
    exp["group_rep"] = grp.transform("min")
    exp["group_size"] = grp.transform("size").astype("int64")
    exp["is_dup"] = (exp["media_id"] != exp["group_rep"]).astype("int32")
    exp = exp.astype({"media_id": "int64", "phash": "int64"})
    actual = spark_pdf.copy()
    actual["is_dup"] = actual["is_dup"].astype("int32")
    return _diff(exp, actual)


_NEARDUP_N_CONTENTS, _NEARDUP_MAX_HAMMING = 24, 3


def check_media_neardup(spark_pdf: pd.DataFrame, sf_dir: str) -> list[str]:
    """Mirror the near-dup fixture (content formulas + the planted
    content edits), hash with the independent implementation, then
    BRUTE-FORCE all within-kind pairs at Hamming <= threshold — so the
    banded join's recall guarantee is checked against an oracle that
    never bands at all."""
    hashes = []
    for cid in range(_NEARDUP_N_CONTENTS):
        if cid % 2 == 0:
            h, w, ch = 8 + cid % 5, 8 + cid % 7, 1 + cid % 4
            idx = np.arange(h * w * ch, dtype=np.uint64) + np.uint64(
                cid * 97003 + 1
            )
            v = (idx * np.uint64(2654435761)) % np.uint64(2**32)
            px = (
                ((v >> np.uint64(16)) % np.uint64(256))
                .astype(np.int64)
                .reshape(h, w, ch)
            )
            edited = px.copy()
            edited[0, :, :] = np.minimum(edited[0, :, :] + 8, 255)
            kind = "image"
            for vix, arr in enumerate((px, edited)):
                lum = arr[:, :, : (1 if ch <= 2 else 3)].astype(np.float64).mean(axis=2)
                cells = np.array(
                    [
                        [
                            lum[r0:r1, c0:c1].mean()
                            for (c0, c1) in _mirror_bounds(lum.shape[1], 8)
                        ]
                        for (r0, r1) in _mirror_bounds(lum.shape[0], 8)
                    ]
                )
                hashes.append(
                    (cid * 2 + vix, kind, _mirror_phash_bits(cells))
                )
        else:
            n, ch = 200 + cid % 50, 1 + cid % 2
            idx = np.arange(n * ch, dtype=np.uint64) + np.uint64(
                cid * 40503 + 7
            )
            v = (idx * np.uint64(2654435761)) % np.uint64(2**32)
            fr = (
                (((v >> np.uint64(12)) % np.uint64(65536)).astype(np.int64) - 32768)
                .reshape(n, ch)
            )
            edited = fr.copy()
            edited[:10, :] = np.clip(edited[:10, :] + 3000, -32768, 32767)
            kind = "audio"
            for vix, arr in enumerate((fr, edited)):
                mono = arr.astype(np.float64).mean(axis=1)
                blocks = np.array(
                    [
                        mono[lo:hi].mean()
                        for (lo, hi) in _mirror_bounds(mono.shape[0], 64)
                    ]
                )
                hashes.append(
                    (cid * 2 + vix, kind, _mirror_phash_bits(blocks))
                )
    rows = []
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            ia, ka, pa = hashes[i]
            ib, kb, pb = hashes[j]
            if ka != kb:
                continue
            d = bin((pa ^ pb) & ((1 << 64) - 1)).count("1")
            if d <= _NEARDUP_MAX_HAMMING:
                lo, hi = min(ia, ib), max(ia, ib)
                rows.append((ka, lo, hi, d))
    exp = pd.DataFrame(
        rows, columns=["kind", "id_a", "id_b", "hamming"]
    ).astype({"id_a": "int64", "id_b": "int64", "hamming": "int32"})
    actual = spark_pdf.copy()
    actual["hamming"] = actual["hamming"].astype("int32")
    return _diff(exp, actual)


def _mirror_variant_phash(cid: int, perturb: bool = False) -> tuple[str, int]:
    """(kind, phash) for a variants-fixture content id, mirrored from
    the formulas (never the decoder) with the independent hash
    implementation; ``perturb`` applies the planted near-dup edit."""
    if cid % 2 == 0:
        h, w, ch = 8 + cid % 5, 8 + cid % 7, 1 + cid % 4
        idx = np.arange(h * w * ch, dtype=np.uint64) + np.uint64(cid * 97003 + 1)
        v = (idx * np.uint64(2654435761)) % np.uint64(2**32)
        px = ((v >> np.uint64(16)) % np.uint64(256)).astype(np.int64).reshape(h, w, ch)
        if perturb:
            px = px.copy()
            px[0, :, :] = np.minimum(px[0, :, :] + 8, 255)
        lum = px[:, :, : (1 if ch <= 2 else 3)].astype(np.float64).mean(axis=2)
        cells = np.array(
            [
                [
                    lum[r0:r1, c0:c1].mean()
                    for (c0, c1) in _mirror_bounds(lum.shape[1], 8)
                ]
                for (r0, r1) in _mirror_bounds(lum.shape[0], 8)
            ]
        )
        return "image", _mirror_phash_bits(cells)
    n, ch = 200 + cid % 50, 1 + cid % 2
    idx = np.arange(n * ch, dtype=np.uint64) + np.uint64(cid * 40503 + 7)
    v = (idx * np.uint64(2654435761)) % np.uint64(2**32)
    fr = (((v >> np.uint64(12)) % np.uint64(65536)).astype(np.int64) - 32768).reshape(n, ch)
    if perturb:
        fr = fr.copy()
        fr[:10, :] = np.clip(fr[:10, :] + 3000, -32768, 32767)
    mono = fr.astype(np.float64).mean(axis=1)
    blocks = np.array(
        [mono[lo:hi].mean() for (lo, hi) in _mirror_bounds(mono.shape[0], 64)]
    )
    return "audio", _mirror_phash_bits(blocks)


def _mirror_variant_digest(cid: int, perturb: bool = False) -> str:
    """Exact decoded-content digest mirrored from the FORMULAS (never
    the decoder): sha256 over the shape-prefixed pixel/PCM bytes,
    byte-identical to the engine's media_hashes digest."""
    import hashlib
    import struct as _struct

    if cid % 2 == 0:
        h, w, ch = 8 + cid % 5, 8 + cid % 7, 1 + cid % 4
        idx = np.arange(h * w * ch, dtype=np.uint64) + np.uint64(cid * 97003 + 1)
        v = (idx * np.uint64(2654435761)) % np.uint64(2**32)
        px = ((v >> np.uint64(16)) % np.uint64(256)).astype(np.int64).reshape(h, w, ch)
        if perturb:
            px = px.copy()
            px[0, :, :] = np.minimum(px[0, :, :] + 8, 255)
        arr = px.astype(np.uint8)
        head = b"img" + _struct.pack(">III", *arr.shape)
    else:
        n, ch = 200 + cid % 50, 1 + cid % 2
        idx = np.arange(n * ch, dtype=np.uint64) + np.uint64(cid * 40503 + 7)
        v = (idx * np.uint64(2654435761)) % np.uint64(2**32)
        fr = (((v >> np.uint64(12)) % np.uint64(65536)).astype(np.int64) - 32768).reshape(n, ch)
        if perturb:
            fr = fr.copy()
            fr[:10, :] = np.clip(fr[:10, :] + 3000, -32768, 32767)
        arr = fr.astype(np.int16)
        head = b"aud" + _struct.pack(">II", *arr.shape)
    return hashlib.sha256(head + arr.tobytes()).hexdigest()


def check_media_incremental(spark_pdf: pd.DataFrame, sf_dir: str) -> list[str]:
    """Brute-force (band-free) mirror of the incremental media-dedup
    fixture. dup_exact is keyed on the DECODED-CONTENT DIGEST (the
    r12 precision audit: phash equality false-merges — and an edited
    copy whose aHash happens not to move is NEAR, not exact);
    dup_near is min phash Hamming <= 3 among non-exact. A banding
    recall bug, a decode bug, a digest bug, or a precedence bug all
    break the match."""
    corpus_digests, corpus_hashes = {}, {}
    for cid in range(12):
        k, p = _mirror_variant_phash(cid)
        corpus_hashes.setdefault(k, set()).add(p)
        corpus_digests.setdefault(k, set()).add(_mirror_variant_digest(cid))
    rows = []
    inc = (
        [(1000 + i, cid, False) for i, cid in enumerate(range(4))]
        + [(2000 + i, cid, True) for i, cid in enumerate(range(4, 8))]
        + [(3000 + i, cid, False) for i, cid in enumerate(range(100, 104))]
    )
    for mid, cid, perturb in inc:
        k, p = _mirror_variant_phash(cid, perturb)
        dg = _mirror_variant_digest(cid, perturb)
        if dg in corpus_digests.get(k, set()):
            d = "dup_exact"
        elif any(
            bin((p ^ q) & ((1 << 64) - 1)).count("1") <= 3
            for q in corpus_hashes.get(k, set())
        ):
            d = "dup_near"
        else:
            d = "new"
        rows.append((mid, k, d))
    rows.append((4000, "image", "corrupt"))
    exp = pd.DataFrame(rows, columns=["media_id", "kind", "decision"]).astype(
        {"media_id": "int64"}
    )
    return _diff(exp, spark_pdf.copy())


def _mirror_variant_arrays(cid: int):
    """(kind, content array) for a variants-fixture content id,
    mirrored from the formulas (never the decoder)."""
    if cid % 2 == 0:
        h, w, ch = 8 + cid % 5, 8 + cid % 7, 1 + cid % 4
        idx = np.arange(h * w * ch, dtype=np.uint64) + np.uint64(cid * 97003 + 1)
        v = (idx * np.uint64(2654435761)) % np.uint64(2**32)
        return "image", (
            ((v >> np.uint64(16)) % np.uint64(256))
            .astype(np.int64)
            .reshape(h, w, ch)
        )
    n, ch = 200 + cid % 50, 1 + cid % 2
    idx = np.arange(n * ch, dtype=np.uint64) + np.uint64(cid * 40503 + 7)
    v = (idx * np.uint64(2654435761)) % np.uint64(2**32)
    return "audio", (
        ((v >> np.uint64(12)) % np.uint64(65536)).astype(np.int64) - 32768
    ).reshape(n, ch)


def check_media_quality(spark_pdf: pd.DataFrame, sf_dir: str) -> list[str]:
    """Independent mirror of the media quality gate: recompute every
    metric from the FIXTURE FORMULAS (never the engine's decoder or
    rule expressions) and re-apply the rule table in plain Python —
    a decode bug, a metric bug, a null-handling bug, or a rule
    precedence bug all break the match. IDs follow
    synth_media_quality_fixture."""

    def image_metrics(px):
        ch = px.shape[2]
        lum = px[:, :, : (1 if ch <= 2 else 3)].astype(np.float64).mean(axis=2)
        return {
            "width": px.shape[1],
            "height": px.shape[0],
            "lum_std": float(lum.std()),
        }

    def audio_metrics(fr):
        s = fr.astype(np.float64)
        return {
            "n_frames": fr.shape[0],
            "clip_ratio": float((np.abs(s) >= 32256).mean()),
            "silence_ratio": float((np.abs(s) <= 327).mean()),
        }

    def verdict(kind, m, decode_err=None):
        failed = []
        if decode_err is not None:
            failed.append(decode_err)
        elif kind == "image":
            if m["width"] < 4 or m["height"] < 4:
                failed.append("too_small")
            if m["width"] > 8 * m["height"] or m["height"] > 8 * m["width"]:
                failed.append("extreme_aspect")
            if m["lum_std"] < 2.0:
                failed.append("flat_image")
        else:
            if m["n_frames"] < 16:
                failed.append("too_short_audio")
            if m["clip_ratio"] > 0.05:
                failed.append("clipped_audio")
            if m["silence_ratio"] > 0.9:
                failed.append("silent_audio")
        # fixed rule order: corrupt, unsupported, too_small,
        # extreme_aspect, flat_image, too_short_audio, clipped_audio,
        # silent_audio — a decode_err row fails exactly its own rule
        # and the per-kind checks emit in table order
        return (len(failed) == 0, len(failed), ",".join(failed))

    rows = []
    for cid in range(10):
        kind, arr = _mirror_variant_arrays(cid)
        m = image_metrics(arr) if kind == "image" else audio_metrics(arr)
        rows.append((cid, kind, *verdict(kind, m)))
    rows.append((100, "image", *verdict("image", image_metrics(np.full((16, 16, 3), 128, dtype=np.int64)))))
    _, a2 = _mirror_variant_arrays(2)
    rows.append((101, "image", *verdict("image", image_metrics(a2[:2, :3, :]))))
    _, a4 = _mirror_variant_arrays(4)
    wide = np.tile(a4[:2, :, :], (1, 12, 1))[:2, :32, :]
    rows.append((102, "image", *verdict("image", image_metrics(wide))))
    _, f1 = _mirror_variant_arrays(1)
    clipped = np.where(f1 >= 0, 32767, -32768)
    rows.append((110, "audio", *verdict("audio", audio_metrics(clipped))))
    rows.append((111, "audio", *verdict("audio", audio_metrics(np.zeros((64, 1), dtype=np.int64)))))
    _, f3 = _mirror_variant_arrays(3)
    rows.append((112, "audio", *verdict("audio", audio_metrics(f3[:8, :]))))
    rows.append((120, "image", *verdict("image", None, decode_err="corrupt")))
    rows.append((121, "video", *verdict("video", None, decode_err="unsupported")))
    exp = pd.DataFrame(
        rows,
        columns=["media_id", "kind", "passes", "n_failed", "failed_rules"],
    ).astype({"media_id": "int64", "n_failed": "int64"})
    return _diff(exp, spark_pdf.copy())


def check_media_contamination(spark_pdf: pd.DataFrame, sf_dir: str) -> list[str]:
    """Band-free brute-force mirror of the media decontamination
    fixture: all within-kind corpus x benchmark pairs at Hamming <= 3
    over formula-derived hashes, tagged 'exact' only when Hamming is 0
    AND the formula-derived content digests match (the r13 confidence
    column — a digest bug or a mislabeled candidate breaks the
    match)."""
    bench = [
        (i, *_mirror_variant_phash(200 + i), _mirror_variant_digest(200 + i))
        for i in range(8)
    ]
    corpus = (
        [
            (5000 + i, *_mirror_variant_phash(300 + i), _mirror_variant_digest(300 + i))
            for i in range(12)
        ]
        + [
            (6000 + i, *_mirror_variant_phash(200 + i), _mirror_variant_digest(200 + i))
            for i in range(3)
        ]
        + [
            (
                7000 + i,
                *_mirror_variant_phash(203 + i, perturb=True),
                _mirror_variant_digest(203 + i, perturb=True),
            )
            for i in range(2)
        ]
    )
    rows = []
    for mid, ck, cp, cdg in corpus:
        for bid, bk, bp, bdg in bench:
            if ck != bk:
                continue
            d = bin((cp ^ bp) & ((1 << 64) - 1)).count("1")
            if d <= 3:
                conf = "exact" if d == 0 and cdg == bdg else "candidate"
                rows.append((mid, ck, bid, d, conf))
    exp = pd.DataFrame(
        rows, columns=["media_id", "kind", "bench_id", "hamming", "confidence"]
    ).astype({"media_id": "int64", "bench_id": "int64", "hamming": "int32"})
    actual = spark_pdf.copy()
    actual["hamming"] = actual["hamming"].astype("int32")
    return _diff(exp, actual)


def check_media_prep(spark_pdf: pd.DataFrame, sf_dir: str) -> list[str]:
    """Formula-mirrored end-to-end reference for the fused media prep
    pipeline: recompute gate verdicts, digest-keyed keep-first dedup,
    and contamination tags in plain Python over the mirrored content
    formulas — no banding, no decoder, no engine rule expressions."""
    # corpus: quality fixture (ids 0-9 clean; 100.. planted fails;
    # 120 corrupt) + id 200 = re-encode of content 0. Quality fails
    # and the corrupt row never reach dedup; id 200 shares content 0's
    # digest and loses keep-first to id 0.
    admitted = []
    for cid in range(10):
        k, p = _mirror_variant_phash(cid)
        admitted.append((cid, k, p, _mirror_variant_digest(cid)))
    # benchmark: re-encode of content 2 (same digest, Hamming 0 ->
    # exact) and unrelated audio content 501
    bench = [
        _mirror_variant_phash(2) + (_mirror_variant_digest(2),),
        _mirror_variant_phash(501) + (_mirror_variant_digest(501),),
    ]
    rows = []
    for mid, kind, ph, dg in admitted:
        tag = None
        lvl = 0
        for bk, bp, bdg in bench:
            if bk != kind:
                continue
            d = bin((ph ^ bp) & ((1 << 64) - 1)).count("1")
            if d <= 3:
                lvl = max(lvl, 2 if d == 0 and dg == bdg else 1)
        if lvl:
            tag = "exact" if lvl == 2 else "candidate"
        rows.append((mid, kind, ph, dg, tag))
    exp = pd.DataFrame(
        rows,
        columns=["media_id", "kind", "phash", "digest", "contamination"],
    ).astype({"media_id": "int64", "phash": "int64"})
    actual = spark_pdf.copy()
    actual["phash"] = actual["phash"].astype("int64")
    return _diff(exp, actual)


#: name → checker, consumed by plans.queries when building QUERIES
PY_ORACLES = {
    "q_bpe_merges": check_bpe_merges,
    "q_media_features": check_media_features,
    "q_kmeans_cells": check_kmeans_cells,
    "q_ann_ivf": check_ann_ivf,
    "q_media_decode": check_media_decode,
    "q_media_phash": check_media_phash,
    "q_media_neardup": check_media_neardup,
    "q_media_incremental": check_media_incremental,
    "q_media_contamination": check_media_contamination,
    "q_media_quality": check_media_quality,
    "q_media_prep": check_media_prep,
}
