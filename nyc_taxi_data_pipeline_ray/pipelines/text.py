"""Text analysis + deduplication over the ``documents`` table.

Large-scale training-data operators the reference lacks, built
Ray-Data-first: every per-doc kernel is a vectorized ``map_batches``
(Arrow split + list-offset segment sums, numpy bit matrices); the only
shuffles are small grouped aggregates or LSH-bucket groupbys.

Operators:
- token/char stats                  -> :func:`q_doc_token_stats` (SQL oracle)
- quality scoring                   -> :func:`q_doc_quality` (SQL oracle)
- exact dedup (hash-partitioned)    -> :func:`q_dedup_exact` (SQL oracle)
- byte-set Jaccard similar pairs    -> :func:`q_char_jaccard_pairs` (SQL
  oracle via DuckDB ``jaccard`` — byte-set semantics, verified)
- md5 fingerprint                   -> :func:`q_fingerprint` (SQL oracle)
- language ID (stopword heuristic)  -> :func:`q_langid` (rows-only)
- MinHash + LSH near-dup            -> :func:`q_minhash_near_dups` (rows-only)
- SimHash                           -> :func:`q_simhash` (rows-only)

Scale notes: exact dedup groups on a 64-bit content hash (not the text
itself) so the shuffle key is 8 bytes/row; pairwise Jaccard is bounded
by LSH-style grouping (here per ``lang``; at 10^9 docs the group key
becomes (lang, minhash band)); MinHash banding keeps candidate
generation linear.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Sum

STOPWORDS = (
    "the", "and", "of", "a", "to", "in", "is", "it", "that", "was",
    "for", "on", "with", "as", "at", "by", "be", "this", "are", "or",
)

_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "was"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"},
    "fr": {"le", "la", "les", "et", "est", "une", "dans", "que", "pour", "des"},
    "es": {"el", "la", "los", "y", "es", "una", "en", "que", "por", "con"},
}


def round_half_away(x: np.ndarray, nd: int) -> np.ndarray:
    """DuckDB-compatible rounding (half away from zero).  numpy/pandas
    round half-to-even, which disagrees on exactly-representable ties
    like 5/32 = 0.15625 — real for ratios with power-of-two denominators."""
    p = 10.0 ** nd
    return np.sign(x) * np.floor(np.abs(x) * p + 0.5) / p


def _tokens(text_col) -> pa.ListArray:
    """trim -> whitespace split; matches DuckDB
    ``regexp_split_to_array(trim(text), '\\s+')`` incl. the empty-string
    edge case (both produce ['']).  Always returns a plain ListArray."""
    out = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(text_col))
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out


def _segment_sums(flags: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Sum ``flags`` per list row given Arrow list offsets — vectorized."""
    starts = offsets[:-1]
    out = np.add.reduceat(
        np.concatenate([flags.astype(np.int64), [0]]), np.minimum(starts, len(flags))
    )
    out[starts == offsets[1:]] = 0
    return out


def _token_stop_counts(text) -> tuple[np.ndarray, np.ndarray]:
    toks = _tokens(pc.utf8_lower(text))
    offsets = toks.offsets.to_numpy(zero_copy_only=False)
    offsets = offsets - offsets[0]  # slice-local offsets
    n_tokens = np.diff(offsets)
    flat = toks.flatten()
    is_stop = pc.is_in(flat, value_set=pa.array(STOPWORDS)).to_numpy(zero_copy_only=False)
    n_stop = _segment_sums(is_stop.astype(np.int64), offsets)
    return n_tokens, n_stop


# --------------------------------------------------------------------------
def q_doc_token_stats(sf_dir: str) -> rd.Dataset:
    """Per-doc char/token counts — fully vectorized Arrow kernels."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        text = t["text"]
        n_tok = pc.list_value_length(_tokens(text))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
                "n_tokens": pc.cast(n_tok, pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# --------------------------------------------------------------------------
def q_doc_quality(sf_dir: str) -> rd.Dataset:
    """Quality scoring: stopword ratio + punctuation ratio + length band
    -> additive score (the text analog of the reference's additive fraud
    score, ``streaming/spark/fraud_detector.py:221-294``)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        text = t["text"].combine_chunks()
        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.float64)
        n_tokens, n_stop = _token_stop_counts(text)
        punct = (
            pc.count_substring_regex(text, pattern="[!?.,;:]")
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        stop_ratio = round_half_away(n_stop / np.maximum(n_tokens, 1), 4)
        punct_ratio = round_half_away(punct / np.maximum(n_chars, 1), 4)
        len_band = ((n_tokens >= 10) & (n_tokens <= 500)).astype(np.float64)
        score = round_half_away(
            0.4 * stop_ratio + 0.4 * len_band + 0.2 * (1.0 - punct_ratio), 4
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "stop_ratio": pa.array(stop_ratio),
                "punct_ratio": pa.array(punct_ratio),
                "quality_score": pa.array(score),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# --------------------------------------------------------------------------
def q_dedup_exact(sf_dir: str) -> pd.DataFrame:
    """Exact dedup: hash-partition on a 64-bit content hash, keep the
    first (min doc_id) per identical text (§2.7: the explicit version of
    the reference's implicit dup-collapsing merge, fct_trips.sql:1-7)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def add_hash(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(np.asarray(t["text"].to_numpy(zero_copy_only=False), object))
        return t.append_column("h", pa.array(h.astype(np.int64)))

    def first_per_text(g: pd.DataFrame) -> pd.DataFrame:
        # within one hash bucket: exact-text grouping guards collisions
        out = g.groupby("text", as_index=False).agg(
            doc_id=("doc_id", "min"), n_copies=("doc_id", "size")
        )
        return out[["doc_id", "n_copies"]]

    df = (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("h")
        .map_groups(first_per_text, batch_format="pandas")
        .to_pandas()
    )
    df["n_copies"] = df["n_copies"].astype("int64")
    return df.sort_values("doc_id", ignore_index=True)


# --------------------------------------------------------------------------
def q_char_jaccard_pairs(sf_dir: str, threshold: float = 1.0) -> pd.DataFrame:
    """Similar-document pairs by byte-set Jaccard within each ``lang``
    group — the n-gram-Jaccard family with n=1 over utf-8 bytes, chosen
    because DuckDB's ``jaccard()`` has exactly these semantics (so the
    oracle is exact: inter/union of small ints is bit-identical).

    Vectorized: each group builds a (docs x 256) byte-presence bit
    matrix; intersections come from one integer matmul.  At larger
    scale the group key becomes an LSH band, keeping groups bounded.
    """
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])

    def sigs(t: pa.Table) -> pa.Table:
        # 256-bit byte-presence signature packed to 32 bytes — the ONLY
        # thing the lang shuffle ships (not the multi-KB text payload)
        texts = t["text"].to_pylist()
        m = np.zeros((len(texts), 256), np.uint8)
        for i, s in enumerate(texts):
            b = np.frombuffer((s or "").encode("utf-8"), dtype=np.uint8)
            m[i, np.unique(b)] = 1
        packed = np.packbits(m, axis=1)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(packed.reshape(-1), pa.uint8()), 32
                ),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", ignore_index=True)
        n = len(g)
        if n < 2:
            return pd.DataFrame(columns=["lang", "doc_a", "doc_b", "sim"])
        m = np.unpackbits(np.stack(g["sig"].to_numpy()), axis=1).astype(np.int16)
        inter = m @ m.T
        sizes = m.sum(axis=1)
        union = sizes[:, None] + sizes[None, :] - inter
        sim = inter / np.maximum(union, 1)
        ia, ib = np.triu_indices(n, k=1)
        keep = sim[ia, ib] >= threshold
        ids = g["doc_id"].to_numpy()
        return pd.DataFrame(
            {
                "lang": g["lang"].iloc[0],
                "doc_a": ids[ia[keep]],
                "doc_b": ids[ib[keep]],
                "sim": np.round(sim[ia, ib][keep], 4),
            }
        )

    df = (
        ds.map_batches(sigs, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    return df.sort_values(["lang", "doc_a", "doc_b"], ignore_index=True)


# --------------------------------------------------------------------------
def q_fingerprint(sf_dir: str) -> rd.Dataset:
    """md5 content fingerprint per document (surrogate-key analog,
    ``stg_trips.sql:4-13`` md5 surrogate key)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        fps = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"], "fingerprint": pa.array(fps)})

    return ds.map_batches(fn, batch_format="pyarrow")


# --------------------------------------------------------------------------
def q_langid(sf_dir: str) -> pd.DataFrame:
    """Language ID heuristic: CJK byte-ratio for zh; else argmax of
    per-language stopword hit counts.  Rows-only oracle (the heuristic is
    not SQL-expressible); accuracy asserted in tests."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])

    marker_sets = {k: pa.array(sorted(v)) for k, v in _LANG_MARKERS.items()}

    def fn(t: pa.Table) -> pa.Table:
        text = t["text"].combine_chunks()
        toks = _tokens(pc.utf8_lower(text))
        offsets = toks.offsets.to_numpy(zero_copy_only=False)
        offsets = offsets - offsets[0]
        flat = toks.flatten()
        scores = []
        for lang in ("en", "de", "fr", "es"):
            hit = pc.is_in(flat, value_set=marker_sets[lang]).to_numpy(zero_copy_only=False)
            scores.append(_segment_sums(hit.astype(np.int64), offsets))
        score_mat = np.stack(scores, axis=1)
        langs = np.array(["en", "de", "fr", "es"], dtype=object)
        pred = langs[np.argmax(score_mat, axis=1)]
        # CJK detection: high non-ascii byte share
        nb = pc.binary_length(text).to_numpy(zero_copy_only=False)
        nc = pc.utf8_length(text).to_numpy(zero_copy_only=False)
        pred = np.where(nb > 2 * np.maximum(nc, 1), "zh", pred)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "pred_lang": pa.array(pred, pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow").to_pandas().sort_values("doc_id", ignore_index=True)


# --------------------------------------------------------------------------
# MinHash + LSH near-duplicate detection (rows-only oracle)

_MERSENNE = (1 << 61) - 1


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Rolling polynomial hashes of char k-grams — vectorized per doc."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)), constant_values=32)
    windows = np.lib.stride_tricks.sliding_window_view(b, k)
    weights = (np.uint64(257) ** np.arange(k, dtype=np.uint64)) % np.uint64(_MERSENNE)
    return (windows * weights).sum(axis=1, dtype=np.uint64) % np.uint64(_MERSENNE)


class MinHasher:
    """Stateful map_batches actor: permutation parameters built once."""

    def __init__(self, num_perm: int = 64, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
        self.num_perm = num_perm

    def signature(self, text: str) -> np.ndarray:
        h = np.unique(_shingle_hashes(text))
        # (a*h + b) mod p for each perm: (P x H) -> min over H
        vals = (self.a[:, None] * h[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return vals.min(axis=1)

    def __call__(self, t: pa.Table) -> pa.Table:
        sigs = np.stack([self.signature(s) for s in t["text"].to_pylist()])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "sig": pa.array(list(sigs.astype(np.int64))),
            }
        )


def q_minhash_near_dups(
    sf_dir: str, *, num_perm: int = 64, bands: int = 16, threshold: float = 0.5
) -> pd.DataFrame:
    """MinHash signatures -> banded LSH buckets -> candidate pairs ->
    estimated-Jaccard filter.  Candidate generation is linear (explode to
    (band, band_hash) rows, one groupby); only bucket-mates are compared."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm},
        batch_format="pyarrow",
        concurrency=2,
    )
    rows_per_band = num_perm // bands

    def explode(t: pa.Table) -> pa.Table:
        sig = np.stack(t["sig"].to_numpy(zero_copy_only=False))
        n = sig.shape[0]
        band_ids, doc_idx, band_hash = [], [], []
        for b in range(bands):
            chunk = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
            # deterministic band hash: polynomial combine of the band rows
            bh = np.zeros(n, dtype=np.uint64)
            for c in range(chunk.shape[1]):
                bh = bh * np.uint64(1000003) + chunk[:, c].astype(np.uint64)
            band_ids.append(np.full(n, b, np.int32))
            doc_idx.append(t["doc_id"].to_numpy(zero_copy_only=False))
            band_hash.append(bh.astype(np.int64))
        sig_rep = np.tile(sig, (bands, 1))
        return pa.table(
            {
                "band": pa.array(np.concatenate(band_ids)),
                "band_hash": pa.array(np.concatenate(band_hash)),
                "doc_id": pa.array(np.concatenate(doc_idx)),
                "sig": pa.array(list(sig_rep.astype(np.int64))),
            }
        )

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # one Ray group per band; tiny per-bucket groups are handled with
        # an in-process pandas groupby (avoids per-bucket task overhead —
        # most LSH buckets are singletons)
        out = []
        for _, bg in g.groupby("band_hash", sort=False):
            if len(bg) < 2:
                continue
            bg = bg.sort_values("doc_id", ignore_index=True)
            sig = np.stack(bg["sig"].to_numpy())
            ids = bg["doc_id"].to_numpy()
            ia, ib = np.triu_indices(len(bg), k=1)
            est = (sig[ia] == sig[ib]).mean(axis=1)
            keep = est >= threshold
            if keep.any():
                out.append(
                    pd.DataFrame(
                        {
                            "doc_a": ids[ia[keep]],
                            "doc_b": ids[ib[keep]],
                            "est_jaccard": np.round(est[keep], 4),
                        }
                    )
                )
        if not out:
            return pd.DataFrame(
                {"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64"),
                 "est_jaccard": pd.Series(dtype="float64")}
            )
        return pd.concat(out, ignore_index=True)

    df = (
        sigs.map_batches(explode, batch_format="pyarrow")
        .groupby("band")
        .map_groups(band_pairs, batch_format="pandas")
        .to_pandas()
    )
    if df.empty:
        return pd.DataFrame(columns=["doc_a", "doc_b", "est_jaccard"])
    df = df.drop_duplicates(["doc_a", "doc_b"], ignore_index=True)
    return df.sort_values(["doc_a", "doc_b"], ignore_index=True)


# --------------------------------------------------------------------------
def q_simhash(sf_dir: str) -> pd.DataFrame:
    """64-bit SimHash over tokens (feature-hash weighted bit votes)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        out = []
        for s in t["text"].to_pylist():
            toks = s.lower().split()
            if not toks:
                out.append(0)
                continue
            hs = pd.util.hash_array(np.asarray(toks, object)).astype(np.uint64)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
                np.int64
            )
            votes = bits.sum(axis=0) * 2 - len(hs)
            sh = np.uint64(0)
            for j in np.nonzero(votes > 0)[0]:
                sh |= np.uint64(1) << np.uint64(j)
            out.append(int(sh.astype(np.int64) if sh < (1 << 63) else int(sh) - (1 << 64)))
        return pa.table({"doc_id": t["doc_id"], "simhash": pa.array(out, pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow").to_pandas().sort_values("doc_id", ignore_index=True)


# --------------------------------------------------------------------------
# n-gram Jaccard near-dup detection (exact baseline for the MinHash/LSH
# estimators above): word-3-gram sets, pairwise Jaccard within a lang
# block.  Blocking on lang keeps each pairwise task ~1/L of the corpus;
# at 100 TB the MinHash+LSH variant (q_minhash_near_dups) is the scale
# path and this exact version runs on LSH candidate pairs only.
def q_ngram_jaccard(sf_dir: str, *, n: int = 3, threshold: float = 0.5) -> pd.DataFrame:
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])

    def gramsets(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        out_sets = []
        for s in texts:
            toks = (s or "").strip().split()
            out_sets.append(
                list({" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)})
                if len(toks) >= n
                else None
            )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "grams": pa.array(out_sets, pa.list_(pa.string())),
            }
        )

    def block_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["grams"].notna()].sort_values("doc_id", ignore_index=True)
        ids = g["doc_id"].to_numpy()
        sets = [set(x) for x in g["grams"]]
        rows = {"doc_a": [], "doc_b": [], "jac": []}
        for i in range(len(ids)):
            si = sets[i]
            for j in range(i + 1, len(ids)):
                inter = len(si & sets[j])
                if not inter:
                    continue
                jac = inter / (len(si) + len(sets[j]) - inter)
                if jac >= threshold:
                    rows["doc_a"].append(ids[i])
                    rows["doc_b"].append(ids[j])
                    rows["jac"].append(round(jac, 4))
        return pd.DataFrame(
            {
                "doc_a": pd.Series(rows["doc_a"], dtype="int64"),
                "doc_b": pd.Series(rows["doc_b"], dtype="int64"),
                "jac": pd.Series(rows["jac"], dtype="float64"),
            }
        )

    df = (
        ds.map_batches(gramsets, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(block_pairs, batch_format="pandas")
        .to_pandas()
    )
    return df.sort_values(["doc_a", "doc_b"], ignore_index=True)


#: BPE-ish pre-tokenizer pattern (GPT-2 family simplified to RE2-safe,
#: no lookaheads): contraction tails, letter runs, digit runs, punct runs.
BPE_PATTERN = r"'[a-z]+|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def q_bpe_tokens(sf_dir: str) -> rd.Dataset:
    """Token counting, BPE-ish: one vectorized Arrow regex-count kernel
    per batch (``pc.count_substring_regex``) next to the whitespace count
    — the two token-budget estimators a training-data pipeline tracks."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        ws = pc.list_value_length(_tokens(t["text"]))
        bpe = pc.count_substring_regex(t["text"], BPE_PATTERN)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_ws_tokens": pc.cast(ws, pa.int64()),
                "n_bpe_tokens": pc.cast(bpe, pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def q_winnow_fingerprint(sf_dir: str, *, k: int = 5, window: int = 4) -> pd.DataFrame:
    """Document fingerprinting by winnowing (rolling Karp-Rabin k-gram
    hashes, minimum per sliding window) — the standard near-copy
    detector (Schleimer/Wilkerson/Aiken, MOSS).  Rows-only: two docs
    sharing most fingerprints are near-copies; asserted on planted
    duplicates in tests.  Returns (doc_id, n_fingerprints, fp_xor) where
    fp_xor is an order-free digest of the selected fingerprints."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    B = np.uint64(1_000_003)

    def fn(t: pa.Table) -> pa.Table:
        out = {"doc_id": [], "n_fingerprints": [], "fp_xor": []}
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            b = np.frombuffer((s or "").encode("utf-8"), dtype=np.uint8).astype(np.uint64)
            if len(b) < k:
                out["doc_id"].append(did)
                out["n_fingerprints"].append(0)
                out["fp_xor"].append(0)
                continue
            # rolling Karp-Rabin over all k-grams, vectorized via cumulative
            # polynomial trick: h[i] = sum b[i+j] * B^(k-1-j)
            h = np.zeros(len(b) - k + 1, np.uint64)
            for j in range(k):  # k is tiny (5); the inner op is vectorized
                h = h * B + b[j : j + len(h)]
            if len(h) >= window:
                w = np.lib.stride_tricks.sliding_window_view(h, window)
                fps = np.unique(w.min(axis=1))
            else:
                fps = np.unique(h.min(keepdims=True))
            x = np.uint64(0)
            for v in fps:
                x ^= v
            out["doc_id"].append(did)
            out["n_fingerprints"].append(int(len(fps)))
            out["fp_xor"].append(int(x))
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "n_fingerprints": pa.array(out["n_fingerprints"], pa.int64()),
                "fp_xor": pa.array([v % (1 << 63) for v in out["fp_xor"]], pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow").to_pandas().sort_values(
        "doc_id", ignore_index=True
    )
