"""Text-analysis operators over the ``documents`` table.

All but ``vocab_stats`` are single-pass ``map_batches`` stages with
vectorized or compiled-once bodies and no shuffle; vocab_stats moves
only per-batch-deduped (lang, token-hash) pairs through bounded hash
buckets.  The SQL-oracle-checked ones
(token_counts, quality_stats) use definitions expressible in DuckDB
SQL with exactly matching semantics; the heuristic ones (lang_id,
fingerprints) are deterministic but not SQL-expressible (rows-only
driver check + pytest oracles)."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

# fixed stopword list shared with the SQL oracle (keep in sync with
# __ray_entry__.oracle_sql)
STOPWORDS = ("the", "and", "of", "a", "to", "in", "is")
_STOP_RE = re.compile(r"\b(?:%s)\b" % "|".join(STOPWORDS))
_PUNCT_RE = re.compile(r"[.!?,;:]")
# BPE-ish tokenizer: runs of letters, runs of digits, or single
# non-space symbols (GPT-2-style coarse pretokenization)
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")


def _token_batch(batch: pa.Table) -> pa.Table:
    # fully Arrow-native (RE2 kernels, zero Python rows): counts are
    # pinned equal to the Python-re definitions by test_token_counts
    import pyarrow.compute as pc

    col = batch["text"]
    # n_tokens matches DuckDB len(string_split(text, ' ')) == spaces+1
    n_tokens = pc.add(pc.count_substring(col, " "), 1)
    n_bpe = pc.count_substring_regex(col, _BPE_RE.pattern)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pc.cast(n_tokens, pa.int64()),
            "n_bpe_tokens": pc.cast(n_bpe, pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(col), pa.int64()),
        }
    )


def token_counts(sf_dir: str):
    """doc_id, n_tokens (space-split), n_bpe_tokens (regex), n_chars."""
    import ray.data

    from polipus_ray.ops.dedup import small_read_blocks

    path = f"{sf_dir}/documents.parquet"
    ds = ray.data.read_parquet(path, columns=["doc_id", "text"], override_num_blocks=small_read_blocks(path))
    return ds.map_batches(_token_batch, batch_format="pyarrow")


def _quality_batch(batch: pa.Table) -> pa.Table:
    # fully Arrow-native (RE2 kernels over the lowered column)
    import pyarrow.compute as pc

    col = batch["text"]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pc.cast(pc.add(pc.count_substring(col, " "), 1), pa.int64()),
            "stop_cnt": pc.cast(pc.count_substring_regex(pc.utf8_lower(col), _STOP_RE.pattern), pa.int64()),
            "punct_cnt": pc.cast(pc.count_substring_regex(col, _PUNCT_RE.pattern), pa.int64()),
        }
    )


def quality_stats(sf_dir: str):
    """Length / stopword / punctuation counts (quality-score inputs;
    integer columns so the DuckDB value-hash comparison is exact)."""
    import ray.data

    from polipus_ray.ops.dedup import small_read_blocks

    path = f"{sf_dir}/documents.parquet"
    ds = ray.data.read_parquet(path, columns=["doc_id", "text"], override_num_blocks=small_read_blocks(path))
    return ds.map_batches(_quality_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------

_LANG_STOP = {
    "en": {"the", "and", "of", "a", "to", "is", "in", "that", "it"},
    "es": {"el", "la", "de", "y", "que", "en", "un", "una", "los"},
    "de": {"der", "die", "das", "und", "ist", "ein", "nicht", "mit"},
    "fr": {"le", "la", "les", "de", "et", "un", "une", "est", "que"},
    "zh": set(),  # no-latin-stopword bucket
}


class LangId:
    """Stopword-vote language heuristic (actor-pool stage: tables
    compiled once per actor).  Deterministic tie-break by language
    name.  Note: the synthetic corpus draws from one English-ish
    vocabulary for every ``lang`` label, so this predicts 'en'
    throughout on testdata — the pytest oracle checks determinism and
    behavior on crafted inputs, not label recovery."""

    def __init__(self):
        self.word = re.compile(r"[a-zA-Z]+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = []
        for t in batch["text"].to_pylist():
            toks = [w.lower() for w in self.word.findall(t)]
            nonascii = sum(1 for ch in t if ord(ch) > 127)
            if toks and nonascii > len(t) * 0.3:
                preds.append("zh")
                continue
            votes = {lang: sum(1 for w in toks if w in sw) for lang, sw in _LANG_STOP.items() if sw}
            best = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))
            preds.append(best[0][0] if best and best[0][1] > 0 else "unknown")
        return pa.table({"doc_id": batch["doc_id"], "pred_lang": pa.array(preds, pa.string())})


def lang_id(sf_dir: str):
    import ray.data

    from polipus_ray.ops.dedup import small_read_blocks

    path = f"{sf_dir}/documents.parquet"
    ds = ray.data.read_parquet(path, columns=["doc_id", "text"], override_num_blocks=small_read_blocks(path))
    # autoscaling (1, 2): a fixed pool min can deadlock the streaming
    # executor when other actors hold the session's CPUs (see
    # images.decode_stage)
    return ds.map_batches(LangId, batch_format="pyarrow", concurrency=(1, 2))


# ---------------------------------------------------------------------------


def _doc_fingerprint(text: str, window: int = 4) -> int:
    """Winnowing-style fingerprint: 64-bit rolling token hashes, min
    over each sliding window, XOR-fold of the selected mins."""
    toks = text.split(" ")
    hs = [int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big") for t in toks]
    if not hs:
        return 0
    if len(hs) < window:
        out = 0
        for h in hs:
            out ^= h
        return out & 0x7FFFFFFFFFFFFFFF
    out = 0
    for i in range(len(hs) - window + 1):
        out ^= min(hs[i : i + window])
    return out & 0x7FFFFFFFFFFFFFFF


def _fp_batch(batch: pa.Table) -> pa.Table:
    fps = [_doc_fingerprint(t) for t in batch["text"].to_pylist()]
    return pa.table({"doc_id": batch["doc_id"], "fingerprint": pa.array(fps, pa.int64())})


def fingerprints(sf_dir: str):
    """doc_id -> winnowing fingerprint (deterministic; rows-only check)."""
    import ray.data

    from polipus_ray.ops.dedup import small_read_blocks

    path = f"{sf_dir}/documents.parquet"
    ds = ray.data.read_parquet(path, columns=["doc_id", "text"], override_num_blocks=small_read_blocks(path))
    return ds.map_batches(_fp_batch, batch_format="pyarrow")


_VOCAB_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd multiplier


def vocab_stats(sf_dir: str):
    """Per-language vocabulary stats: exact distinct token count
    (md5-u64 token hashes — the shared Python/SQL hash, so the DuckDB
    oracle counts the SAME distinct values) plus total token count
    (space-split, DuckDB ``string_split(text, ' ')`` semantics).

    The one text op that shuffles — but only (lang, token-hash) pairs
    already deduped per batch, never text.  Map side: one flat split
    per batch, ONE vectorized md5 call over the flat token stream
    (ops/md5vec.py), per-lang np.unique; token totals ride along as
    sentinel rows (cnt > 0) so the whole thing is single-pass.
    Distinct-fold happens in bounded hash buckets keyed by the
    (lang, token) pair hash — group count fixed regardless of vocab
    size — then a final tiny groupby(lang) (language count is bounded)
    sums the per-bucket partials."""
    import ray.data

    from polipus_ray.ops.dedup import join_partitions, small_read_blocks
    from polipus_ray.ops.md5vec import md5_u64_strs

    nb = join_partitions(None)

    def explode(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        langs = batch["lang"].to_pylist()
        per_doc = [t.split(" ") for t in texts]
        counts = np.fromiter((len(p) for p in per_doc), np.int64, len(per_doc))
        th = md5_u64_strs([w for p in per_doc for w in p])
        lang_of_tok = np.repeat(np.asarray(langs, dtype=object), counts)
        out_lang: list = []
        out_h: list = []
        out_cnt: list = []
        out_pk: list = []
        for lg in sorted(set(langs)):
            lg_h = md5_u64_strs([lg])[0]
            u = np.unique(th[lang_of_tok == lg])
            out_lang.append(np.full(len(u) + 1, lg, dtype=object))
            out_h.append(np.concatenate([u, [np.uint64(0)]]))
            # sentinel row: cnt = this batch's total tokens for lg
            out_cnt.append(np.concatenate([np.zeros(len(u), np.int64), [counts[np.asarray(langs, dtype=object) == lg].sum()]]))
            out_pk.append(np.concatenate([((u * _VOCAB_MIX) ^ lg_h) % np.uint64(nb), [lg_h % np.uint64(nb)]]))
        return pa.table(
            {
                "lang": pa.array(np.concatenate(out_lang), pa.string()),
                "tok_h": pa.array(np.concatenate(out_h).view(np.int64), pa.int64()),
                "cnt": pa.array(np.concatenate(out_cnt), pa.int64()),
                "pk": pa.array(np.concatenate(out_pk).astype(np.int32), pa.int32()),
            }
        )

    def bucket_fold(group: pa.Table) -> pa.Table:
        langs = np.asarray(group["lang"].to_pylist(), dtype=object)
        th = group["tok_h"].to_numpy()
        cnt = group["cnt"].to_numpy()
        out_lang, out_vocab, out_tokens = [], [], []
        for lg in sorted(set(langs)):
            sel = langs == lg
            vocab_rows = sel & (cnt == 0)
            out_lang.append(lg)
            out_vocab.append(len(np.unique(th[vocab_rows])))
            out_tokens.append(int(cnt[sel].sum()))
        return pa.table(
            {
                "lang": pa.array(out_lang, pa.string()),
                "vocab_p": pa.array(out_vocab, pa.int64()),
                "tokens_p": pa.array(out_tokens, pa.int64()),
            }
        )

    def lang_fold(group: pa.Table) -> pa.Table:
        langs = np.asarray(group["lang"].to_pylist(), dtype=object)
        v = group["vocab_p"].to_numpy()
        t = group["tokens_p"].to_numpy()
        out_lang = sorted(set(langs))
        return pa.table(
            {
                "lang": pa.array(out_lang, pa.string()),
                "vocab": pa.array([int(v[langs == lg].sum()) for lg in out_lang], pa.int64()),
                "n_tokens": pa.array([int(t[langs == lg].sum()) for lg in out_lang], pa.int64()),
            }
        )

    path = f"{sf_dir}/documents.parquet"
    ds = ray.data.read_parquet(path, columns=["lang", "text"], override_num_blocks=small_read_blocks(path))
    folded = ds.map_batches(explode, batch_format="pyarrow").groupby("pk").map_groups(bucket_fold, batch_format="pyarrow")
    return folded.groupby("lang").map_groups(lang_fold, batch_format="pyarrow").sort("lang")
