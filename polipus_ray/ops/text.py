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
    # task pool, not an actor pool: the heuristic's whole state is one
    # compiled regex + the module-level stopword dict, so the instance
    # ships with each task and there is no per-call pool spin-up
    # (measured: the pool cost ~0.7 s/call against a 0.11 s kernel at
    # sf0.1).  A REAL language-id model (fasttext & co) would pass the
    # CLASS + concurrency instead — per-actor model load, the
    # multimodal decode_stage pattern.
    return ds.map_batches(LangId(), batch_format="pyarrow")


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


# ---------------------------------------------------------------------------


def _word_lists(batch: pa.Table):
    """Space-split word lists + flat numpy views shared by the
    repetition/TF-IDF kernels: (list_array, flat word codes, doc_of,
    n_words per doc, dictionary strings)."""
    import pyarrow.compute as pc

    lists = pc.split_pattern(batch["text"].combine_chunks(), " ")
    flat = pc.list_flatten(lists)
    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy().astype(np.int64)
    n_words = pc.list_value_length(lists).to_numpy().astype(np.int64)
    doc_of = np.repeat(np.arange(len(n_words)), n_words)
    return lists, codes, doc_of, n_words, enc.dictionary


def repetition_stats(sf_dir: str):
    """Gopher-style word-level repetition signals, map-only and fully
    vectorized (one dictionary-encode + two lexsorts per batch; no
    Python rows): n_words, n_distinct_words, top_word_chars (chars
    covered by the most frequent word, ties broken by the
    lexicographically smallest word — the "top n-gram character
    fraction" numerator) and n_dup_2grams (2-gram occurrences beyond
    the first, the duplicate-n-gram numerator).  Integer numerators,
    so the DuckDB comparison is exact; consumers derive the Gopher
    fractions as numerator / n_words downstream."""
    import ray.data

    from polipus_ray.ops.dedup import small_read_blocks

    def stats(batch: pa.Table) -> pa.Table:
        _, codes, doc_of, n_words, dictionary = _word_lists(batch)
        d = len(n_words)
        # per-(doc, word) counts via one lexsort + run-length pass
        order = np.lexsort((codes, doc_of))
        d_s, c_s = doc_of[order], codes[order]
        new = np.ones(len(d_s), bool)
        new[1:] = (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])
        starts = np.flatnonzero(new)
        g_doc, g_code = d_s[starts], c_s[starts]
        g_cnt = np.diff(np.append(starts, len(d_s)))
        n_distinct = np.bincount(g_doc, minlength=d)
        # top word per doc: max count, tie -> lexicographically
        # smallest word.  Sort groups by (doc, -cnt, word-rank) and
        # take each doc's first row.
        words = np.asarray(dictionary.to_pylist(), dtype=object)
        wrank = np.empty(len(words), np.int64)
        wrank[np.argsort(words, kind="stable")] = np.arange(len(words))
        top_order = np.lexsort((wrank[g_code], -g_cnt, g_doc))
        first = np.ones(len(top_order), bool)
        first[1:] = g_doc[top_order][1:] != g_doc[top_order][:-1]
        top_rows = top_order[first]
        wlen = np.fromiter((len(w) for w in words), np.int64, len(words))
        top_chars = np.zeros(d, np.int64)
        top_chars[g_doc[top_rows]] = wlen[g_code[top_rows]] * g_cnt[top_rows]
        # duplicate 2-grams: per-doc (code_i, code_{i+1}) pairs; a pair
        # code fits int64 because both halves are < |dictionary|
        V = np.int64(len(words))
        same_doc = np.flatnonzero(doc_of[1:] == doc_of[:-1])
        bg = codes[same_doc] * V + codes[same_doc + 1]
        bg_doc = doc_of[same_doc]
        order2 = np.lexsort((bg, bg_doc))
        db, gb = bg_doc[order2], bg[order2]
        new2 = np.ones(len(db), bool)
        new2[1:] = (db[1:] != db[:-1]) | (gb[1:] != gb[:-1])
        n_2g = np.bincount(bg_doc, minlength=d)
        n_2g_distinct = np.bincount(db[new2], minlength=d)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(n_words, pa.int64()),
                "n_distinct_words": pa.array(n_distinct, pa.int64()),
                "top_word_chars": pa.array(top_chars, pa.int64()),
                "n_dup_2grams": pa.array(n_2g - n_2g_distinct, pa.int64()),
            }
        )

    path = f"{sf_dir}/documents.parquet"
    ds = ray.data.read_parquet(path, columns=["doc_id", "text"], override_num_blocks=small_read_blocks(path))
    return ds.map_batches(stats, batch_format="pyarrow")


def chunk_tokens(sf_dir: str, window: int = 32, stride: int = 24):
    """Training-data chunking: split each document into ``window``-word
    chunks every ``stride`` words (overlapping when stride < window) —
    the flat_map-style expansion every tokenize-and-pack pipeline runs
    before sequence assembly.  Map-only; the per-batch kernel loops
    over CHUNK SLOTS (bounded by the longest doc), not rows — each
    slot is one vectorized ``list_slice`` + ``binary_join`` over the
    whole batch.  Output: doc_id, chunk_id, n_tokens, chunk_text."""
    import pyarrow.compute as pc
    import ray.data

    from polipus_ray.ops.dedup import small_read_blocks

    def chunks(batch: pa.Table) -> pa.Table:
        lists = pc.split_pattern(batch["text"].combine_chunks(), " ")
        n_words = pc.list_value_length(lists).to_numpy().astype(np.int64)
        ids = batch["doc_id"].to_numpy()
        out: list[pa.Table] = []
        j = 0
        while True:
            start = stride * j
            live = np.flatnonzero(n_words > start)
            if len(live) == 0:
                break
            sub_lists = lists.take(pa.array(live))
            sliced = pc.list_slice(sub_lists, start, start + window)
            out.append(
                pa.table(
                    {
                        "doc_id": pa.array(ids[live], pa.int64()),
                        "chunk_id": pa.array(np.full(len(live), j, np.int64), pa.int64()),
                        "n_tokens": pc.cast(pc.list_value_length(sliced), pa.int64()),
                        "chunk_text": pc.binary_join(sliced, " "),
                    }
                )
            )
            j += 1
        return pa.concat_tables(out) if out else pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "chunk_id": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.string()),
            }
        )

    path = f"{sf_dir}/documents.parquet"
    ds = ray.data.read_parquet(path, columns=["doc_id", "text"], override_num_blocks=small_read_blocks(path))
    return ds.map_batches(chunks, batch_format="pyarrow")


def tfidf_topk(sf_dir: str, terms: tuple[str, ...] = ("hash", "merge", "window", "table"), k: int = 10):
    """Inverted-index-style retrieval: for each query term, the top-k
    documents by an integer-scaled TF-IDF score.

    Two passes over the corpus, both map-side-partial: (1) per-batch
    document frequencies for the |terms| query terms -> one tiny
    driver fold (bounded by |terms|, never the corpus); (2) per-batch
    tf x idf_int scoring + partial top-k -> one single-group merge.
    idf_int = (N * 1_000_000) // df  (integer floor division — the
    same expression in DuckDB, so scores are engine-exact; a float
    ln-idf would hash-drift).  Output: term, doc_id, score_int, rank.
    """
    import ray.data

    from polipus_ray.ops.dedup import small_read_blocks

    term_arr = np.asarray(sorted(terms), dtype=object)

    def read():
        path = f"{sf_dir}/documents.parquet"
        return ray.data.read_parquet(path, columns=["doc_id", "text"], override_num_blocks=small_read_blocks(path))

    def tf_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        """(docs,) ids and (docs, |terms|) tf counts, vectorized."""
        _, codes, doc_of, n_words, dictionary = _word_lists(batch)
        words = np.asarray(dictionary.to_pylist(), dtype=object)
        tf = np.zeros((len(n_words), len(term_arr)), np.int64)
        for ti, term in enumerate(term_arr):
            hit = np.flatnonzero(words == term)
            if len(hit):
                tf[:, ti] = np.bincount(doc_of[codes == hit[0]], minlength=len(n_words))
        return batch["doc_id"].to_numpy(), tf

    def df_partial(batch: pa.Table) -> pa.Table:
        _, tf = tf_matrix(batch)
        return pa.table(
            {
                "ti": pa.array(np.arange(len(term_arr)), pa.int64()),
                "df_p": pa.array((tf > 0).sum(axis=0).astype(np.int64), pa.int64()),
                "n_p": pa.array(np.full(len(term_arr), tf.shape[0], np.int64), pa.int64()),
            }
        )

    # pass 1: df per term (driver folds |terms| rows — bounded)
    dfp = read().map_batches(df_partial, batch_format="pyarrow").to_pandas()
    df_tot = dfp.groupby("ti")["df_p"].sum().to_numpy()
    n_docs = int(dfp.groupby("ti")["n_p"].sum().iloc[0])
    idf_int = np.where(df_tot > 0, (n_docs * 1_000_000) // np.maximum(df_tot, 1), 0).astype(np.int64)

    def score_topk(batch: pa.Table) -> pa.Table:
        ids, tf = tf_matrix(batch)
        score = tf * idf_int[None, :]
        out_t, out_d, out_s = [], [], []
        for ti in range(len(term_arr)):
            nz = np.flatnonzero(score[:, ti] > 0)
            order = nz[np.lexsort((ids[nz], -score[nz, ti]))[:k]]
            out_t.append(np.full(len(order), term_arr[ti], dtype=object))
            out_d.append(ids[order])
            out_s.append(score[order, ti])
        return pa.table(
            {
                "term": pa.array(np.concatenate(out_t) if out_t else [], pa.string()),
                "doc_id": pa.array(np.concatenate(out_d) if out_d else [], pa.int64()),
                "score_int": pa.array(np.concatenate(out_s) if out_s else [], pa.int64()),
                "pk": pa.array(np.zeros(sum(len(x) for x in out_t), np.int32), pa.int32()),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        terms_g = np.asarray(group["term"].to_pylist(), dtype=object)
        ids = group["doc_id"].to_numpy()
        sc = group["score_int"].to_numpy()
        out_t, out_d, out_s, out_r = [], [], [], []
        for term in sorted(set(terms_g)):
            sel = np.flatnonzero(terms_g == term)
            order = sel[np.lexsort((ids[sel], -sc[sel]))[:k]]
            out_t.append(np.full(len(order), term, dtype=object))
            out_d.append(ids[order])
            out_s.append(sc[order])
            out_r.append(np.arange(1, len(order) + 1, dtype=np.int64))
        return pa.table(
            {
                "term": pa.array(np.concatenate(out_t), pa.string()),
                "doc_id": pa.array(np.concatenate(out_d), pa.int64()),
                "score_int": pa.array(np.concatenate(out_s), pa.int64()),
                "rank": pa.array(np.concatenate(out_r), pa.int64()),
            }
        )

    parts = read().map_batches(score_topk, batch_format="pyarrow")
    return parts.groupby("pk").map_groups(merge, batch_format="pyarrow").sort(["term", "rank"])
