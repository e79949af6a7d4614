"""Fixed Arrow schemas for the engine's tables (the reference's
schemas are implicit/dynamic JSON — see SURVEY.md §1.2; here they are
pinned so every map_batches stage is zero-copy Arrow in/out)."""

import pyarrow as pa

# frontier entry = the reference wire message {url, referer, depth, user_data}
# plus precomputed routing keys and the wave-loop bookkeeping columns.
FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),  # canonical URL
        ("host", pa.string()),
        ("url_hash", pa.uint64()),
        ("host_hash", pa.uint64()),
        ("referer", pa.string()),
        ("depth", pa.int32()),
        ("seeded", pa.bool_()),  # p_seeded flag (bypasses storage dedup)
        ("seq", pa.int64()),  # global FIFO order (crawl-order oracle)
        ("priority", pa.int64()),  # per-host priority (O7); lower = sooner
        ("attempt", pa.int32()),  # error-retry count (bounded re-enqueue)
        ("user_data", pa.string()),  # JSON map (reference OpenStruct)
    ]
)

# stored page = reference Page#to_hash + image payload columns
PAGES_SCHEMA = pa.schema(
    [
        ("uuid", pa.string()),  # MD5(canonical url) — storage key
        ("url", pa.string()),
        ("aliases", pa.list_(pa.string())),  # redirect-chain URLs (M17)
        ("referer", pa.string()),
        ("depth", pa.int32()),
        ("code", pa.int32()),
        ("bytes", pa.large_binary()),  # image payload (Page#body analogue)
        ("caption", pa.string()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("phash", pa.int64()),
        ("links", pa.list_(pa.string())),
        ("content_type", pa.string()),
        ("response_time", pa.int64()),
        ("fetched_at", pa.int64()),
        ("error", pa.string()),
        ("user_data", pa.string()),
        ("seq", pa.int64()),  # crawl order
        ("round", pa.int32()),  # wave that fetched it (checkpoint lineage)
        ("host_bucket", pa.int32()),  # output partitioning key
    ]
)

WEB_SCHEMA_COLUMNS = [
    "doc_id",
    "url",
    "host",
    "host_idx",
    "host_bucket",
    "caption",
    "links",
    "code",
    "content_type",
    "redirect_to",
    "image_id",
    "bytes",
    "w",
    "h",
    "fmt",
    "phash",
]
