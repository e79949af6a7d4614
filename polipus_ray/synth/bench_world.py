"""Parallel (Ray-based) world generation for benchmark scale.

``write_world`` (world.py) is driver-side and fine to ~10^4 pages;
benchmarks need 10^5-10^6 pages with image payloads, so generation
itself runs as a Ray pipeline: range(N) -> map_batches(row builder)
-> write_parquet(partition_cols=[host_bucket]).  The derivation is
the same WorldSpec arithmetic; documents text is cycled from the
sf_dir's documents.parquet.  Deterministic (seeded per doc_id)."""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import asdict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..urltools import host_hash64
from .images import decode_image, encode_image, phash64
from .world import WorldSpec, _pixels_for, robots_bodies, seed_urls


def write_world_ray(
    out_dir: str,
    documents_path: str,
    n_pages: int,
    spec: WorldSpec = WorldSpec(num_seeds=16),
    num_buckets: int = 16,
    with_images: bool = True,
    img_side: int = 16,
) -> dict:
    import ray
    import ray.data

    texts = pq.read_table(documents_path, columns=["doc_id", "text"])
    order = np.argsort(texts["doc_id"].to_numpy())
    base_texts = texts["text"].take(pa.array(order)).to_pylist()
    texts_ref = ray.put(base_texts)
    H = spec.hosts
    n_eff = n_pages - (n_pages % H)
    spec = WorldSpec(**{**asdict(spec), "img_base": img_side})

    def build(batch: pa.Table) -> pa.Table:
        bt = ray.get(texts_ref)
        ids = batch["id"].to_numpy().astype(np.int64)
        n = len(ids)
        host_idx = ids % H
        hosts = [spec.host_name(int(j)) for j in host_idx]
        urls = [spec.url_of(int(x)) for x in ids]
        captions = [bt[int(x) % len(bt)][: spec.caption_len] for x in ids]
        code = np.full(n, 200, dtype=np.int32)
        if spec.notfound_mod:
            code[ids % spec.notfound_mod == 0] = 404
        redirect_to = [None] * n
        if spec.redirect_mod:
            is_r = (ids % spec.redirect_mod == 0) & (ids < n_eff)
            code[is_r] = 301
            for j in np.flatnonzero(is_r):
                redirect_to[j] = spec.url_of(int((ids[j] + H) % n_eff))
        links = []
        for j in range(n):
            ii = int(ids[j])
            if code[j] != 200 or n_eff == 0:
                links.append([])
                continue
            ls = [spec.url_of(t) for t in spec.link_targets(ii, n_eff)]
            if spec.cross_mod and ii % spec.cross_mod == 0:
                ls.append(spec.url_of((ii + 1) % n_eff))
            links.append(ls)
        cols = {
            "doc_id": pa.array(ids, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "host": pa.array(hosts, pa.string()),
            "host_idx": pa.array(host_idx, pa.int64()),
            "host_bucket": pa.array([host_hash64(h) % num_buckets for h in hosts], pa.int32()),
            "caption": pa.array(captions, pa.string()),
            "links": pa.array(links, pa.list_(pa.string())),
            "code": pa.array(code, pa.int32()),
            "content_type": pa.array(["text/html"] * n, pa.string()),
            "redirect_to": pa.array(redirect_to, pa.string()),
            "base_href": pa.array([None] * n, pa.string()),
        }
        if with_images:
            blobs, ws, hs, fmts, phs = [], [], [], [], []
            for ii in ids:
                ii = int(ii)
                px = _pixels_for(spec, ii)
                fmt = "jpeg" if ii % 4 == 0 else "png"
                data = encode_image(px, fmt)
                dec, w, h, _ = decode_image(data)
                blobs.append(data)
                ws.append(w)
                hs.append(h)
                fmts.append(fmt)
                phs.append(phash64(dec))
            cols.update(
                image_id=pa.array([f"img-{int(i)}" for i in ids], pa.string()),
                bytes=pa.array(blobs, pa.binary()),
                w=pa.array(ws, pa.int32()),
                h=pa.array(hs, pa.int32()),
                fmt=pa.array(fmts, pa.string()),
                phash=pa.array(np.array(phs, dtype=np.uint64).view(np.int64), pa.int64()),
            )
        return pa.table(cols)

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    web_dir = os.path.join(out_dir, "web")
    ds = ray.data.range(n_pages).map_batches(build, batch_format="pyarrow", batch_size=4096)
    ds.write_parquet(web_dir, partition_cols=["host_bucket"], compression="zstd")
    with open(os.path.join(out_dir, "robots.json"), "w") as f:
        json.dump(robots_bodies(spec), f)
    with open(os.path.join(out_dir, "seeds.json"), "w") as f:
        json.dump(seed_urls(spec), f)
    with open(os.path.join(out_dir, "spec.json"), "w") as f:
        json.dump(asdict(spec), f)
    with open(os.path.join(out_dir, "world.json"), "w") as f:
        json.dump({"num_buckets": num_buckets, "rows": n_pages}, f)
    return {"web_dir": web_dir, "rows": n_pages, "num_buckets": num_buckets}
