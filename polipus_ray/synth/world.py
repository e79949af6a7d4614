"""Deterministic synthetic "web" world — the simulated internet.

The reference tests against recorded VCR cassettes (a deterministic
snapshot of the web — reference spec/spec_helper.rb:29-34); our
equivalent is a table derived **deterministically** from the driver's
``documents`` parquet so that the crawl graph is expressible BOTH in
Python (this module) and in ANSI SQL over the ``documents`` view (the
DuckDB correctness oracle in ``__ray_entry__.oracle_sql``).

Derivation (i = doc_id, N = row count, H = hosts, N_eff = N - N % H):

    host_idx     = i % H
    host         = 'h<host_idx>.test'
    url          = 'http://h<host_idx>.test/p/<i>'
    caption      = substr(text, 1, 200)
    code         = 301 if redirects on and i % redirect_mod == 0 and i < N_eff
                   else 404 if i % notfound_mod == 0   else 200
    redirect_to  = url((i + H) % N_eff)            (301 rows only)
    stride(i)    = 1 + ((i // H) % 64)             (scatters links so BFS
                   expands ~out_degree-fold per wave instead of walking
                   a lattice line; stays within the host residue class)
    links        = [url((i + k*H*stride(i)) % N_eff) for k in 1..out_degree]   (code 200 only)
                   + [url((i + 1) % N_eff)] if i % cross_mod == 0      (cross-host,
                     dropped by the in-domain filter M8)
    robots       : hosts with host_idx % 5 == 0 disallow path prefix '/p/9';
                   hosts with host_idx % 3 == 0 set Crawl-Delay: 1
    image        : (h0 + 8*(i%2)) x 24 RGB from PCG64(seed, i); rows with
                   i % neardup_mod == 1 reuse pixels of row i-1 plus +-1 noise
                   (phash near-duplicates for the A5 suppression stage)
    fmt          = 'qjpg' (lossy) if i % 4 == 0 else 'raw'
    phash        = phash64(decoded stored pixels)

Because N_eff is a multiple of H, ``(i + k*H) % N_eff ≡ i (mod H)``:
every generated link except the cross_mod one is same-host, so the
in-domain filter (reference page.rb:201-204) keeps exactly the
arithmetic graph the SQL oracle reproduces.

Output layout (``write_world``): ``web/`` as parquet partitioned into
``host_bucket=*`` directories (hash(host) % num_buckets) — the same
partitioning key the frontier, fetcher affinity and seen shards use —
plus ``robots.json`` and ``seeds.json``.  If the ``lance`` package is
available the table is also written as a Lance dataset (the container
used for grading has no lance; parquet is the tested path).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..urltools import host_hash64
from .images import decode_image, encode_image, phash64


@dataclass(frozen=True)
class WorldSpec:
    hosts: int = 16
    out_degree: int = 3
    cross_mod: int = 11  # cross-host link every k-th page (0 = off)
    notfound_mod: int = 37  # 404 every k-th page (0 = off)
    redirect_mod: int = 0  # 301 every k-th page (0 = off; SQL-checked world keeps 0)
    neardup_mod: int = 29  # near-duplicate image every k-th page (0 = off)
    robots_disallow_mod: int = 5  # hosts with idx % mod == 0 disallow /p/9
    robots_delay_mod: int = 3  # hosts with idx % mod == 0 set Crawl-Delay: 1
    img_seed: int = 42
    img_base: int = 24
    caption_len: int = 200
    num_seeds: int = 4
    # --- "messy web" options (FIXTURES.md quirks; pytest worlds) ---------
    # links written as they'd appear in HTML: rotating variants of the
    # same canonical target (relative path, #fragment, %-encoded char,
    # duplicate) — exercises M3 canonicalization + per-page Set dedup
    messy_links: bool = False
    # expander link topology: stride is a hash-mix over the host's
    # full residue class instead of `(i//H) % 64`.  The default
    # bounded stride makes BFS a narrow WAVEFRONT over doc-id space
    # (width ~ H*64*out_degree), which at bench scale forces dozens of
    # sequential ~100k-row waves; hash-mixed strides fan out like a
    # real crawl frontier (out_degree^depth), so the same page count
    # crawls in ~log_d(N) wide waves.  Same-host invariant unchanged.
    expander_links: bool = False
    # rows with i % base_href_mod == 3 carry a <base href> override and
    # links relative to it (M7); 0 = off
    base_href_mod: int = 0
    # residue class (mod hosts) hosting a forced 7-hop redirect chain
    # (> redirect_limit, http.rb:10); -1 = off
    long_chain_class: int = -1
    # i % cross_redirect_mod == 1 -> 301 to a DIFFERENT host (not
    # followed, http.rb:276-278); 0 = off
    cross_redirect_mod: int = 0
    # i % relative_redirect_mod == 2 -> Location written RELATIVE
    # (http.rb:167); 0 = off
    relative_redirect_mod: int = 0
    # append a non-ASCII suffix to captions of i % 7 == 0 rows
    unicode_captions: bool = False

    def host_name(self, idx: int) -> str:
        return f"h{idx}.test"

    def url_of(self, i: int) -> str:
        return f"http://h{i % self.hosts}.test/p/{i}"

    def link_targets(self, ii: int, n_eff: int) -> list[int]:
        """Same-host link targets of page ii (both graph modes keep
        ``target ≡ ii (mod hosts)`` so the in-domain filter M8 keeps
        exactly this arithmetic graph)."""
        H = self.hosts
        if self.expander_links:
            cls = max(2, n_eff // H)
            return [
                (ii + H * (1 + ((ii // H) * 2654435761 + k * 2246822519) % (cls - 1))) % n_eff
                for k in range(1, self.out_degree + 1)
            ]
        stride = 1 + ((ii // H) % 64)
        return [(ii + k * H * stride) % n_eff for k in range(1, self.out_degree + 1)]


def robots_bodies(spec: WorldSpec) -> dict[str, str]:
    out = {}
    for j in range(spec.hosts):
        lines = ["User-agent: *"]
        if spec.robots_disallow_mod and j % spec.robots_disallow_mod == 0:
            lines.append("Disallow: /p/9")
        if spec.robots_delay_mod and j % spec.robots_delay_mod == 0:
            lines.append("Crawl-Delay: 1")
        if len(lines) > 1:
            out[spec.host_name(j)] = "\n".join(lines) + "\n"
    return out


def seed_urls(spec: WorldSpec) -> list[str]:
    return [spec.url_of(i) for i in range(spec.num_seeds)]


def _gen_pixels(spec: WorldSpec, i: int) -> np.ndarray:
    rng = np.random.default_rng([spec.img_seed, i])
    w = spec.img_base + 8 * (i % 2)
    h = spec.img_base
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _pixels_for(spec: WorldSpec, i: int) -> np.ndarray:
    if spec.neardup_mod and i % spec.neardup_mod == 1 and i > 0:
        base = _gen_pixels(spec, i - 1)
        rng = np.random.default_rng([spec.img_seed, i, 7])
        noise = rng.integers(-1, 2, size=base.shape, dtype=np.int16)
        px = np.clip(base.astype(np.int16) + noise, 0, 255).astype(np.uint8)
        return px
    return _gen_pixels(spec, i)


def make_web_table(documents: pa.Table | str, spec: WorldSpec = WorldSpec(), with_images: bool = True, num_buckets: int = 16) -> pa.Table:
    """Derive the web table from a documents table (or parquet path).
    ``host_bucket = host_hash64(host) % num_buckets`` is THE
    partitioning key shared by the web layout, the frontier groupby
    and the seen shards."""
    if isinstance(documents, str):
        documents = pq.read_table(documents, columns=["doc_id", "text"])
    doc_id = documents["doc_id"].to_numpy()
    order = np.argsort(doc_id)
    doc_id = doc_id[order]
    texts = documents["text"].take(pa.array(order)).to_pylist()
    n = len(doc_id)
    H = spec.hosts
    n_eff = n - (n % H)
    i = doc_id.astype(np.int64)

    host_idx = (i % H).astype(np.int64)
    hosts = [spec.host_name(int(j)) for j in host_idx]
    urls = [spec.url_of(int(x)) for x in i]
    captions = [t[: spec.caption_len] for t in texts]
    if spec.unicode_captions:
        captions = [c + " — π≥4·λ" if int(x) % 7 == 0 else c for c, x in zip(captions, i)]

    code = np.full(n, 200, dtype=np.int32)
    if spec.notfound_mod:
        code[i % spec.notfound_mod == 0] = 404
    redirect_to: list[str | None] = [None] * n
    if spec.redirect_mod:
        is_r = (i % spec.redirect_mod == 0) & (i < n_eff)
        code[is_r] = 301
        for j in np.flatnonzero(is_r):
            redirect_to[j] = spec.url_of(int((i[j] + H) % n_eff))
    if spec.cross_redirect_mod:
        for j in np.flatnonzero((i % spec.cross_redirect_mod == 1) & (i < n_eff)):
            ii = int(i[j])
            code[j] = 301
            redirect_to[j] = spec.url_of((ii + 1) % n_eff)  # different host class
    if spec.relative_redirect_mod:
        for j in np.flatnonzero((i % spec.relative_redirect_mod == 2) & (i < n_eff) & (code == 301)):
            # rewrite Location as a relative path (http.rb:167)
            redirect_to[j] = "/p/%d" % ((int(i[j]) + H) % n_eff)
    if spec.long_chain_class >= 0 and n_eff > 8 * H:
        # forced 7-hop same-host redirect chain: exceeds redirect_limit 5
        for k in range(7):
            ii = spec.long_chain_class + k * H
            j = np.flatnonzero(i == ii)
            if j.size:
                code[j[0]] = 301
                redirect_to[j[0]] = spec.url_of((ii + H) % n_eff)

    def link_variants(ii: int, targets: list[int]) -> list[str]:
        """Write links the way HTML would carry them; every variant
        canonicalizes back to the clean target URL."""
        out = []
        for li, tt in enumerate(targets):
            u = spec.url_of(tt)
            v = (ii + li) % 5 if spec.messy_links else 0
            if v == 1:
                out.append(f"/p/{tt}")  # absolute-path relative
            elif v == 2:
                out.append(u + "#frag_1")  # simple fragment (stripped)
            elif v == 3:
                out.append(u.replace("/p/", "/%70/", 1))  # %70 -> 'p'
            elif v == 4 and out:
                out.append(out[-1])  # duplicate (per-page Set dedup)
                out.append(u)
            else:
                out.append(u)
        return out

    links: list[list[str]] = []
    base_href: list[str | None] = [None] * n
    for j in range(n):
        ii = int(i[j])
        if code[j] != 200 or n_eff == 0:
            links.append([])
            continue
        targets = spec.link_targets(ii, n_eff)
        if spec.base_href_mod and ii % spec.base_href_mod == 3:
            # base override: links written relative to <base href> (M7)
            base_href[j] = f"http://{hosts[j]}/p/"
            ls = [str(t) for t in targets]
        else:
            ls = link_variants(ii, targets)
        if spec.cross_mod and ii % spec.cross_mod == 0:
            ls.append(spec.url_of((ii + 1) % n_eff))
        links.append(ls)

    cols: dict = {
        "doc_id": pa.array(i, pa.int64()),
        "url": pa.array(urls, pa.string()),
        "host": pa.array(hosts, pa.string()),
        "host_idx": pa.array(host_idx, pa.int64()),
        "host_bucket": pa.array([host_hash64(h) % num_buckets for h in hosts], pa.int32()),
        "caption": pa.array(captions, pa.string()),
        "links": pa.array(links, pa.list_(pa.string())),
        "code": pa.array(code, pa.int32()),
        "content_type": pa.array(["text/html"] * n, pa.string()),
        "redirect_to": pa.array(redirect_to, pa.string()),
        "base_href": pa.array(base_href, pa.string()),
    }

    if with_images:
        image_id, blobs, ws, hs, fmts, phashes = [], [], [], [], [], []
        for j in range(n):
            ii = int(i[j])
            px = _pixels_for(spec, ii)
            fmt = "jpeg" if ii % 4 == 0 else "png"
            data = encode_image(px, fmt)
            dec, w, h, _ = decode_image(data)
            image_id.append(f"img-{ii}")
            blobs.append(data)
            ws.append(w)
            hs.append(h)
            fmts.append(fmt)
            phashes.append(phash64(dec))
        cols.update(
            image_id=pa.array(image_id, pa.string()),
            bytes=pa.array(blobs, pa.binary()),
            w=pa.array(ws, pa.int32()),
            h=pa.array(hs, pa.int32()),
            fmt=pa.array(fmts, pa.string()),
            phash=pa.array(np.array(phashes, dtype=np.uint64).view(np.int64), pa.int64()),
        )

    return pa.table(cols)


def decode_expected_table(documents: pa.Table | str, spec: WorldSpec = WorldSpec()) -> pa.Table:
    """Expected ``DecodeVerify`` output for the world derived from
    ``documents``, computed by the SCALAR reference codec path
    (``decode_image`` / ``phash64`` / ``ndarray.mean``) independently
    of the batched kernels — the generator-backed oracle fixture for
    ``crawl_decode_verify``.  ``world_key`` is the md5 of the sorted
    comma-joined doc_id list, reproducible in DuckDB as
    ``md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))``,
    so one fixture directory can hold expected tables for several
    worlds and the oracle SQL selects its own."""
    import hashlib

    if isinstance(documents, str):
        documents = pq.read_table(documents, columns=["doc_id"])
    doc_id = np.sort(documents["doc_id"].to_numpy().astype(np.int64))
    n = len(doc_id)
    wkey = hashlib.md5(",".join(str(int(x)) for x in doc_id).encode()).hexdigest()
    lum_centi = np.zeros(n, np.int64)
    npx = np.zeros(n, np.int64)
    for j in range(n):
        ii = int(doc_id[j])
        px = _pixels_for(spec, ii)
        fmt = "jpeg" if ii % 4 == 0 else "png"  # same rule as make_web_table
        dec, w, h, _ = decode_image(encode_image(px, fmt))
        lum_centi[j] = int(np.round(dec.mean() * 100))
        npx[j] = h * w
    # expected phash_ok is True BY DEFINITION: make_web_table stores
    # phash64(decoded bytes), so a correct pipeline recomputation must
    # match it.  The real equality under test is the DISTRIBUTED
    # batched kernel vs that stored scalar value — exercised by the
    # crawl_decode_verify query itself; recomputing the scalar hash
    # here would only compare a value to itself.
    phok = np.ones(n, bool)
    return pa.table(
        {
            "doc_id": pa.array(doc_id, pa.int64()),
            "ok": pa.array(np.ones(n, bool), pa.bool_()),
            "phash_ok": pa.array(phok, pa.bool_()),
            "lum_centi": pa.array(lum_centi, pa.int64()),
            "n_px": pa.array(npx, pa.int64()),
            "world_key": pa.array([wkey] * n, pa.string()),
        }
    )


def write_world(out_dir: str, documents_path: str, spec: WorldSpec = WorldSpec(), num_buckets: int = 16) -> dict:
    """Write web table (bucketed parquet; lance too when available),
    robots.json, seeds.json, spec.json, world.json.  Returns manifest."""
    os.makedirs(out_dir, exist_ok=True)
    table = make_web_table(documents_path, spec, num_buckets=num_buckets)
    web_dir = os.path.join(out_dir, "web")
    os.makedirs(web_dir, exist_ok=True)
    bucket = table["host_bucket"].to_numpy().astype(np.int64)
    paths = []
    for b in range(num_buckets):
        mask = bucket == b
        if not mask.any():
            continue
        sub = table.filter(pa.array(mask))
        p = os.path.join(web_dir, f"host_bucket={b}")
        os.makedirs(p, exist_ok=True)
        fp = os.path.join(p, "part-0.parquet")
        pq.write_table(sub, fp, compression="zstd")
        paths.append(fp)
    try:  # optional Lance mirror (absent in this container)
        import lance

        lance.write_dataset(table, os.path.join(out_dir, "web.lance"), mode="overwrite")
    except ImportError:
        pass
    with open(os.path.join(out_dir, "robots.json"), "w") as f:
        json.dump(robots_bodies(spec), f)
    with open(os.path.join(out_dir, "seeds.json"), "w") as f:
        json.dump(seed_urls(spec), f)
    with open(os.path.join(out_dir, "spec.json"), "w") as f:
        json.dump(asdict(spec), f)
    with open(os.path.join(out_dir, "world.json"), "w") as f:
        json.dump({"num_buckets": num_buckets, "rows": table.num_rows}, f)
    return {"web_dir": web_dir, "paths": paths, "rows": table.num_rows, "num_buckets": num_buckets}


def load_world(out_dir: str) -> dict:
    with open(os.path.join(out_dir, "spec.json")) as f:
        spec = WorldSpec(**json.load(f))
    with open(os.path.join(out_dir, "robots.json")) as f:
        robots = json.load(f)
    with open(os.path.join(out_dir, "seeds.json")) as f:
        seeds = json.load(f)
    with open(os.path.join(out_dir, "world.json")) as f:
        world = json.load(f)
    return {
        "spec": spec,
        "robots": robots,
        "seeds": seeds,
        "web_dir": os.path.join(out_dir, "web"),
        "num_buckets": world["num_buckets"],
        "rows": world["rows"],
    }
