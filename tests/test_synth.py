"""World generator determinism + image codec invariants.

The per-row invariant from the spec: decoded-pixel PSNR >= 40 dB for
lossy formats / exact bytes for lossless, plus exact caption equality."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from polipus_ray.synth.images import decode_image, encode_image, hamming64, phash64, psnr
from polipus_ray.synth.world import WorldSpec, make_web_table, robots_bodies, seed_urls

SF = "/root/testdata/sf0.001"


def test_codec_roundtrip_lossless():
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
    dec, w, h, fmt = decode_image(encode_image(px, "png"))
    assert (dec == px).all() and (w, h, fmt) == (32, 24, "png")


def test_codec_lossy_psnr_over_40db():
    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
    dec, _, _, fmt = decode_image(encode_image(px, "jpeg"))
    assert fmt == "jpeg"
    p = psnr(px, dec)
    assert p >= 40.0, p


def test_unsupported_format_raises():
    with pytest.raises(NotImplementedError):
        encode_image(np.zeros((4, 4, 3), np.uint8), "webp")


def test_phash_neardup_and_distinct():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
    noise = rng.integers(-1, 2, size=a.shape).astype(np.int16)
    b = np.clip(a.astype(np.int16) + noise, 0, 255).astype(np.uint8)
    c = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
    assert hamming64(phash64(a), phash64(b)) <= 4
    assert hamming64(phash64(a), phash64(c)) > 10


def test_world_determinism_and_graph_rules():
    spec = WorldSpec()
    t1 = make_web_table(f"{SF}/documents.parquet", spec)
    t2 = make_web_table(f"{SF}/documents.parquet", spec)
    assert t1.equals(t2)
    n = t1.num_rows
    H = spec.hosts
    n_eff = n - n % H
    df = t1.to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas().sort_values("doc_id")
    # caption equality invariant
    assert (df["caption"].values == docs["text"].str[:200].values).all()
    # graph arithmetic
    row = df[df.doc_id == 5].iloc[0]
    assert row.url == "http://h5.test/p/5"
    assert row.code == 200
    stride = 1 + ((5 // H) % 64)
    assert list(row.links) == [f"http://h{5 % H}.test/p/{(5 + k * H * stride) % n_eff}" for k in (1, 2, 3)]
    # 404s have no links
    assert df[df.doc_id % 37 == 0].links.map(len).eq(0).all()
    # cross-host extra link on cross_mod rows (code 200 only)
    r22 = df[df.doc_id == 22].iloc[0]  # 22 % 11 == 0, 22 % 37 != 0
    assert len(r22.links) == 4 and r22.links[-1] == f"http://h{23 % H}.test/p/23"
    # same-host property of the first out_degree links
    for _, r in df[df.code == 200].head(50).iterrows():
        for l in list(r.links)[: spec.out_degree]:
            assert f"//h{int(r.doc_id) % H}.test/" in l


def test_world_images_verify():
    spec = WorldSpec()
    t = make_web_table(f"{SF}/documents.parquet", spec)
    df = t.to_pandas().head(60)
    for _, r in df.iterrows():
        dec, w, h, fmt = decode_image(r["bytes"])
        assert (w, h, fmt) == (r["w"], r["h"], r["fmt"])
        assert phash64(dec) == np.uint64(np.int64(r["phash"])).item()
    # near-dup rows are phash-close to their base row
    ph = {int(r.doc_id): np.uint64(np.int64(r.phash)).item() for _, r in t.to_pandas().iterrows()}
    nd = [i for i in ph if i % spec.neardup_mod == 1 and i > 0]
    assert nd, "expected some near-dup rows"
    close = sum(hamming64(ph[i], ph[i - 1]) <= 6 for i in nd)
    assert close >= len(nd) * 0.9


def test_robots_and_seeds():
    spec = WorldSpec()
    rb = robots_bodies(spec)
    assert "h0.test" in rb and "Disallow: /p/9" in rb["h0.test"]
    assert "Crawl-Delay: 1" in rb["h0.test"]  # 0 % 3 == 0 too
    assert "h5.test" in rb and "Disallow" in rb["h5.test"] and "Crawl-Delay" not in rb["h5.test"]
    assert "h1.test" not in rb
    assert seed_urls(spec) == [f"http://h{i}.test/p/{i}" for i in range(4)]
