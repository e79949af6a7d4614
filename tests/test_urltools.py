"""URL canonicalization / uuid quirks — byte-parity with the reference
(see docstrings in polipus_ray/urltools.py for file:line citations)."""

from polipus_ray.urltools import (
    canonicalize,
    hash64,
    host_of,
    page_uuid,
    path_of,
    strip_query,
    url_hash64,
)


def test_golden_uuid():
    # reference spec/polipus/storage/memory_store_spec.rb:11
    assert page_uuid("http://www.google.com") == "ed646a3334ca891fd3467db131372140"


def test_uuid_query_strip():
    a = page_uuid("http://x.test/p?a=1", include_query_string=False)
    b = page_uuid("http://x.test/p", include_query_string=False)
    c = page_uuid("http://x.test/p?a=1", include_query_string=True)
    assert a == b != c


def test_fragment_strip_simple_only():
    # regex is #[a-zA-Z0-9_-]*$ — only a simple trailing fragment
    assert canonicalize("http://a.test/x#frag") == "http://a.test/x"
    assert canonicalize("http://a.test/x#") == "http://a.test/x"
    # a fragment containing '/' does NOT match the reference regex;
    # '#' itself is then percent-encoded by the URI.encode round-trip
    assert canonicalize("http://a.test/x#f/g") == "http://a.test/x%23f/g"


def test_percent_roundtrip():
    assert canonicalize("http://a.test/a%20b") == "http://a.test/a%20b"
    assert canonicalize("http://a.test/a b") == "http://a.test/a%20b"
    # literal '%' not followed by hex: unquote leaves it, encode escapes it
    assert canonicalize("http://a.test/100%x") == "http://a.test/100%25x"


def test_relative_resolution_and_empty_path():
    base = "http://a.test/dir/page"
    assert canonicalize("other", base) == "http://a.test/dir/other"
    assert canonicalize("/root", base) == "http://a.test/root"
    assert canonicalize("http://b.test", base) == "http://b.test/"
    assert canonicalize("http://b.test?q=1", base) == "http://b.test/?q=1"


def test_helpers():
    assert strip_query("http://a.test/p?x=1&y=2") == "http://a.test/p"
    assert host_of("http://User@A.Test:8080/p") == "a.test"
    assert path_of("http://a.test") == "/"
    assert path_of("http://a.test/p?x=1") == "/p?x=1"


def test_hash64_stability():
    h = hash64("http://a.test/")
    assert h == hash64("http://a.test/")
    assert 0 <= h < 2**64
    assert url_hash64("http://a.test/p?x=1", include_query_string=False) == url_hash64("http://a.test/p")


def test_fast_path_matches_slow_path():
    # the _FAST_RE fast path must be byte-identical to the full
    # canonicalization for every string it accepts
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from polipus_ray.urltools import _FAST_RE, _canonicalize_slow, canonicalize

    path_chars = "ABCdef019._~!$&'()*+,;=:@/-"

    @settings(max_examples=300, deadline=None)
    @given(
        st.sampled_from(["http", "https"]),
        st.text(alphabet="abc019.-", min_size=1, max_size=12),
        st.text(alphabet=path_chars, max_size=20),
        st.one_of(st.none(), st.text(alphabet=path_chars, max_size=10)),
    )
    def check(scheme, host, path, query):
        u = f"{scheme}://{host}/{path}" + (f"?{query}" if query is not None else "")
        if _FAST_RE.match(u):
            assert canonicalize(u, "http://base.test/x") == _canonicalize_slow(u, "http://base.test/x"), u

    check()


def test_fast_path_rejects_tricky():
    from polipus_ray.urltools import _FAST_RE

    for u in ["http://a.test/x#frag", "http://a.test/a%20b", "http://a.test", "relative/x", "http://a.test/a b"]:
        assert not _FAST_RE.match(u), u
