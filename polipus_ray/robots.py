"""robots.txt parsing + matching, replicating the reference's Robotex
behavior exactly (reference lib/polipus/robotex.rb, itself vendored
from chriskite/robotex — public code; behavior re-derived, not copied).

Faithfully-kept quirks (these change the allowed set, so they matter
for URL-seen-set equality with the reference):

- ``allowed?`` checks Allow rules only while ``allowed`` is already
  false — but ``allowed`` starts true and Disallow rules are evaluated
  *after* the Allow block (robotex.rb:58-74).  Net effect: **Allow
  rules are dead code**; a URL is allowed iff no Disallow rule of a
  matching user-agent matches its request-uri.  We reproduce that.
- patterns are escaped then ``*`` -> ``.*``, anchored with ``^``
  (robotex.rb:88-92); matched against ``request_uri`` (path + query).
- user-agent lines become the *current agent regex* for subsequent
  rules; default agent regex matches anything (``/.*/``).
- a robots fetch that is not HTTP 200 text/plain is treated as
  allow-all (robotex.rb:17-20).
- ``Crawl-Delay`` is ``value.to_i`` per agent regex; ``delay`` returns
  the first matching agent's delay (robotex.rb:79-84).

In this engine there is no network: robots bodies live in a small
side-table of the synthetic world (host -> robots.txt text), broadcast
to the URL-filter stage via ``ray.put`` and parsed once per actor.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .urltools import path_of


def _to_regex(pattern: str) -> re.Pattern:
    # Regexp.escape then '*' -> '.*', anchored at start (robotex.rb:88-92)
    return re.compile("^" + re.escape(pattern).replace(re.escape("*"), ".*"))


@dataclass
class ParsedRobots:
    """Parsed rules of one host's robots.txt."""

    disallows: list[tuple[re.Pattern, list[re.Pattern]]] = field(default_factory=list)
    allows: list[tuple[re.Pattern, list[re.Pattern]]] = field(default_factory=list)
    delays: list[tuple[re.Pattern, int]] = field(default_factory=list)
    parsed: bool = True

    @classmethod
    def parse(cls, body: str | None) -> "ParsedRobots":
        # missing / non-200 / non-text-plain robots => allow-all
        if body is None:
            body = "User-agent: *\nAllow: /\n"
        pr = cls()
        agent = re.compile(".*")
        dis: dict[int, tuple[re.Pattern, list[re.Pattern]]] = {}
        alw: dict[int, tuple[re.Pattern, list[re.Pattern]]] = {}
        for line in body.splitlines():
            if re.match(r"^\s*(#.*|$)", line):
                continue
            key, _, value = line.partition(":")
            value = value.strip()
            key = key.strip().lower()
            if key == "user-agent":
                agent = _to_regex(value)
            elif key == "allow" and value:
                alw.setdefault(id(agent), (agent, []))[1].append(_to_regex(value))
            elif key == "disallow" and value:
                dis.setdefault(id(agent), (agent, []))[1].append(_to_regex(value))
            elif key == "crawl-delay":
                try:
                    pr.delays.append((agent, int(float(value))))
                except ValueError:
                    pr.delays.append((agent, 0))
        pr.disallows = list(dis.values())
        pr.allows = list(alw.values())
        return pr

    def allowed(self, url: str, user_agent: str) -> bool:
        """True iff no matching-agent Disallow rule matches the
        request-uri.  (Allow rules intentionally never consulted —
        see module docstring.)"""
        if not self.parsed:
            return True
        path = path_of(url)
        ok = True
        # Allow block of the reference runs here but only `unless allowed`,
        # and `allowed` is still true -> no-op. Kept as a comment for parity.
        for agent_re, rules in self.disallows:
            if agent_re.search(user_agent):
                for rule in rules:
                    if rule.search(path):
                        ok = False
        return ok

    def delay(self, user_agent: str) -> int | None:
        for agent_re, d in self.delays:
            if agent_re.search(user_agent):
                return d
        return None


class RobotsCache:
    """Per-host parsed-robots cache, fed from a ``{host: body}`` dict
    (the broadcast robots side-table).  Mirrors Robotex's ``@parsed``
    memo (robotex.rb:111-121) without any network.

    ``user_agent`` may be a LIST: the reference samples a UA once per
    HTTP client construction (polipus.rb:133-137) and Robotex matches
    rules against that client's UA; the deterministic analog here is
    per-request ``ua_idx = url_hash(u64) % len`` (the same index the
    fetcher uses for the ``ua`` request column, O6).  ``delay`` stays
    pinned to index 0 — a per-request delay would make a host's
    crawl-delay vary row to row, which has no reference counterpart
    (the reference's delay is per worker client)."""

    def __init__(self, robots_bodies: dict[str, str], user_agent="polipus-ray"):
        self._bodies = robots_bodies
        self._parsed: dict[str, ParsedRobots] = {}
        # per (host, ua_idx): a flat list of the disallow rules whose
        # agent matches that UA (empty => allow-all, no path parse),
        # and the resolved crawl delay.  Same semantics as ParsedRobots
        # (flat any() == the nested loop), ~10x cheaper per URL.
        self._flat_rules: dict[tuple[str, int], list[re.Pattern]] = {}
        # combined RE2 alternation per (host, ua): "" = no rules,
        # False = RE2 rejected the pattern (per-row Python fallback)
        self._alt_rules: dict[tuple[str, int], str | bool] = {}
        self._host_delay: dict[tuple[str, int], int | None] = {}
        if isinstance(user_agent, (list, tuple)):
            self._uas = [str(u) for u in user_agent] or ["polipus-ray"]
        else:
            self._uas = [str(user_agent)]
        self.user_agent = self._uas[0]

    def n_agents(self) -> int:
        return len(self._uas)

    def _for_host(self, host: str) -> ParsedRobots:
        pr = self._parsed.get(host)
        if pr is None:
            pr = ParsedRobots.parse(self._bodies.get(host))
            self._parsed[host] = pr
        return pr

    def _rules_for(self, host: str, ua_idx: int = 0) -> list[re.Pattern]:
        got = self._flat_rules.get((host, ua_idx))
        if got is None:
            pr = self._for_host(host)
            ua = self._uas[ua_idx]
            got = [r for agent_re, rules in pr.disallows if agent_re.search(ua) for r in rules]
            self._flat_rules[(host, ua_idx)] = got
        return got

    def allowed(self, url: str, host: str | None = None, ua_idx: int = 0) -> bool:
        if host is None:
            from .urltools import host_of

            host = host_of(url)
        rules = self._rules_for(host, ua_idx)
        if not rules:
            return True
        path = path_of(url)
        return not any(r.search(path) for r in rules)

    def _alt_pattern(self, host: str, ua_idx: int):
        """Combined RE2 alternation of a (host, ua)'s Disallow rules:
        ``^(?:r1|r2|...)``.  Each rule is already ^-anchored and
        alternation-free (escape + ``*``→``.*``), so one unanchored
        RE2 search of the combined pattern == ``any(r.search(path))``.
        Returns "" when there are no rules; False when RE2 rejects the
        combined pattern (caller falls back to the Python loop)."""
        key = (host, ua_idx)
        got = self._alt_rules.get(key)
        if got is None:
            rules = self._rules_for(host, ua_idx)
            if not rules:
                got = ""
            else:
                import pyarrow as pa
                import pyarrow.compute as pc

                got = "^(?:" + "|".join(r.pattern[1:] for r in rules) + ")"
                try:
                    pc.match_substring_regex(pa.array([], pa.string()), got)
                except Exception:  # noqa: BLE001 — RE2 dialect mismatch
                    got = False
            self._alt_rules[key] = got
        return got

    def allowed_mask(self, urls, hosts, uhash=None) -> "np.ndarray":
        """Batched ``allowed``: rows grouped by host so the rule list
        resolves once per (host, ua) — and hosts with NO matching
        disallow rules (the common case) never materialize their rows
        at all.  Rule-bearing hosts' rows run fully vectorized: one
        RE2 request-uri extraction over all such rows (per-row
        ``path_of`` only for the rare no-netloc / empty-path /
        "?"-leading shapes) and ONE combined-alternation RE2 kernel
        per (host, ua) instead of a Python ``any(r.search)`` per row.
        ``urls``/``hosts`` may be Python lists OR Arrow string arrays.
        ``uhash``: optional uint64 url hashes for per-request UA
        resolution (ua_idx = hash % n_agents, fetcher parity).
        Identical output to per-row ``allowed`` (pinned in
        test_robots)."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        n = len(urls)
        keep = np.ones(n, dtype=bool)
        if n == 0:
            return keep
        nag = len(self._uas)
        ha = hosts if isinstance(hosts, (pa.Array, pa.ChunkedArray)) else pa.array(hosts, pa.string())
        if isinstance(ha, pa.ChunkedArray):
            ha = ha.combine_chunks()
        urls_arrow = isinstance(urls, (pa.Array, pa.ChunkedArray))
        ua_arr = urls.combine_chunks() if isinstance(urls, pa.ChunkedArray) else urls
        hd = pc.dictionary_encode(ha)
        hu = hd.dictionary.to_pylist()
        hidx = hd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uh_all = None if uhash is None else np.asarray(uhash, dtype=np.uint64)
        rule_hosts = []  # (dict code, host, per-ua rule lists)
        for k, h in enumerate(hu):
            per_ua = [self._rules_for(h, ui) for ui in range(nag)]
            if any(per_ua):
                rule_hosts.append((k, h, per_ua))
        if not rule_hosts:
            return keep
        need = np.isin(hidx, np.array([k for k, _, _ in rule_hosts], dtype=np.int64))
        rows_all = np.flatnonzero(need)
        if urls_arrow:
            u_sub = ua_arr.take(pa.array(rows_all))
        else:
            u_sub = pa.array([urls[int(i)] for i in rows_all], pa.string())
        # request-uri per row (vectorized path_of): capture everything
        # after scheme://netloc up to the fragment; fix up the rare
        # shapes path_of special-cases via the exact Python function
        paths = pc.struct_field(pc.extract_regex(u_sub, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*(?P<r>[^#]*)"), "r")
        fix = pc.fill_null(
            pc.or_(pc.or_kleene(pc.is_null(paths), pc.equal(paths, "")), pc.starts_with(paths, "?")), True
        ).to_numpy(zero_copy_only=False)
        fi = np.flatnonzero(fix)
        if fi.size:
            u_fix = u_sub.take(pa.array(fi)).to_pylist()
            paths = pc.replace_with_mask(paths, pa.array(fix), pa.array([path_of(u) for u in u_fix], pa.string()))
        hidx_sub = hidx[rows_all]
        uai_sub = None
        if nag > 1:
            if uh_all is not None:
                uai_sub = (uh_all[rows_all] % np.uint64(nag)).astype(np.int64)
            else:
                from .urltools import url_hash64

                uai_sub = np.array([url_hash64(u) % nag for u in u_sub.to_pylist()], dtype=np.int64)
        for k, h, per_ua in rule_hosts:
            gsel = np.flatnonzero(hidx_sub == k)
            for ui in (0,) if uai_sub is None else np.unique(uai_sub[gsel]):
                rules = per_ua[int(ui)]
                if not rules:
                    continue
                rsel = gsel if uai_sub is None else gsel[uai_sub[gsel] == ui]
                pat = self._alt_pattern(h, int(ui))
                if pat:
                    m = pc.fill_null(pc.match_substring_regex(paths.take(pa.array(rsel)), pat), False)
                    bad = rsel[m.to_numpy(zero_copy_only=False)]
                    keep[rows_all[bad]] = False
                else:  # RE2 rejected the combined pattern: exact loop
                    p_rows = paths.take(pa.array(rsel)).to_pylist()
                    for j, p in zip(rsel, p_rows):
                        if any(r.search(p) for r in rules):
                            keep[rows_all[j]] = False
        return keep

    def delay(self, host: str, ua_idx: int = 0) -> int | None:
        try:
            return self._host_delay[(host, ua_idx)]
        except KeyError:
            d = self._for_host(host).delay(self._uas[ua_idx])
            self._host_delay[(host, ua_idx)] = d
            return d
