"""Cached synthetic-world builders keyed by sf_dir.

The correctness driver calls every ``queries()`` entry with an
``sf_dir``; crawl queries derive their web world deterministically
from that dir's ``documents.parquet`` (see synth/world.py docstring
for the SQL-replicable derivation).  Worlds are materialized once
under /tmp and reused across queries in the same run."""

from __future__ import annotations

import hashlib
import os
from dataclasses import asdict

from ..synth.world import WorldSpec, write_world

_ROOT = "/tmp/polipus_ray_worlds"

# the SQL-oracle world: no redirects (redirect folding is covered by
# the pytest oracle; the recursive-SQL oracle models a redirect-free
# graph), robots on
SQL_SPEC = WorldSpec(redirect_mod=0)
# the full-semantics world used by entry()/tests: redirects on
FULL_SPEC = WorldSpec(redirect_mod=23)


def world_for(sf_dir: str, spec: WorldSpec, tag: str) -> str:
    key = hashlib.md5(f"{os.path.abspath(sf_dir)}|{sorted(asdict(spec).items())}|{tag}".encode()).hexdigest()[:12]
    out = os.path.join(_ROOT, f"{tag}-{key}")
    marker = os.path.join(out, "world.json")
    if not os.path.exists(marker):
        write_world(out, os.path.join(sf_dir, "documents.parquet"), spec)
    return out


def sql_world_for(sf_dir: str) -> str:
    return world_for(sf_dir, SQL_SPEC, "sql")


def full_world_for(sf_dir: str) -> str:
    return world_for(sf_dir, FULL_SPEC, "full")
