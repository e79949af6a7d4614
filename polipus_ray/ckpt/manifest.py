"""Per-round checkpoint manifest — resumability with lineage+metrics.

The reference is "implicitly resumable": queue/tracker/storage all
live in Redis/Mongo and survive process death (SURVEY.md §4, reference
examples/incremental.rb).  Here resumability is explicit (north rule):
after every round the engine persists

    manifest.json   {round, next_seq, clock, frontier spill state
                     (part files = lineage of what remains to crawl),
                     per-round metrics history, config fingerprint}
    shard-*.bin     seen/stored shard snapshots (serialized cuckoo
                    filters + stored-manifest dicts)

Pages parquet is already durable and round-partitioned (idempotent:
a re-run of round R overwrites round R's directory only), so resume =
load manifest -> restore shards -> continue the wave loop at the
manifest's saved ``round`` (the engine saves post-increment: the
stored value already names the NEXT round to run; resume() applies no
+1).  Atomic: manifest written to a temp file then renamed;
shard snapshots written before the manifest that references them.
Only the latest ``keep`` checkpoints are retained.
"""

from __future__ import annotations

import json
import os
import shutil


class CheckpointManager:
    def __init__(self, root: str, keep: int = 2):
        self.root = root
        self.keep = keep
        os.makedirs(root, exist_ok=True)

    def _dir(self, round_no: int) -> str:
        return os.path.join(self.root, f"round={round_no}")

    def save(self, round_no: int, state: dict, shard_blobs: list[bytes]) -> None:
        d = self._dir(round_no)
        os.makedirs(d, exist_ok=True)
        for i, blob in enumerate(shard_blobs):
            with open(os.path.join(d, f"shard-{i}.bin"), "wb") as f:
                f.write(blob)
        state = dict(state, round=round_no, num_shards=len(shard_blobs))
        tmp = os.path.join(d, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, os.path.join(d, "manifest.json"))
        # pointer file names the latest complete checkpoint
        tip = os.path.join(self.root, "LATEST.tmp")
        with open(tip, "w") as f:
            json.dump({"round": round_no}, f)
        os.replace(tip, os.path.join(self.root, "LATEST"))
        self._gc(round_no)

    def _gc(self, newest: int) -> None:
        rounds = sorted(
            int(n.split("=")[1]) for n in os.listdir(self.root) if n.startswith("round=")
        )
        for r in rounds[: -self.keep] if len(rounds) > self.keep else []:
            shutil.rmtree(self._dir(r), ignore_errors=True)

    def referenced_spill_paths(self) -> set[str]:
        """Union of frontier spill part paths across every retained
        checkpoint manifest — consumed spill files in this set must
        survive (crash-resume re-reads them); everything else is
        garbage-collectable."""
        out: set[str] = set()
        for name in os.listdir(self.root):
            if not name.startswith("round="):
                continue
            mf = os.path.join(self.root, name, "manifest.json")
            try:
                with open(mf) as f:
                    state = json.load(f)
            except (OSError, json.JSONDecodeError):
                continue
            for p in state.get("spill", {}).get("parts", []):
                out.add(p["path"])
        return out

    def latest(self) -> int | None:
        p = os.path.join(self.root, "LATEST")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(json.load(f)["round"])

    def load(self, round_no: int | None = None) -> tuple[dict, list[bytes]] | None:
        if round_no is None:
            round_no = self.latest()
        if round_no is None:
            return None
        d = self._dir(round_no)
        with open(os.path.join(d, "manifest.json")) as f:
            state = json.load(f)
        blobs = []
        for i in range(state["num_shards"]):
            with open(os.path.join(d, f"shard-{i}.bin"), "rb") as f:
                blobs.append(f.read())
        return state, blobs
