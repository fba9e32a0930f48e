"""Checkpoint manifests for the resumable index build.

The reference's resume pattern is the FullTextGatherer sip cursor: progress
(lastId per partition) persisted under a custom sip-index key, re-read on
restart, work re-entered idempotently (miru-stream-plugins/.../fulltext/
FullTextGatherer.java:175-253, cursor read/write :205-206, :242). Our analog
is a JSON manifest per index directory recording, per build *wave* (a batch
of doc-partitions committed atomically after its parquet lands):

    wave id → {parts, per-part doc/segment/posting counters, committed_at}

plus stage flags. A killed build re-runs only the waves missing from the
manifest; output directories are per-wave so a partially-written wave is
simply overwritten. The manifest write itself is atomic (tmp + rename).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any

MANIFEST_NAME = "manifest.json"


@dataclass
class Manifest:
    path: str
    data: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def load_or_create(cls, index_dir: str, fingerprint: dict[str, Any]) -> "Manifest":
        os.makedirs(index_dir, exist_ok=True)
        path = os.path.join(index_dir, MANIFEST_NAME)
        if os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
            if data.get("fingerprint") != fingerprint:
                # input changed → restart from scratch (schema-change rebuild,
                # MiruPartitionState obsolete→upgrading analog)
                data = cls._fresh(fingerprint)
        else:
            data = cls._fresh(fingerprint)
        m = cls(path=path, data=data)
        m.save()
        return m

    @staticmethod
    def _fresh(fingerprint: dict[str, Any]) -> dict[str, Any]:
        return {
            "version": 1,
            "fingerprint": fingerprint,
            "waves": {},
            "stages": {"segments": False, "stats": False, "ready": False},
        }

    def save(self) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.data, f, indent=2, sort_keys=True)
        os.replace(tmp, self.path)

    # -- waves ---------------------------------------------------------
    def wave_done(self, wave_id: int) -> bool:
        return str(wave_id) in self.data["waves"]

    def commit_wave(self, wave_id: int, parts: list[int], counters: dict[str, Any]) -> None:
        self.data["waves"][str(wave_id)] = {
            "parts": parts,
            "counters": counters,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        self.save()

    # -- stages --------------------------------------------------------
    def stage_done(self, stage: str) -> bool:
        return bool(self.data["stages"].get(stage))

    def commit_stage(self, stage: str, **extra: Any) -> None:
        self.data["stages"][stage] = True
        if extra:
            self.data.setdefault("stage_info", {})[stage] = extra
        self.save()

    @property
    def completed_parts(self) -> set[int]:
        out: set[int] = set()
        for w in self.data["waves"].values():
            out.update(w["parts"])
        return out
