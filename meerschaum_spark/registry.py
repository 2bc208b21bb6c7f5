"""Pipes metadata registry: parameters + dtypes + sync state per pipe.

Plays the role of the reference's ``mrsm_pipes`` instance tables
(meerschaum/connectors/sql/_instance.py) and the attributes cache
(core/Pipe/_attributes.py:58-328). Stored as one JSON document per pipe
under ``<instance_root>/.registry/`` — metadata is tiny and driver-side;
the data plane stays fully distributed.
"""

from __future__ import annotations

import json
import os
import re
import threading
import time
from typing import Any

_LOCK = threading.Lock()


def sanitize_name(part: str) -> str:
    return re.sub(r"[^A-Za-z0-9_]+", "_", str(part)).strip("_").lower()


def target_name(connector: str, metric: str, location: str | None = None) -> str:
    """Auto-generated physical table name (reference
    core/Pipe/_attributes.py:990-1061)."""
    parts = [sanitize_name(connector), sanitize_name(metric)]
    if location:
        parts.append(sanitize_name(location))
    return "_".join(p for p in parts if p)


class PipeRegistry:
    def __init__(self, instance_root: str):
        self.instance_root = instance_root
        self.registry_dir = os.path.join(instance_root, ".registry")

    def _doc_path(self, target: str) -> str:
        return os.path.join(self.registry_dir, f"{target}.json")

    def load(self, target: str) -> dict[str, Any] | None:
        path = self._doc_path(target)
        if not os.path.isfile(path):
            return None
        with open(path) as f:
            return json.load(f)

    def save(self, target: str, doc: dict[str, Any]) -> None:
        with _LOCK:
            os.makedirs(self.registry_dir, exist_ok=True)
            doc = dict(doc)
            doc["updated_at"] = time.time()
            tmp = self._doc_path(target) + ".tmp"
            with open(tmp, "w") as f:
                json.dump(doc, f, indent=1, default=str)
            os.replace(tmp, self._doc_path(target))

    def delete(self, target: str) -> bool:
        path = self._doc_path(target)
        if os.path.isfile(path):
            os.remove(path)
            return True
        return False

    def fetch_pipes_keys(
        self,
        connector: str | None = None,
        metric: str | None = None,
        location: str | None = None,
        tags: list[str] | None = None,
    ) -> list[tuple[str, str, str | None]]:
        """Filtered pipe listing (reference
        connectors/instance/_pipes.py fetch_pipes_keys)."""
        out = []
        if not os.path.isdir(self.registry_dir):
            return out
        for name in sorted(os.listdir(self.registry_dir)):
            if not name.endswith(".json"):
                continue
            doc = self.load(name[:-5])
            if not doc:
                continue
            keys = doc.get("keys", {})
            if connector and keys.get("connector") != connector:
                continue
            if metric and keys.get("metric") != metric:
                continue
            if location and keys.get("location") != location:
                continue
            if tags:
                doc_tags = set(doc.get("parameters", {}).get("tags", []))
                if not doc_tags.intersection(tags):
                    continue
            out.append((keys.get("connector"), keys.get("metric"), keys.get("location")))
        return out
