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


#: attributes-cache TTL (reference caches pipe attributes for 600 s,
#: core/Pipe/_cache.py + config/_default.py:244-258)
REGISTRY_TTL_SECONDS = 600.0

#: tag negation prefix (reference STATIC_CONFIG
#: system.fetch_pipes_keys.negation_prefix)
NEGATION_PREFIX = "_"


def _match_tag_groups(doc_tags: set, tags: list[str]) -> bool:
    """Reference tag-group matching (connectors/sql/_pipes.py:279-309 via
    utils/misc.py separate_negation_values): comma = AND within a group,
    groups OR'd, ``_``-prefixed tags negated."""
    for group in (t.split(",") for t in tags):
        in_tags = [t for t in group if not t.startswith(NEGATION_PREFIX)]
        ex_tags = [t[len(NEGATION_PREFIX):] for t in group
                   if t.startswith(NEGATION_PREFIX)]
        if (all(t in doc_tags for t in in_tags)
                and not any(t in doc_tags for t in ex_tags)):
            return True
    return False


#: one shared PipeRegistry per instance root, so the TTL cache survives
#: across Pipe objects (the reference attributes cache lives on the
#: instance connector, not the Pipe, core/Pipe/_cache.py) — without
#: sharing, every Pipe.__init__ and every HTTP request re-read the JSON
#: doc from disk
_REGISTRIES: dict[str, "PipeRegistry"] = {}
_REGISTRIES_MAX = 256


class PipeRegistry:
    def __init__(self, instance_root: str):
        self.instance_root = instance_root
        self.registry_dir = os.path.join(instance_root, ".registry")
        self._cache: dict[str, tuple[dict[str, Any] | None, float]] = {}

    @classmethod
    def for_instance(cls, instance_root: str) -> "PipeRegistry":
        """Shared, cache-carrying registry for an instance root."""
        key = os.path.abspath(instance_root)
        with _LOCK:
            reg = _REGISTRIES.get(key)
            if reg is None:
                # bound the map: test suites churn through many temp
                # instances; evict the oldest half when full
                if len(_REGISTRIES) >= _REGISTRIES_MAX:
                    for old in list(_REGISTRIES)[:_REGISTRIES_MAX // 2]:
                        del _REGISTRIES[old]
                reg = cls(instance_root)
                _REGISTRIES[key] = reg
            return reg

    def _doc_path(self, target: str) -> str:
        return os.path.join(self.registry_dir, f"{target}.json")

    def load(self, target: str) -> dict[str, Any] | None:
        """Read a pipe's metadata doc, via a TTL cache: local saves and
        deletes refresh the cache in place, so within one process the
        cache is always current; cross-process edits surface at expiry."""
        hit = self._cache.get(target)
        if hit is not None and time.monotonic() - hit[1] < REGISTRY_TTL_SECONDS:
            return hit[0]
        doc = self._load_uncached(target)
        self._cache[target] = (doc, time.monotonic())
        return doc

    def _load_uncached(self, target: str) -> dict[str, Any] | None:
        path = self._doc_path(target)
        if not os.path.isfile(path):
            return None
        with open(path) as f:
            return json.load(f)

    def save(self, target: str, doc: dict[str, Any]) -> None:
        with _LOCK:
            # no-op save skip: pipe.sync() re-registers after every cycle,
            # but the doc only actually changes on schema evolution or
            # parameter edits — skip the disk write (and updated_at bump)
            # when the cached doc already matches (reference skips
            # re-registration of unchanged attributes via its 600 s cache)
            hit = self._cache.get(target)
            if hit is not None and hit[0] is not None:
                old = {k: v for k, v in hit[0].items() if k != "updated_at"}
                new = json.loads(json.dumps(dict(doc), default=str))
                new.pop("updated_at", None)
                if old == new:
                    return
            os.makedirs(self.registry_dir, exist_ok=True)
            doc = dict(doc)
            doc["updated_at"] = time.time()
            tmp = self._doc_path(target) + ".tmp"
            with open(tmp, "w") as f:
                json.dump(doc, f, indent=1, default=str)
            os.replace(tmp, self._doc_path(target))
            # round-trip through JSON so cached docs match disk exactly
            # (tuples→lists, datetimes→strings)
            self._cache[target] = (json.loads(json.dumps(doc, default=str)),
                                   time.monotonic())

    def delete(self, target: str) -> bool:
        path = self._doc_path(target)
        self._cache[target] = (None, time.monotonic())
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
        connectors/instance/_pipes.py fetch_pipes_keys).

        Tag matching follows the reference's group semantics
        (connectors/sql/_pipes.py:279-309): each element of ``tags`` is a
        comma-joined AND-group, groups are OR'd, and a ``_`` prefix
        negates a tag within its group — ``["a,b", "_c"]`` matches pipes
        tagged (a AND b) OR (NOT c)."""
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
                if not _match_tag_groups(doc_tags, tags):
                    continue
            out.append((keys.get("connector"), keys.get("metric"), keys.get("location")))
        return out
