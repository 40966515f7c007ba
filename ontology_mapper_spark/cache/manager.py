"""In-session query/result cache (SURVEY.md O1-O3, A6).

The reference memoizes REST responses in a two-tier cache — an in-memory
dict plus one JSON file per sha256 key, with TTL expiry, size-capped
mtime-ordered eviction, and hit/miss statistics
(/root/reference/cache/cache_manager.py). In this engine the heavy
cross-RUN caching is the pipeline runner's fingerprint-gated stage tables
(pipeline/runner.py); this module is the *in-session* analogue for
driver-side memoization of small computed artifacts (ranked dictionaries,
IDF maps, pattern lists) keyed with the reference's exact normalization:

    sha256(f"{query.lower().strip()}|{ontologies.upper().strip()}|{service}")
    (cache/cache_manager.py:41-54)

Semantics mirrored: get/set/delete/clear, TTL expiry on read
(cache_manager.py:67-78), disabled-cache misses, stats counters with hit
rate (cache_manager.py:25-31,233-253), JSON file tier with mtime-ordered
size eviction (cache_manager.py:255-279). Errors are never cached (O4).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any

from ..oracle.semantics import cache_key


@dataclass
class CacheConfig:
    enabled: bool = True
    ttl_seconds: float = 86_400.0  # reference default: 24h (cache_config.py:17)
    persistent: bool = False
    cache_dir: str = ".omx_cache"
    max_size_mb: float = 100.0  # cache_config.py:23

    @classmethod
    def from_env(cls, env: dict[str, str] | None = None) -> "CacheConfig":
        """S9 env/config source: the reference's exact variable names,
        parsing rules AND defaults (cache/cache_config.py:12-26 —
        case-insensitive 'true' booleans, int-parsed TTL/size,
        persistent=true, cache_dir=~/.ontology_mapper_cache). The
        dataclass's own defaults stay Spark-local-friendly (.omx_cache,
        non-persistent); only the env-source path mirrors the reference.
        `env` defaults to os.environ; injectable for tests."""
        e = os.environ if env is None else env
        return cls(
            enabled=e.get("CACHE_ENABLED", "true").lower() == "true",
            ttl_seconds=float(int(e.get("CACHE_TTL", "86400"))),
            persistent=e.get("CACHE_PERSISTENT", "true").lower() == "true",
            cache_dir=e.get(
                "CACHE_DIR",
                os.path.join(os.path.expanduser("~"), ".ontology_mapper_cache"),
            ),
            max_size_mb=float(int(e.get("CACHE_MAX_SIZE_MB", "100"))),
        )

    @classmethod
    def from_env_file(cls, path: str) -> "CacheConfig":
        """Minimal .env loader (KEY=VALUE lines, '#' comments, optional
        surrounding quotes) feeding the same parsing as from_env."""
        env: dict[str, str] = {}
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if not line or line.startswith("#") or "=" not in line:
                    continue
                k, _, v = line.partition("=")
                v = v.strip()
                if len(v) >= 2 and v[0] == v[-1] and v[0] in "\"'":
                    v = v[1:-1]
                env[k.strip()] = v
        return cls.from_env(env)


@dataclass
class QueryCache:
    config: CacheConfig = field(default_factory=CacheConfig)

    def __post_init__(self) -> None:
        self._mem: dict[str, dict[str, Any]] = {}
        self.stats = {"hits": 0, "misses": 0, "sets": 0, "deletes": 0, "errors": 0}
        if self.config.persistent:
            os.makedirs(self.config.cache_dir, exist_ok=True)

    # -- keys --------------------------------------------------------------

    @staticmethod
    def make_key(query: str, ontologies: str, service: str) -> str:
        return cache_key(query, ontologies, service)

    def _path(self, key: str) -> str:
        return os.path.join(self.config.cache_dir, f"{key}.json")

    # -- api ---------------------------------------------------------------

    def get(self, query: str, ontologies: str, service: str) -> Any | None:
        if not self.config.enabled:
            self.stats["misses"] += 1
            return None
        key = self.make_key(query, ontologies, service)
        entry = self._mem.get(key)
        if entry is None and self.config.persistent:
            try:
                with open(self._path(key)) as fh:
                    entry = json.load(fh)
                self._mem[key] = entry
            except FileNotFoundError:
                entry = None
            except (OSError, json.JSONDecodeError):
                self.stats["errors"] += 1
                entry = None
        if entry is None:
            self.stats["misses"] += 1
            return None
        if time.time() - entry["timestamp"] > self.config.ttl_seconds:
            # TTL expiry counts as a miss and evicts (cache_manager.py:67-78)
            self.delete(query, ontologies, service, _count=False)
            self.stats["misses"] += 1
            return None
        self.stats["hits"] += 1
        return entry["data"]

    def set(self, query: str, ontologies: str, service: str, data: Any) -> None:
        if not self.config.enabled:
            return
        key = self.make_key(query, ontologies, service)
        entry = {
            "timestamp": time.time(),
            "data": data,
            "query": query,
            "ontologies": ontologies,
            "service": service,
        }
        self._mem[key] = entry
        self.stats["sets"] += 1
        if self.config.persistent:
            try:
                with open(self._path(key), "w") as fh:
                    json.dump(entry, fh)
                self._evict_if_oversized()
            except OSError:
                self.stats["errors"] += 1

    def delete(self, query: str, ontologies: str, service: str, _count: bool = True) -> bool:
        key = self.make_key(query, ontologies, service)
        found = self._mem.pop(key, None) is not None
        if self.config.persistent:
            try:
                os.remove(self._path(key))
                found = True
            except FileNotFoundError:
                pass
            except OSError:
                self.stats["errors"] += 1
        if found and _count:
            self.stats["deletes"] += 1
        return found

    def clear(self) -> int:
        n = len(self._mem)
        self._mem.clear()
        if self.config.persistent and os.path.isdir(self.config.cache_dir):
            for name in os.listdir(self.config.cache_dir):
                if name.endswith(".json"):
                    try:
                        os.remove(os.path.join(self.config.cache_dir, name))
                        n += 1
                    except OSError:
                        self.stats["errors"] += 1
        return n

    # -- maintenance -------------------------------------------------------

    def _evict_if_oversized(self) -> None:
        """mtime-ordered eviction to the size cap (cache_manager.py:255-279)."""
        cap = self.config.max_size_mb * 1024 * 1024
        files = []
        total = 0
        for name in os.listdir(self.config.cache_dir):
            if not name.endswith(".json"):
                continue
            p = os.path.join(self.config.cache_dir, name)
            st = os.stat(p)
            files.append((st.st_mtime, st.st_size, p))
            total += st.st_size
        if total <= cap:
            return
        for _mtime, size, p in sorted(files):
            try:
                os.remove(p)
                total -= size
            except OSError:
                self.stats["errors"] += 1
            if total <= cap:
                break

    def get_stats(self) -> dict[str, Any]:
        """Counters + derived hit rate (cache_manager.py:233-253)."""
        lookups = self.stats["hits"] + self.stats["misses"]
        rate = (self.stats["hits"] / lookups * 100.0) if lookups else 0.0
        return {**self.stats, "hit_rate_percent": round(rate, 1),
                "memory_entries": len(self._mem)}
