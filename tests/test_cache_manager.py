"""QueryCache tests mirroring the reference's test_cache.py coverage:
defaults, get/set/delete, key normalization, TTL, clear, stats."""

from __future__ import annotations

import time

from ontology_mapper_spark.cache import CacheConfig, QueryCache
from ontology_mapper_spark.oracle.semantics import cache_key


def test_defaults():
    c = CacheConfig()
    assert c.enabled and c.ttl_seconds == 86_400.0 and c.max_size_mb == 100.0


def test_get_set_delete():
    q = QueryCache()
    assert q.get("fatigue", "HP,NCIT", "bioportal") is None
    q.set("fatigue", "HP,NCIT", "bioportal", [{"uri": "u1"}])
    assert q.get("fatigue", "HP,NCIT", "bioportal") == [{"uri": "u1"}]
    assert q.delete("fatigue", "HP,NCIT", "bioportal")
    assert q.get("fatigue", "HP,NCIT", "bioportal") is None


def test_key_normalization_case_whitespace():
    """Case/whitespace-insensitive hits (test_cache.py:65-85 idiom;
    normalization per cache_manager.py:41-54)."""
    q = QueryCache()
    q.set("  Fatigue ", "hp,ncit", "BioPortal", "X")
    assert q.get("fatigue", "HP,NCIT", "bioportal") == "X"
    assert QueryCache.make_key(" Fatigue ", "hp", "OLS") == cache_key(
        " Fatigue ", "hp", "OLS"
    )


def test_ttl_expiry():
    q = QueryCache(CacheConfig(ttl_seconds=0.2))
    q.set("a", "HP", "ols", 1)
    assert q.get("a", "HP", "ols") == 1
    time.sleep(0.25)
    assert q.get("a", "HP", "ols") is None  # expired → miss + evicted


def test_disabled_cache_always_misses():
    q = QueryCache(CacheConfig(enabled=False))
    q.set("a", "HP", "ols", 1)
    assert q.get("a", "HP", "ols") is None
    assert q.stats["sets"] == 0


def test_per_ontology_and_service_separation():
    q = QueryCache()
    q.set("a", "HP", "bioportal", 1)
    q.set("a", "NCIT", "bioportal", 2)
    q.set("a", "HP", "ols", 3)
    assert q.get("a", "HP", "bioportal") == 1
    assert q.get("a", "NCIT", "bioportal") == 2
    assert q.get("a", "HP", "ols") == 3


def test_persistent_tier_and_clear(tmp_path):
    cfg = CacheConfig(persistent=True, cache_dir=str(tmp_path / "c"))
    q = QueryCache(cfg)
    q.set("a", "HP", "ols", {"k": 1})
    # a fresh instance reads the file tier
    q2 = QueryCache(cfg)
    assert q2.get("a", "HP", "ols") == {"k": 1}
    assert q2.clear() >= 1
    q3 = QueryCache(cfg)
    assert q3.get("a", "HP", "ols") is None


def test_eviction_by_size(tmp_path):
    cfg = CacheConfig(
        persistent=True, cache_dir=str(tmp_path / "c"), max_size_mb=0.001
    )
    q = QueryCache(cfg)
    for i in range(10):
        q.set(f"q{i}", "HP", "ols", "x" * 500)
    import os

    files = [f for f in os.listdir(cfg.cache_dir) if f.endswith(".json")]
    total = sum(
        os.path.getsize(os.path.join(cfg.cache_dir, f)) for f in files
    )
    assert total <= 0.001 * 1024 * 1024 + 1100  # cap honored modulo last write


def test_stats_and_hit_rate():
    q = QueryCache()
    q.set("a", "HP", "ols", 1)
    q.get("a", "HP", "ols")
    q.get("b", "HP", "ols")
    s = q.get_stats()
    assert s["hits"] == 1 and s["misses"] == 1 and s["sets"] == 1
    assert s["hit_rate_percent"] == 50.0


def test_cache_config_from_env_and_file(tmp_path):
    from ontology_mapper_spark.cache.manager import CacheConfig

    cfg = CacheConfig.from_env(
        {"CACHE_ENABLED": "False", "CACHE_TTL": "60",
         "CACHE_PERSISTENT": "TRUE", "CACHE_DIR": "/tmp/x",
         "CACHE_MAX_SIZE_MB": "5"}
    )
    assert cfg.enabled is False and cfg.ttl_seconds == 60.0
    assert cfg.persistent is True and cfg.cache_dir == "/tmp/x"
    assert cfg.max_size_mb == 5.0
    # defaults when unset (reference cache_config.py defaults)
    d = CacheConfig.from_env({})
    assert d.enabled is True and d.ttl_seconds == 86_400.0
    assert d.persistent is True  # reference default (ADVICE r2)
    assert d.cache_dir.endswith(".ontology_mapper_cache")

    envf = tmp_path / "cache.env"
    envf.write_text(
        "# comment\nCACHE_TTL=120\nCACHE_DIR='/tmp/q'\n\nBROKEN LINE\n"
        'CACHE_ENABLED="true"\n'
    )
    f = CacheConfig.from_env_file(str(envf))
    assert f.ttl_seconds == 120.0 and f.cache_dir == "/tmp/q" and f.enabled
