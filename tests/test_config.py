"""R-5 parity: env-var config with fail-fast on missing required
values, mapped to exit code 2 before any Spark work starts
(reference main.py:52-88)."""

from __future__ import annotations

import pytest

from etl_neotel_sql_automation_spark.pipeline import (
    EXIT_CONFIG,
    env_var,
    load_jdbc_config,
    main,
)


def test_env_var_required_missing_raises(monkeypatch):
    monkeypatch.delenv("ETL_TEST_MISSING", raising=False)
    with pytest.raises(EnvironmentError, match="ETL_TEST_MISSING"):
        env_var("ETL_TEST_MISSING")


def test_env_var_empty_counts_as_missing(monkeypatch):
    monkeypatch.setenv("ETL_TEST_EMPTY", "")
    with pytest.raises(EnvironmentError):
        env_var("ETL_TEST_EMPTY")


def test_env_var_optional_default(monkeypatch):
    monkeypatch.delenv("ETL_TEST_OPT", raising=False)
    assert env_var("ETL_TEST_OPT", required=False, default="fallback") == "fallback"


def test_jdbc_config_absent_is_none(monkeypatch):
    monkeypatch.delenv("ETL_JDBC_URL", raising=False)
    assert load_jdbc_config() is None


def test_jdbc_config_partial_fails_fast(monkeypatch):
    monkeypatch.setenv("ETL_JDBC_URL", "jdbc:postgresql://db/x")
    monkeypatch.delenv("ETL_JDBC_USER", raising=False)
    monkeypatch.delenv("ETL_JDBC_PASSWORD", raising=False)
    with pytest.raises(EnvironmentError, match="ETL_JDBC_USER"):
        load_jdbc_config()


def test_jdbc_config_complete(monkeypatch):
    monkeypatch.setenv("ETL_JDBC_URL", "jdbc:postgresql://db/x")
    monkeypatch.setenv("ETL_JDBC_USER", "u")
    monkeypatch.setenv("ETL_JDBC_PASSWORD", "p")
    monkeypatch.delenv("ETL_JDBC_DRIVER", raising=False)
    cfg = load_jdbc_config()
    assert cfg is not None
    assert (cfg.user, cfg.password) == ("u", "p")
    assert cfg.driver == "org.postgresql.Driver"  # optional with default


def test_main_exit2_when_landing_unconfigured(monkeypatch):
    monkeypatch.delenv("ETL_LANDING_DIR", raising=False)
    monkeypatch.delenv("ETL_OUTPUT_DIR", raising=False)
    assert main([]) == EXIT_CONFIG


def test_main_exit2_on_partial_jdbc_env(monkeypatch, tmp_path):
    monkeypatch.setenv("ETL_JDBC_URL", "jdbc:postgresql://db/x")
    monkeypatch.delenv("ETL_JDBC_USER", raising=False)
    monkeypatch.delenv("ETL_JDBC_PASSWORD", raising=False)
    assert main(["--landing", str(tmp_path), "--out", str(tmp_path / "o")]) == EXIT_CONFIG


def test_main_resolves_dirs_from_env(monkeypatch, tmp_path):
    """CLI flags omitted: dirs come from the environment; a
    nonexistent landing dir is still a config error (exit 2),
    proving resolution happened before any Spark work."""
    monkeypatch.delenv("ETL_JDBC_URL", raising=False)
    monkeypatch.setenv("ETL_LANDING_DIR", str(tmp_path / "does_not_exist"))
    monkeypatch.setenv("ETL_OUTPUT_DIR", str(tmp_path / "o"))
    assert main([]) == EXIT_CONFIG
