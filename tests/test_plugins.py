"""Plugin registry: registration, lazy setup, file discovery, and the
dataset-resolver bridge (ref: agrobr/plugins/__init__.py:18-160)."""

from __future__ import annotations

import textwrap

import pytest

from agrobr_spark import plugins
from agrobr_spark.plugins import (
    PluginMeta,
    SourcePlugin,
    as_dataset_source,
    get_plugin,
    list_plugins,
    list_plugins_by_type,
    load_plugin_from_file,
    register,
    unregister,
)


@pytest.fixture(autouse=True)
def _clean_registry():
    before = dict(plugins._registry)
    yield
    for name in list(plugins._registry):
        if name not in before:
            unregister(name)


def _dummy_source(spark, name="dummy_src", priority=7):
    @register
    class Dummy(SourcePlugin):
        meta = PluginMeta(name=name, version="1.0", description="test src")
        setup_calls = 0

        def setup(self):
            type(self).setup_calls += 1

        def teardown(self):
            pass

        @property
        def priority(self):
            return priority

        def fetch(self, **kw):
            return spark.createDataFrame([(1, "a")], "id long, v string")

    return Dummy


def test_register_and_lazy_singleton(spark):
    cls = _dummy_source(spark)
    assert any(m.name == "dummy_src" for m in list_plugins())
    p1 = get_plugin("dummy_src")
    p2 = get_plugin("dummy_src")
    assert p1 is p2
    assert cls.setup_calls == 1  # setup ran once, on first get


def test_register_requires_meta():
    with pytest.raises(ValueError):
        register(type("NoMeta", (SourcePlugin,), {}))


def test_list_by_type(spark):
    _dummy_source(spark)
    metas = list_plugins_by_type(SourcePlugin)
    assert any(m.name == "dummy_src" for m in metas)


def test_override_wins(spark):
    _dummy_source(spark)

    @register
    class Override(SourcePlugin):
        meta = PluginMeta(name="dummy_src", version="2.0", description="v2")

        def setup(self):
            pass

        def teardown(self):
            pass

        def fetch(self, **kw):
            return spark.createDataFrame([(2, "b")], "id long, v string")

    p = get_plugin("dummy_src")
    assert p.meta.version == "2.0"


def test_load_plugin_from_file(tmp_path):
    src = textwrap.dedent(
        """
        from agrobr_spark.plugins import PluginMeta, SourcePlugin

        class FilePlugin(SourcePlugin):
            meta = PluginMeta(name="from_file", version="0.1", description="x")
            def setup(self): pass
            def teardown(self): pass
            def fetch(self, **kw): return kw
        """
    )
    f = tmp_path / "my_plugin.py"
    f.write_text(src)
    cls = load_plugin_from_file(f)
    assert cls is not None
    assert get_plugin("from_file") is not None


def test_source_plugin_end_to_end_in_resolver(spark):
    """A plugin source registered, bridged to a DatasetSource, and
    resolved through the D1 fallback: the whole extension path."""
    import datetime as dt

    @register
    class CachePlugin(SourcePlugin):
        meta = PluginMeta(
            name="parquet_cache", version="1.0",
            description="cached preco fallback", provides=["preco_diario"],
        )

        def setup(self):
            pass

        def teardown(self):
            pass

        @property
        def priority(self):
            return 99

        def fetch(self, **kw):
            rows = [(dt.date(2024, 1, 1), "soja", "Paranagua", 120.0, "BRL/sc60kg")]
            return spark.createDataFrame(
                rows,
                "data date, produto string, praca string, valor double, "
                "unidade string",
            )

    from agrobr_spark.datasets import DatasetSource, get_dataset

    def failing(**kw):
        raise ConnectionError("primary down")

    ds = get_dataset(
        "preco_diario",
        [DatasetSource("cepea", 1, failing), as_dataset_source("parquet_cache")],
    )
    df, meta = ds.fetch()
    assert meta.source == "parquet_cache"
    assert meta.attempted_sources == ["cepea", "parquet_cache"]
    assert df.count() == 1
