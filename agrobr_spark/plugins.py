"""Plugin system: typed plugin classes, a registry with lazy
setup-on-first-use instances, file/directory discovery, and bridges
into the connector registry and dataset resolver.

Reference: agrobr/plugins/__init__.py:18-160 — Plugin base with
PluginMeta, SourcePlugin/ParserPlugin/ExporterPlugin/ValidatorPlugin
shapes, register() with override-wins semantics, get_plugin() lazy
instantiation + setup(), load_plugin_from_file/dir module discovery.

Spark adaptation: SourcePlugin.fetch returns a DataFrame (it IS a
DatasetSource fetch_fn), and ``as_dataset_source`` plugs a registered
source plugin straight into the D1 priority-fallback resolver.
"""

from __future__ import annotations

import importlib.util
from abc import ABC, abstractmethod
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, TypeVar

T = TypeVar("T", bound="Plugin")

_registry: dict[str, type["Plugin"]] = {}
_instances: dict[str, "Plugin"] = {}


@dataclass
class PluginMeta:
    name: str
    version: str
    description: str
    author: str = ""
    requires: list[str] = field(default_factory=list)
    provides: list[str] = field(default_factory=list)


class Plugin(ABC):
    meta: PluginMeta

    @abstractmethod
    def setup(self) -> None: ...

    @abstractmethod
    def teardown(self) -> None: ...

    def is_enabled(self) -> bool:
        return True


class SourcePlugin(Plugin):
    """A pluggable data source: fetch(**kwargs) -> DataFrame."""

    @abstractmethod
    def fetch(self, **kwargs: Any) -> Any: ...

    def get_source_name(self) -> str:
        return self.meta.name

    @property
    def priority(self) -> int:
        return 100  # plugins default behind built-in sources


class ParserPlugin(Plugin):
    @abstractmethod
    def can_parse(self, content: str) -> bool: ...

    @abstractmethod
    def parse(self, content: str, **kwargs: Any) -> Any: ...

    @property
    def priority(self) -> int:
        return 0


class ExporterPlugin(Plugin):
    @abstractmethod
    def export(self, data: Any, path: Path, **kwargs: Any) -> Path: ...

    @abstractmethod
    def get_extension(self) -> str: ...


class ValidatorPlugin(Plugin):
    @abstractmethod
    def validate(self, data: Any, **kwargs: Any) -> tuple[bool, list[str]]: ...


def register(plugin_class: type[T]) -> type[T]:
    """Class decorator; later registrations override (ref :90-102)."""
    if not hasattr(plugin_class, "meta"):
        raise ValueError(
            f"Plugin {plugin_class.__name__} must have a 'meta' attribute"
        )
    name = plugin_class.meta.name
    _registry[name] = plugin_class
    _instances.pop(name, None)
    return plugin_class


def get_plugin(name: str) -> Plugin | None:
    """Lazy singleton: instantiate + setup() on first use."""
    if name in _instances:
        return _instances[name]
    cls = _registry.get(name)
    if cls is None:
        return None
    instance = cls()
    instance.setup()
    _instances[name] = instance
    return instance


def list_plugins() -> list[PluginMeta]:
    return [cls.meta for cls in _registry.values()]


def list_plugins_by_type(plugin_type: type[Plugin]) -> list[PluginMeta]:
    return [cls.meta for cls in _registry.values() if issubclass(cls, plugin_type)]


def unregister(name: str) -> None:
    inst = _instances.pop(name, None)
    if inst is not None:
        inst.teardown()
    _registry.pop(name, None)


def load_plugin_from_file(path: Path) -> type[Plugin] | None:
    """Import a module by path and register the first Plugin subclass
    found (ref :127-152)."""
    path = Path(path)
    if not path.exists():
        return None
    spec = importlib.util.spec_from_file_location(path.stem, path)
    if spec is None or spec.loader is None:
        return None
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    for attr_name in dir(module):
        attr = getattr(module, attr_name)
        if (
            isinstance(attr, type)
            and issubclass(attr, Plugin)
            and attr not in (Plugin, SourcePlugin, ParserPlugin,
                             ExporterPlugin, ValidatorPlugin)
            and hasattr(attr, "meta")
        ):
            register(attr)
            return attr
    return None


def load_plugins_from_dir(directory: Path) -> list[type[Plugin]]:
    directory = Path(directory)
    loaded: list[type[Plugin]] = []
    if not directory.exists():
        return loaded
    for path in sorted(directory.glob("*.py")):
        cls = load_plugin_from_file(path)
        if cls is not None:
            loaded.append(cls)
    return loaded


# ---------------------------------------------------------------------------
# Bridges into the engine
# ---------------------------------------------------------------------------


def as_dataset_source(name: str):
    """A registered SourcePlugin as a D1 DatasetSource — plugs into
    ``get_dataset(..., sources=[...])`` directly."""
    from agrobr_spark.datasets import DatasetSource

    plugin = get_plugin(name)
    if plugin is None or not isinstance(plugin, SourcePlugin):
        raise KeyError(f"no source plugin named {name!r}")
    return DatasetSource(
        name=plugin.get_source_name(),
        priority=plugin.priority,
        fetch_fn=plugin.fetch,
    )


def register_source_connector(name: str, plugin_name: str) -> None:
    """Expose a SourcePlugin in the connector registry under
    ``<name>`` so golden tests / catalog code can reach it."""
    from agrobr_spark.sources.connectors import register_connector

    plugin = get_plugin(plugin_name)
    if plugin is None or not isinstance(plugin, SourcePlugin):
        raise KeyError(f"no source plugin named {plugin_name!r}")
    register_connector(name, lambda spark, **kw: plugin.fetch(spark=spark, **kw))
