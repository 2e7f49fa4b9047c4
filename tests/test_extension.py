"""Extension registry + plugin loading (util/extension.py,
util/plugin.py parity)."""

import pytest

from xcube_spark.util.extension import (EXTENSION_POINT_DATA_OPENERS,
                                        EXTENSION_POINT_DATA_STORES,
                                        Extension, ExtensionRegistry,
                                        get_extension_registry,
                                        import_component, load_plugins)


def test_extension_eager_and_lazy():
    calls = []

    def loader(ext):
        calls.append(ext.name)
        return "LOADED"

    e = Extension("pt", "lazy", loader=loader, title="Lazy one")
    assert e.is_lazy
    assert e.metadata == {"title": "Lazy one"}
    assert calls == []  # not loaded yet
    assert e.component == "LOADED"
    assert e.component == "LOADED"
    assert calls == ["lazy"]  # loaded exactly once

    eager = Extension("pt", "eager", component=42)
    assert not eager.is_lazy and eager.component == 42
    assert eager.to_dict() == {"name": "eager", "point": "pt",
                               "lazy": False}


def test_extension_validation():
    with pytest.raises(ValueError):
        Extension("pt", "x")  # neither component nor loader
    with pytest.raises(ValueError):
        Extension("pt", "x", component=1, loader=lambda e: 1)  # both
    with pytest.raises(ValueError):
        Extension("", "x", component=1)
    with pytest.raises(ValueError):
        import_component("no_colon")


def test_registry_add_find_remove():
    reg = ExtensionRegistry()
    reg.add_extension("fmt", "a", component="A", rank=1)
    reg.add_extension("fmt", "b", component="B", rank=2)
    assert reg.has_extension("fmt", "a")
    assert reg.get_component("fmt", "b") == "B"
    assert [e.name for e in reg.find_extensions("fmt")] == ["a", "b"]
    assert reg.find_components(
        "fmt", lambda e: e.metadata["rank"] > 1) == ["B"]
    assert reg.find_extensions("nope") == []
    reg.remove_extension("fmt", "a")
    assert not reg.has_extension("fmt", "a")
    with pytest.raises(ValueError):
        reg.remove_extension("fmt", "a")
    with pytest.raises(ValueError):
        reg.get_component("fmt", "zzz")
    assert "fmt" in reg.to_dict()


def test_import_component_lazy_loads():
    reg = ExtensionRegistry()
    reg.add_extension(
        "math", "sqrt", loader=import_component("math:sqrt"))
    assert reg.get_component("math", "sqrt")(9.0) == 3.0


def test_builtin_registry_has_openers_and_stores():
    reg = get_extension_registry()
    names = {e.name for e in reg.find_extensions(
        EXTENSION_POINT_DATA_OPENERS)}
    assert {"zarr", "netcdf3", "netcdf4", "geotiff", "jp2",
            "kerchunk"} <= names
    # every registered loader resolves to a callable
    fn = reg.get_component(EXTENSION_POINT_DATA_OPENERS, "zarr")
    assert callable(fn)
    store_cls = reg.get_component(EXTENSION_POINT_DATA_STORES, "memory")
    assert isinstance(store_cls, type)


def test_plugin_init_called_and_failure_isolated():
    reg = ExtensionRegistry()

    def good_plugin(r):
        """Registers one extension."""
        r.add_extension("pt", "from-plugin", component=1)

    def bad_plugin(r):
        raise RuntimeError("boom")

    with pytest.warns(UserWarning, match="failed to load plugin"):
        load_plugins([good_plugin, bad_plugin], ext_registry=reg)
    assert reg.has_extension("pt", "from-plugin")
