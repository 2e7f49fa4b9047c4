"""Extension registry — the engine's extensibility backbone.

Reference: ``xcube/util/extension.py`` (Extension + ExtensionRegistry +
``import_component`` lazy loaders) and ``xcube/util/plugin.py``
(entry-point plugin discovery).  Same surface: named extensions under
string-keyed extension points, components either eager or lazily
imported on first access, predicate search, and plugin modules that
register more of them.  This is what lets a deployment add a new
format driver, data store, CLI command, or input processor without
patching the engine.

Extension points mirror the reference's (constants.py:18-32) with the
engine's own namespace.
"""

from __future__ import annotations

import importlib
from typing import Any, Callable, Optional

Component = Any
ComponentLoader = Callable[["Extension"], Component]
ExtensionPredicate = Callable[["Extension"], bool]

#: extension point ids (reference constants.py:18-32)
EXTENSION_POINT_DATASET_IOS = "xcube_spark.sources.dsio"
EXTENSION_POINT_DATA_STORES = "xcube_spark.sources.store"
EXTENSION_POINT_DATA_OPENERS = "xcube_spark.sources.opener"
EXTENSION_POINT_DATA_WRITERS = "xcube_spark.sources.writer"
EXTENSION_POINT_CLI_COMMANDS = "xcube_spark.cli"
EXTENSION_POINT_INPUT_PROCESSORS = "xcube_spark.pipeline.iproc"
EXTENSION_POINT_SERVER_APIS = "xcube_spark.server.api"


class Extension:
    """A named component under an extension point
    (extension.py:20-113).  Exactly one of ``component`` / ``loader``
    is given; with a loader the component resolves lazily on first
    access and is cached."""

    def __init__(
        self,
        point: str,
        name: str,
        component: Component = None,
        loader: ComponentLoader | None = None,
        **metadata: Any,
    ):
        if not point:
            raise ValueError("point must be given")
        if not name:
            raise ValueError("name must be given")
        if (component is None) == (loader is None):
            raise ValueError("either component or loader must be given")
        if loader is not None and not callable(loader):
            raise ValueError("loader must be callable")
        self._point = point
        self._name = name
        self._component = component
        self._loader = loader
        self._metadata = metadata

    @property
    def is_lazy(self) -> bool:
        return self._loader is not None

    @property
    def component(self) -> Component:
        if self._component is None and self._loader is not None:
            self._component = self._loader(self)
            self._loader = None
        return self._component

    @property
    def point(self) -> str:
        return self._point

    @property
    def name(self) -> str:
        return self._name

    @property
    def metadata(self) -> dict[str, Any]:
        return dict(self._metadata)

    def to_dict(self) -> dict[str, Any]:
        return {
            "name": self._name,
            "point": self._point,
            "lazy": self.is_lazy,
            **self._metadata,
        }


class ExtensionRegistry:
    """Extensions by (point, name) + predicate search
    (extension.py:116-270)."""

    def __init__(self) -> None:
        self._extensions: dict[str, dict[str, Extension]] = {}

    def has_extension(self, point: str, name: str) -> bool:
        return name in self._extensions.get(point, {})

    def get_extension(self, point: str, name: str) -> Optional[Extension]:
        return self._extensions.get(point, {}).get(name)

    def get_component(self, point: str, name: str) -> Component:
        ext = self.get_extension(point, name)
        if ext is None:
            raise ValueError(
                f"extension {name!r} not found for extension point "
                f"{point!r}")
        return ext.component

    def find_extensions(
        self, point: str,
        predicate: ExtensionPredicate | None = None,
    ) -> list[Extension]:
        exts = self._extensions.get(point, {}).values()
        if predicate is None:
            return list(exts)
        return [e for e in exts if predicate(e)]

    def find_components(
        self, point: str,
        predicate: ExtensionPredicate | None = None,
    ) -> list[Component]:
        return [e.component for e in self.find_extensions(point, predicate)]

    def add_extension(
        self,
        point: str,
        name: str,
        component: Component = None,
        loader: ComponentLoader | None = None,
        **metadata: Any,
    ) -> Extension:
        ext = Extension(point, name, component=component, loader=loader,
                        **metadata)
        self._extensions.setdefault(point, {})[name] = ext
        return ext

    def remove_extension(self, point: str, name: str) -> None:
        point_exts = self._extensions.get(point)
        if not point_exts or name not in point_exts:
            raise ValueError(
                f"extension {name!r} not found for extension point "
                f"{point!r}")
        del point_exts[name]

    def to_dict(self) -> dict[str, Any]:
        return {
            point: {n: e.to_dict() for n, e in exts.items()}
            for point, exts in self._extensions.items()
        }


def import_component(
    spec: str,
    transform: Callable[[Component, Extension], Component] | None = None,
    call: bool = False,
    call_args: tuple = (),
    call_kwargs: dict | None = None,
) -> ComponentLoader:
    """Lazy loader for ``'<module>:<attr>'`` component specs
    (extension.py:278-330): the import happens on first
    ``Extension.component`` access, so registering 50 format drivers
    costs nothing until one is used."""
    if ":" not in spec:
        raise ValueError(
            f"component spec {spec!r} must have form <module>:<attr>")

    def _load(extension: Extension) -> Component:
        module_name, attr = spec.split(":", 1)
        obj = importlib.import_module(module_name)
        for part in attr.split("."):
            obj = getattr(obj, part)
        if call:
            obj = obj(*call_args, **(call_kwargs or {}))
        if transform is not None:
            obj = transform(obj, extension)
        return obj

    return _load


_REGISTRY: ExtensionRegistry | None = None


def get_extension_registry() -> ExtensionRegistry:
    """The process-wide registry, with plugins loaded on first use
    (plugin.py:49-56)."""
    global _REGISTRY
    if _REGISTRY is None:
        _REGISTRY = ExtensionRegistry()
        _register_builtins(_REGISTRY)
        load_plugins(ext_registry=_REGISTRY)
    return _REGISTRY


def _register_builtins(reg: ExtensionRegistry) -> None:
    """Built-in components, all lazy (the reference registers its own
    ios/stores via ``xcube.plugin.init_plugin``)."""
    for name, fmt in (
        ("zarr", "open_zarr_cube"),
        ("kerchunk", "open_kerchunk_cube"),
    ):
        reg.add_extension(
            EXTENSION_POINT_DATA_OPENERS, name,
            loader=import_component(f"xcube_spark.sources.zarrio:{fmt}"))
    reg.add_extension(
        EXTENSION_POINT_DATA_OPENERS, "netcdf3",
        loader=import_component(
            "xcube_spark.sources.netcdf3:open_netcdf_cube"))
    reg.add_extension(
        EXTENSION_POINT_DATA_OPENERS, "netcdf4",
        loader=import_component(
            "xcube_spark.sources.hdf5:open_netcdf4_cube"))
    reg.add_extension(
        EXTENSION_POINT_DATA_OPENERS, "geotiff",
        loader=import_component(
            "xcube_spark.sources.geotiff:open_geotiff_cube"))
    reg.add_extension(
        EXTENSION_POINT_DATA_OPENERS, "jp2",
        loader=import_component("xcube_spark.sources.jp2:open_jp2_cube"))
    reg.add_extension(
        EXTENSION_POINT_DATA_STORES, "file",
        loader=import_component("xcube_spark.sources.store:FsDataStore"))
    reg.add_extension(
        EXTENSION_POINT_DATA_STORES, "memory",
        loader=import_component(
            "xcube_spark.sources.store:MemoryDataStore"))


#: entry-point group scanned for third-party plugins (plugin.py:96)
PLUGIN_ENTRY_POINT_GROUP = "xcube_spark_plugins"

_PLUGINS: dict[str, dict] = {}


def get_plugins() -> dict[str, dict]:
    """Loaded plugin name -> metadata (plugin.py:40-46)."""
    return dict(_PLUGINS)


def load_plugins(
    entry_points=None,
    ext_registry: ExtensionRegistry | None = None,
) -> None:
    """Call each plugin's ``init_plugin(ext_registry)``
    (plugin.py:81-140).  ``entry_points`` defaults to the
    ``xcube_spark_plugins`` entry-point group; failures are warnings,
    not crashes — one broken plugin must not take the engine down."""
    import warnings

    if ext_registry is None:
        ext_registry = get_extension_registry()
    if entry_points is None:
        try:
            import importlib.metadata as md

            entry_points = list(md.entry_points(
                group=PLUGIN_ENTRY_POINT_GROUP))
        except Exception:
            entry_points = []
    for ep in entry_points:
        try:
            init_fn = ep.load() if hasattr(ep, "load") else ep
            init_fn(ext_registry)
            _PLUGINS[getattr(ep, "name", getattr(
                init_fn, "__name__", "plugin"))] = {
                "name": getattr(ep, "name", None),
                "doc": (init_fn.__doc__ or "").strip(),
            }
        except Exception as e:  # noqa: BLE001 — isolate plugin failures
            warnings.warn(
                f"failed to load plugin {getattr(ep, 'name', ep)!r}: {e}")
