"""Bring-your-own-algorithm code packaging — xcube byoa parity.

The reference (xcube/core/byoa/config.py:26-320, fileset.py:79-390)
lets a user hand the generator an algorithm three ways: inline source
code, a ``module:function`` reference, or a file set (directory / zip)
plus a callable reference; ``CodeConfig.get_callable()`` materializes
whichever form into a Python callable, and ``for_service()`` packages
local code into a zip so a remote service can run it.

Spark-first, "remote service" means "the executors": the JVM driver
already has a code-shipping channel — ``SparkContext.addPyFile`` — so
``CodeConfig.install(spark)`` zips a local file set (or writes inline
code to a module) and registers it with the session; any UDF /
``applyInPandas`` stage that unpickles the callable then imports it
fine on every executor.  That replaces the reference's service-side
fileset upload (byoa/config.py:320-373 ``_for_service``) with the
platform-native mechanism.

Security note: like the reference, ``from_code`` executes user-supplied
Python.  This is the *explicit contract* of a BYOA entry point (the
caller is the code author); it is never reachable from data values.
"""

from __future__ import annotations

import fnmatch
import importlib
import os
import sys
import tempfile
import zipfile
from typing import Any, Callable, Mapping

_MODULE_SEQ = [0]


class FileSet:
    """A set of files under a base path — directory or zip.

    Mirrors xcube/core/byoa/fileset.py:79-390 minus the fsspec remote
    protocols (cluster distribution goes through ``addPyFile``, which
    accepts local paths and any Hadoop-supported URI).

    ``includes`` / ``excludes`` are fnmatch patterns applied to the
    file keys (paths relative to the base path, '/'-separated).
    """

    def __init__(
        self,
        path: str,
        sub_path: str | None = None,
        includes: list[str] | None = None,
        excludes: list[str] | None = None,
    ):
        if not path:
            raise ValueError("path must be given")
        self.path = path
        self.sub_path = sub_path
        self.includes = list(includes) if includes else None
        self.excludes = list(excludes) if excludes else None

    # -- classification ------------------------------------------------

    def is_local_dir(self) -> bool:
        return os.path.isdir(self.path)

    def is_local_zip(self) -> bool:
        return os.path.isfile(self.path) and zipfile.is_zipfile(self.path)

    # -- enumeration ---------------------------------------------------

    def _accepts(self, key: str) -> bool:
        base = key.split("/")[-1]
        if self.includes is not None and not any(
            fnmatch.fnmatch(key, p) or fnmatch.fnmatch(base, p)
            for p in self.includes
        ):
            return False
        if self.excludes and any(
            fnmatch.fnmatch(key, p) or fnmatch.fnmatch(base, p)
            for p in self.excludes
        ):
            return False
        return True

    def keys(self) -> list[str]:
        """Relative '/'-separated paths of the accepted files."""
        out: list[str] = []
        if self.is_local_zip():
            # sub_path applies to zips exactly as to directories: only
            # entries under the prefix count, and keys are relative to it.
            prefix = (self.sub_path.strip("/") + "/") if self.sub_path \
                else ""
            with zipfile.ZipFile(self.path) as zf:
                for n in zf.namelist():
                    if n.endswith("/"):
                        continue
                    if prefix:
                        if not n.startswith(prefix):
                            continue
                        n = n[len(prefix):]
                    if self._accepts(n):
                        out.append(n)
        elif self.is_local_dir():
            root = (
                os.path.join(self.path, self.sub_path)
                if self.sub_path
                else self.path
            )
            for dirpath, _dirnames, filenames in os.walk(root):
                for f in filenames:
                    rel = os.path.relpath(
                        os.path.join(dirpath, f), root
                    ).replace(os.sep, "/")
                    if self._accepts(rel):
                        out.append(rel)
        else:
            raise ValueError(
                f"file set path {self.path!r} is neither a directory "
                "nor a zip file"
            )
        return sorted(out)

    def _zip_member(self, key: str) -> str:
        """Original zip member name for a (sub_path-relative) key."""
        if self.sub_path:
            return self.sub_path.strip("/") + "/" + key
        return key

    @staticmethod
    def _contained_dst(dir_path: str, key: str) -> str:
        """Resolve ``key`` under ``dir_path``, rejecting zip-slip:
        a member named ``../x`` or ``/abs`` must never escape the
        extraction root (mirrors server._s3's realpath containment)."""
        dst = os.path.realpath(
            os.path.join(dir_path, key.replace("/", os.sep)))
        root = os.path.realpath(dir_path)
        if dst != root and not dst.startswith(root + os.sep):
            raise ValueError(
                f"unsafe archive member path {key!r} escapes "
                f"extraction directory")
        return dst

    # -- materialization ----------------------------------------------

    def to_local_zip(self, zip_path: str | None = None) -> "FileSet":
        """Package the accepted files into a zip (fileset.py:318-380).

        A zip is the unit ``addPyFile`` ships to every executor, so
        this is the packaging step of ``CodeConfig.install``.
        """
        if self.is_local_zip() and not (
                self.includes or self.excludes or self.sub_path):
            return self
        if zip_path is None:
            fd, zip_path = tempfile.mkstemp(suffix=".zip", prefix="byoa-")
            os.close(fd)
        root = (
            os.path.join(self.path, self.sub_path)
            if self.sub_path
            else self.path
        )
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
            if self.is_local_dir():
                for key in self.keys():
                    zf.write(os.path.join(root, key.replace("/", os.sep)), key)
            else:
                with zipfile.ZipFile(self.path) as src:
                    for key in self.keys():
                        zf.writestr(key, src.read(self._zip_member(key)))
        return FileSet(zip_path)

    def to_local_dir(self, dir_path: str | None = None) -> "FileSet":
        """Extract (or pass through) to a local directory."""
        if self.is_local_dir() and not (
                self.includes or self.excludes or self.sub_path):
            return self
        if dir_path is None:
            dir_path = tempfile.mkdtemp(prefix="byoa-")
        if self.is_local_dir():
            import shutil

            root = (
                os.path.join(self.path, self.sub_path)
                if self.sub_path
                else self.path
            )
            for key in self.keys():
                dst = self._contained_dst(dir_path, key)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.copyfile(
                    os.path.join(root, key.replace("/", os.sep)), dst
                )
        else:
            with zipfile.ZipFile(self.path) as zf:
                for key in self.keys():
                    dst = self._contained_dst(dir_path, key)
                    os.makedirs(os.path.dirname(dst) or dir_path,
                                exist_ok=True)
                    with open(dst, "wb") as out_f:
                        out_f.write(zf.read(self._zip_member(key)))
        return FileSet(dir_path)

    # -- JSON ----------------------------------------------------------

    def to_dict(self) -> dict:
        d: dict[str, Any] = {"path": self.path}
        if self.sub_path:
            d["sub_path"] = self.sub_path
        if self.includes:
            d["includes"] = self.includes
        if self.excludes:
            d["excludes"] = self.excludes
        return d

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "FileSet":
        return cls(
            d["path"],
            sub_path=d.get("sub_path"),
            includes=d.get("includes"),
            excludes=d.get("excludes"),
        )


def _parse_callable_ref(ref: str) -> tuple[str, str]:
    """``'my.module:my_func'`` -> (module, attr) (config.py:552-566)."""
    if ":" not in ref:
        raise ValueError(
            f"callable_ref {ref!r} must have form <module>:<function>"
        )
    module, attr = ref.split(":", 1)
    if not module or not attr:
        raise ValueError(
            f"callable_ref {ref!r} must have form <module>:<function>"
        )
    return module, attr


class CodeConfig:
    """User-code configuration (xcube/core/byoa/config.py:26-320).

    Exactly one of ``callable_obj``, ``inline_code``, ``file_set`` is
    set.  ``get_callable()`` materializes the configured form;
    ``install(spark)`` additionally ships the code to the executors
    via ``addPyFile`` so UDF closures can import it cluster-wide.
    """

    def __init__(
        self,
        callable_ref: str | None = None,
        callable_obj: Callable | None = None,
        inline_code: str | None = None,
        file_set: FileSet | None = None,
        callable_params: Mapping[str, Any] | None = None,
    ):
        forms = [
            callable_obj is not None,
            inline_code is not None,
            file_set is not None,
        ]
        if sum(forms) != 1:
            raise ValueError(
                "exactly one of callable_obj, inline_code, file_set "
                "must be given"
            )
        if callable_obj is None and not callable_ref:
            raise ValueError(
                "callable_ref is required with inline_code or file_set"
            )
        self.callable_ref = callable_ref
        self.callable_obj = callable_obj
        self.inline_code = inline_code
        self.file_set = file_set
        self.callable_params = dict(callable_params or {})
        self._installed_path: str | None = None

    # -- constructors (config.py:107-253) ------------------------------

    @classmethod
    def from_callable(
        cls, func: Callable, callable_params: Mapping[str, Any] | None = None
    ) -> "CodeConfig":
        if not callable(func):
            raise ValueError("func must be callable")
        ref = None
        mod = getattr(func, "__module__", None)
        name = getattr(func, "__qualname__", getattr(func, "__name__", None))
        if mod and name and "." not in name and "<" not in name:
            ref = f"{mod}:{name}"
        return cls(
            callable_ref=ref,
            callable_obj=func,
            callable_params=callable_params,
        )

    @classmethod
    def from_code(
        cls,
        code: str,
        callable_name: str | None = None,
        module_name: str | None = None,
        callable_params: Mapping[str, Any] | None = None,
    ) -> "CodeConfig":
        if not code or not code.strip():
            raise ValueError("code must be a non-empty string")
        if callable_name is None:
            # first top-level def, like the reference's default probe
            for line in code.splitlines():
                if line.startswith("def "):
                    callable_name = line[4:].split("(", 1)[0].strip()
                    break
        if not callable_name:
            raise ValueError("cannot detect callable_name in code")
        if module_name is None:
            _MODULE_SEQ[0] += 1
            module_name = f"xcube_spark_user_code_{_MODULE_SEQ[0]}"
        return cls(
            callable_ref=f"{module_name}:{callable_name}",
            inline_code=code,
            callable_params=callable_params,
        )

    @classmethod
    def from_file_set(
        cls,
        file_set: FileSet | str,
        callable_ref: str,
        callable_params: Mapping[str, Any] | None = None,
    ) -> "CodeConfig":
        if isinstance(file_set, str):
            file_set = FileSet(file_set)
        _parse_callable_ref(callable_ref)
        return cls(
            callable_ref=callable_ref,
            file_set=file_set,
            callable_params=callable_params,
        )

    # -- materialization (config.py:279-320, 408-455) -----------------

    def get_callable(self) -> Callable:
        """Resolve the configured form to a Python callable (driver)."""
        if self.callable_obj is not None:
            return self.callable_obj
        assert self.callable_ref is not None
        module_name, attr = _parse_callable_ref(self.callable_ref)
        if self.inline_code is not None:
            # materialize the inline code as a real module so executor
            # unpickling can re-import it by name (config.py:511-524)
            mod = sys.modules.get(module_name)
            if mod is None or getattr(mod, "__byoa_source__", None) != (
                self.inline_code
            ):
                import types

                mod = types.ModuleType(module_name)
                mod.__byoa_source__ = self.inline_code
                exec(compile(self.inline_code, f"<{module_name}>", "exec"),
                     mod.__dict__)
                sys.modules[module_name] = mod
            self.callable_obj = getattr(mod, attr)
            return self.callable_obj
        assert self.file_set is not None
        local = self.file_set.to_local_dir()
        if local.path not in sys.path:
            sys.path.insert(0, local.path)
        importlib.invalidate_caches()
        mod = importlib.import_module(module_name)
        self.callable_obj = getattr(mod, attr)
        return self.callable_obj

    def install(self, spark) -> Callable:
        """Resolve AND ship to the executors.

        File sets are zipped and registered with ``addPyFile`` (the
        Spark-native analog of the reference's service-side fileset
        upload, config.py:320-373); inline code rides along inside the
        pickled closure, which cloudpickle serializes by value for
        dynamically created modules.
        """
        fn = self.get_callable()
        if self.file_set is not None and self._installed_path is None:
            z = self.file_set.to_local_zip()
            spark.sparkContext.addPyFile(z.path)
            self._installed_path = z.path
        return fn

    # -- JSON round-trip (config.py:92-106) ----------------------------

    def to_dict(self) -> dict:
        d: dict[str, Any] = {}
        if self.callable_ref:
            d["callable_ref"] = self.callable_ref
        if self.inline_code is not None:
            d["inline_code"] = self.inline_code
        if self.file_set is not None:
            d["file_set"] = self.file_set.to_dict()
        if self.callable_params:
            d["callable_params"] = self.callable_params
        return d

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "CodeConfig":
        file_set = d.get("file_set")
        inline = d.get("inline_code")
        if file_set is not None:
            return cls.from_file_set(
                FileSet.from_dict(file_set),
                d["callable_ref"],
                d.get("callable_params"),
            )
        if inline is not None:
            module_name, callable_name = _parse_callable_ref(
                d["callable_ref"]
            )
            return cls.from_code(
                inline,
                callable_name=callable_name,
                module_name=module_name,
                callable_params=d.get("callable_params"),
            )
        raise ValueError(
            "dict must contain inline_code or file_set"
        )
