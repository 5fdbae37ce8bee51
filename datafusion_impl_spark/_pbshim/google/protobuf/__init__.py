"""``google.protobuf`` alias onto the pure-Python protobuf runtime the
google-cloud-sdk vendors under ``cloudsdk.google.protobuf`` (Apache/BSD
licensed, present in this container at
``/usr/lib/google-cloud-sdk/lib/third_party``).

Why: ``transformWithStateInPandas`` needs the protobuf runtime for its
state-server protocol, the container ships no ``protobuf`` distribution and
has no network, but it DOES ship the gcloud CLI whose vendored runtime
(4.23.2, pure Python) parses and serializes Spark's proto3
``StateMessage.proto`` gencode correctly — verified by the runtime pytest
that exercises the full operator. Two adaptations are needed:

- every ``google.protobuf.X`` import is aliased to the SAME module object as
  ``cloudsdk.google.protobuf.X`` (one runtime instance, no duplicated class
  identities), via a meta-path finder;
- ``google.protobuf.runtime_version`` (added in protobuf 5.x; Spark's
  gencode calls ``ValidateProtobufRuntimeVersion``) is synthesized as a
  no-op — the version pin it enforces is exactly what this shim consciously
  relaxes, relying on proto3 wire-format stability.

This package only takes effect when ``datafusion_impl_spark.pbshim.
ensure_protobuf()`` puts ``_pbshim`` on ``sys.path`` — and that helper
prefers a real installed ``protobuf`` whenever one exists.
"""

from __future__ import annotations

import importlib
import importlib.abc
import importlib.util
import sys
import types

# Import-surface note (r6 advice): appending the whole third_party dir makes
# every other package gcloud vendors (six, httplib2, ...) importable too, not
# just cloudsdk.google.protobuf. That widening is accepted deliberately: the
# APPEND means any site-packages installation of those names still wins, the
# vendored tree is only ever a fallback of last resort, and importing
# `cloudsdk` by pinned spec would still need the same directory on sys.path
# for its own intra-package absolute imports.
_SDK = "/usr/lib/google-cloud-sdk/lib/third_party"
if _SDK not in sys.path:
    sys.path.append(_SDK)

_vendored = importlib.import_module("cloudsdk.google.protobuf")
__version__ = _vendored.__version__

#: no real files under this package; submodules resolve via the finder below
__path__: list[str] = []


class _AliasLoader(importlib.abc.Loader):
    """Register the vendored module object itself under the alias name."""

    def __init__(self, target: str) -> None:
        self._target = target

    def create_module(self, spec):
        return importlib.import_module(self._target)

    def exec_module(self, module) -> None:  # module already executed
        pass


class _RuntimeVersionLoader(importlib.abc.Loader):
    """Synthesize the protobuf>=5 ``runtime_version`` module as a no-op."""

    def create_module(self, spec):
        mod = types.ModuleType(spec.name)

        class Domain:
            GOOGLE_INTERNAL = 1
            PUBLIC = 2

        def ValidateProtobufRuntimeVersion(*args, **kwargs) -> None:
            return None

        class VersionError(Exception):
            pass

        mod.Domain = Domain
        mod.ValidateProtobufRuntimeVersion = ValidateProtobufRuntimeVersion
        mod.VersionError = VersionError
        return mod

    def exec_module(self, module) -> None:
        pass


class _AliasFinder(importlib.abc.MetaPathFinder):
    PREFIX = "google.protobuf."

    def find_spec(self, name, path=None, target=None):
        if not name.startswith(self.PREFIX):
            return None
        if name == "google.protobuf.runtime_version":
            return importlib.util.spec_from_loader(
                name, _RuntimeVersionLoader()
            )
        try:
            importlib.util.find_spec("cloudsdk." + name)
        except (ImportError, ModuleNotFoundError):
            return None
        return importlib.util.spec_from_loader(name, _AliasLoader("cloudsdk." + name))


if not any(isinstance(f, _AliasFinder) for f in sys.meta_path):
    sys.meta_path.insert(0, _AliasFinder())
