"""Best-effort ``google.protobuf`` availability for
``transformWithStateInPandas`` (whose state-server protocol needs the
protobuf runtime, absent from this container's site-packages).

``ensure_protobuf()`` resolves, in order:

1. a real installed ``protobuf`` — always preferred, shim untouched;
2. the pure-Python runtime the google-cloud-sdk vendors on this machine,
   exposed through ``datafusion_impl_spark/_pbshim`` (see that package's
   docstring for the exact aliasing);
3. neither → returns False and callers keep their graceful skip.

Call it BEFORE the SparkSession exists: the shim directory must also be on
``PYTHONPATH`` (not just ``sys.path``) so Spark's Python *workers* — where
the stateful-processor API client actually imports ``StateMessage_pb2`` —
inherit it. ``datafusion_impl_spark.session.get_spark`` does this.
"""

from __future__ import annotations

import os
import sys

_SHIM_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_pbshim")
_SDK = "/usr/lib/google-cloud-sdk/lib/third_party"


def ensure_protobuf() -> bool:
    """Make ``import google.protobuf`` work if at all possible; True on
    success. Idempotent and cheap after the first call."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        pass
    if not os.path.isdir(os.path.join(_SDK, "cloudsdk", "google", "protobuf")):
        return False
    if _SHIM_DIR not in sys.path:
        sys.path.insert(0, _SHIM_DIR)
    # Workers are separate processes launched with the inherited env —
    # sys.path edits don't reach them, PYTHONPATH does (set before the
    # SparkContext/JVM starts).
    pypath = os.environ.get("PYTHONPATH", "")
    if _SHIM_DIR not in pypath.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _SHIM_DIR + (os.pathsep + pypath if pypath else "")
        )
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def ensure_protobuf_on_workers(spark) -> bool:
    """Make ``google.protobuf`` importable in the Python processes Spark
    launches for an ALREADY-RUNNING session (where the env-var route is too
    late — the JVM captured its env at launch), by injecting the shim dir
    into ``sc.environment``'s PYTHONPATH, which flows into every
    PythonFunction's envVars. True when the driver side resolves."""
    if not ensure_protobuf():
        return False
    if _real_protobuf_installed():
        # a genuine protobuf distribution serves the workers by itself
        return True
    # Python processes Spark launches for this session (task workers AND
    # the transformWithState driver-side runner) receive the PythonFunction
    # envVars, which come from sc.environment — a live dict, so injecting
    # PYTHONPATH here reaches runners created from now on even though the
    # JVM env was captured long ago. (addPyFile alone is NOT enough: the
    # TWS runner imports the protobuf gencode during its handshake, before
    # SparkFiles includes are added to sys.path.)
    env = spark.sparkContext.environment
    pypath = env.get("PYTHONPATH", "")
    if _SHIM_DIR not in pypath.split(os.pathsep):
        env["PYTHONPATH"] = _SHIM_DIR + (
            os.pathsep + pypath if pypath else ""
        )
    return True


def _real_protobuf_installed() -> bool:
    """True when a protobuf distribution exists in site-packages (as
    opposed to resolving through this shim)."""
    import importlib.util

    spec = importlib.util.find_spec("google.protobuf")
    return bool(
        spec and spec.origin and _SHIM_DIR not in (spec.origin or "")
        and "cloudsdk" not in (spec.origin or "")
    )
