"""Best-effort discovery of a python-protobuf runtime for
``transformWithStateInPandas``.

The TWS Python protocol serializes ``StateMessage`` protobufs to the JVM
state server, so the worker and the driver both need ``google.protobuf``
importable. This container has no pip access, but the google-cloud-sdk it
ships bundles a pure-python protobuf 6.32 runtime under the proper
``google.protobuf`` package name; ``vendor/google/protobuf`` is a symlink
to it (PEP 420 namespace package, so only ``google.protobuf`` is exposed
— none of the SDK's other ``google.*`` subpackages leak onto the path).

pyspark 4.1.2's generated ``StateMessage_pb2`` was built with protoc
6.33, one MINOR version ahead of that runtime; protobuf's own published
cross-version guarantee covers the wire format across minors, and the
runtime provides the official
``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK`` escape hatch for exactly
this skew. We only set it after verifying the MAJOR versions match, so a
genuinely incompatible runtime still fails loudly.

On a real cluster none of this triggers: ``import google.protobuf``
succeeds from site-packages with a current runtime and this module is a
no-op returning True.
"""

from __future__ import annotations

import os
import sys

VENDOR_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "vendor"
)

_GENCODE_MAJOR = 6  # pyspark 4.1.2's StateMessage_pb2 gencode major


def _runtime_ok() -> bool:
    try:
        import google.protobuf as gp
    except ImportError:
        return False
    major = int(str(getattr(gp, "__version__", "0")).split(".")[0])
    if major == _GENCODE_MAJOR:
        # official escape hatch for minor-version skew (runtime_version.py
        # honors it at every gencode import); workers inherit the env in
        # local mode and via executorEnv on a cluster (session.py).
        os.environ.setdefault(
            "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true"
        )
        return True
    # WRONG major (e.g. a site-packages 5.x): not usable — returning
    # True here made the vendored 6.x fallback unreachable and pushed
    # the failure deep into Spark's StateMessage_pb2 import
    return False


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable here and in Spark workers.

    Returns True when the runtime is usable; False when no COMPATIBLE
    protobuf runtime exists anywhere (callers keep their skip/raise
    behavior).
    """
    if _runtime_ok():
        return True
    if not os.path.isdir(os.path.join(VENDOR_DIR, "google", "protobuf")):
        return False  # symlink target absent (different machine)
    if VENDOR_DIR not in sys.path:
        sys.path.insert(0, VENDOR_DIR)
    # workers resolve imports from PYTHONPATH, not the driver's sys.path
    pp = os.environ.get("PYTHONPATH", "")
    if VENDOR_DIR not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            VENDOR_DIR + (os.pathsep + pp if pp else "")
        )
    # an INCOMPATIBLE site runtime may already be cached — evict the
    # google.* modules so the re-import resolves from the (now first)
    # vendor path instead of the cached wrong-major package
    for mod in [m for m in sys.modules if m == "google" or m.startswith("google.")]:
        del sys.modules[mod]
    return _runtime_ok()
